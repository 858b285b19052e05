"""Long-tail models on the ROW-DENSE engine at the full bench shape:
MF vs IFWMF (weights ride the W tiles) vs TMF (factorized rank masks,
round 4 — 2 extra mask matmuls per stripe). The one-hot engine ran
all three at ~107M ratings/s (scripts/tpu_longtail_dsgd.py, PERF.md
"Long-tail models on the block engine").

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_longtail_dense.py > /tmp/tpu_longtail_dense.log 2>&1 &
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.models.longtail import (ModelDropoutSigmoid,
                                            ModelInvPopMF)
    from matfac_tpu.solvers.block_sgd import BlockSGDSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items, k = 100_000, 20_000, 64
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    uf, itf = freq.row_col_freq(mat)
    uf = np.resize(uf, n_users).astype(np.float64)
    itf = np.resize(itf, n_items).astype(np.float64)

    def force(st):
        return float(jnp.sum(st.u_fac[0]) + jnp.sum(st.i_fac[0]))

    for name, mk in (
            ("MF", lambda p: ModelMF(p, n_users, n_items)),
            ("IFWMF", lambda p: ModelInvPopMF(
                p, n_users, n_items, uf, itf, invalid_users=iu,
                invalid_items=ii)),
            ("TMF", lambda p: ModelDropoutSigmoid(
                p, n_users, n_items, uf, itf))):
        p = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                   learn_rate=0.005, seed=0, rho_rms=1.0, alpha=0.0)
        model = mk(p)
        try:
            s = BlockSGDSolver(model, p, mat, iu, ii,
                               collision_norm=True, engine="dense",
                               bu=None, bi=None)
            st = init_state(p, n_users, n_items)
            key = jax.random.PRNGKey(0)
            key, k1 = jax.random.split(key)
            t0 = time.time()
            st = s.epoch(st, 0.005, k1)
            force(st)
            c = time.time() - t0
            times = []
            for _ in range(3):
                key, k1 = jax.random.split(key)
                t0 = time.time()
                st = s.epoch(st, 0.005, k1)
                force(st)
                times.append(time.time() - t0)
            dt = min(times)
            print(f"dense {name}: compile={c:.1f}s "
                  f"epoch={dt*1000:.1f}ms "
                  f"rate={s.nnz/dt/1e6:.1f}M ratings/s", flush=True)
            del s, st
        except Exception as e:  # noqa: BLE001
            print(f"dense {name} FAIL: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)


if __name__ == "__main__":
    main()
