"""Row-dense SGD at the ML-20M shape (138k x 27k, ~19.7M ratings),
rank-64 and rank-128 — the BASELINE.md north-star config on the
round-4 headline engine. Dense grid: 138240 x 27008 x 3B = 11.2 GiB
(needs the explicit budget; v5e HBM 16 GiB leaves ~4.5 GiB for
factors + staging temps).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_dense_ml20m.py > /tmp/tpu_dense_ml20m.log 2>&1 &
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.solvers.block_sgd import BlockSGDSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items = 138_000, 27_000
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8,
                                 density=20_000_000 / (n_users * n_items),
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    print(f"nnz={mat.nnz}", flush=True)

    def force(st):
        return float(jnp.sum(st.u_fac[0]) + jnp.sum(st.i_fac[0]))

    for k in (64, 128):
        params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                        learn_rate=0.005, seed=0)
        model = ModelMF(params, n_users, n_items)
        try:
            s = BlockSGDSolver(model, params, mat, iu, ii,
                               collision_norm=True, engine="dense",
                               bu=None, bi=None,
                               dense_budget_bytes=12 << 30)
            st = init_state(params, n_users, n_items)
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
            print(f"ML-20M-shape densesgd k={k}: compile={c:.1f}s "
                  f"epoch={dt*1000:.1f}ms "
                  f"rate={s.nnz/dt/1e6:.1f}M ratings/s", flush=True)
            del s, st
        except Exception as e:  # noqa: BLE001
            print(f"k={k} FAIL: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)


if __name__ == "__main__":
    main()
