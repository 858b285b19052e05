"""Row-dense engine at k=128 (full bench shape): dense FLOP scales
with k (no pad_k trick — PERF.md), so this pins the rank-128 cost of
the headline engine for the ML-20M-class configs.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_dense_k128.py > /tmp/tpu_dense_k128.log 2>&1 &
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
    n_users, n_items = 100_000, 20_000
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)

    def force(st):
        return float(jnp.sum(st.u_fac[0]) + jnp.sum(st.i_fac[0]))

    for k, kernel in ((128, "pallas"), (128, "xla"), (64, "pallas")):
        params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                        learn_rate=0.005, seed=0)
        model = ModelMF(params, n_users, n_items)
        label = f"row-dense k={k} {kernel}"
        try:
            s = BlockSGDSolver(model, params, mat, iu, ii,
                               collision_norm=True, engine="dense",
                               dense_kernel=kernel, bu=None, bi=None)
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
            print(f"{label}: compile={c:.1f}s epoch={dt*1000:.1f}ms "
                  f"rate={s.nnz/dt/1e6:.1f}M ratings/s", flush=True)
            del s, st
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAIL: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)


if __name__ == "__main__":
    main()
