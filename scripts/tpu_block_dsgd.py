"""Block-DSGD N=1 on-chip: per-shard throughput of the nested one-hot
engine vs the scatter-path DSGD (38M) and the single-chip block engine
(~107M same-day), at the full bench shape.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_block_dsgd.py > /tmp/tpu_bdsgd.log 2>&1 &
"""

import time

import numpy as np


def force(x):
    import jax.numpy as jnp
    return float(jnp.sum(x[0]))


def main():
    import jax
    from jax.sharding import Mesh

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.parallel.block_dsgd import BlockDSGDSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items, k = 100_000, 20_000, 64
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    print(f"nnz={mat.nnz}", flush=True)

    import os
    if os.environ.get("BDSGD_SHAPE") == "medium":
        n_users, n_items = 20_000, 5_000
        mat, _, _ = low_rank_ratings(n_users, n_items, k=8,
                                     density=0.05, seed=0, noise=0.1,
                                     power_law=0.6, nonneg=True)
        iu, ii = freq.invalid_users_items(mat, n_users, n_items)
        print(f"medium nnz={mat.nnz}", flush=True)
        configs = (("sub384 AUTO padk128", 384, None, 128),
                   ("sub384 bs1024 padk128", 384, 1024, 128))
    else:
        configs = (("sub384 bs1024 padk128", 384, 1024, 128),
                   ("sub384 bs512 padk128", 384, 512, 128))
    mesh = Mesh(np.array(jax.devices()[:1]), ("u",))
    for label, sub, bs, padk in configs:
        params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                        learn_rate=0.005, seed=0)
        model = ModelMF(params, n_users, n_items)
        try:
            t0 = time.time()
            s = BlockDSGDSolver(model, params, mat, iu, ii, mesh,
                                sub_bu=sub, sub_bi=sub, batch_size=bs,
                                pad_k=padk)
            print(f"{label}: staged {time.time()-t0:.0f}s "
                  f"pad_frac={s.pad_frac:.2f}", flush=True)
            st = init_state(params, n_users, n_items)
            key = jax.random.PRNGKey(0)
            key, k1 = jax.random.split(key)
            t0 = time.time()
            st = s.epoch(st, 0.005, k1)
            force(st.u_fac)
            c = time.time() - t0
            times = []
            for _ in range(3):
                key, k1 = jax.random.split(key)
                t0 = time.time()
                st = s.epoch(st, 0.005, k1)
                force(st.u_fac)
                times.append(time.time() - t0)
            dt = min(times)
            print(f"blockDSGD N=1 {label}: compile={c:.1f}s "
                  f"epoch={dt*1000:.0f}ms "
                  f"rate={s.nnz/dt/1e6:.1f}M ratings/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAIL: {type(e).__name__}: {str(e)[:500]}",
                  flush=True)


if __name__ == "__main__":
    main()
