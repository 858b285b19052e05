"""Dense Block-DSGD N=1 on-chip: per-shard throughput of the nested
row-dense engine at the full bench shape — the multi-chip path should
inherit the single-chip row-dense rate (242M XLA / 404.8M Pallas) up
to rotation overhead, vs the one-hot Block-DSGD's 118M r/s/shard.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_dense_bdsgd.py > /tmp/tpu_dense_bdsgd.log 2>&1 &
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.parallel.block_dsgd import DenseBlockDSGDSolver
    from matfac_tpu.solvers.block_sgd import BlockSGDSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items, k = 100_000, 20_000, 64
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    print(f"nnz={mat.nnz}", flush=True)
    params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                    learn_rate=0.005, seed=0)
    model = ModelMF(params, n_users, n_items)

    def force(st):
        return float(jnp.sum(st.u_fac[0]) + jnp.sum(st.i_fac[0]))

    def run(label, s):
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
        del st

    # same-day single-chip row-dense reference
    ref = BlockSGDSolver(model, params, mat, iu, ii, engine="dense",
                         bu=None, bi=None)
    run("single-chip row-dense (XLA)", ref)
    del ref

    mesh = Mesh(np.array(jax.devices()[:1]), ("u",))
    t0 = time.time()
    s = DenseBlockDSGDSolver(model, params, mat, iu, ii, mesh)
    print(f"dense BDSGD staged {time.time()-t0:.0f}s SU={s.SU} "
          f"sub_bu={s.sub_bu} bi={s.bi}", flush=True)
    run("dense Block-DSGD N=1", s)


if __name__ == "__main__":
    main()
