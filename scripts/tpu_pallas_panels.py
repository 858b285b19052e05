"""Pallas row-dense panel sweep: can panel/stripe geometry move the
24.4 ms / 404.8M headline toward the ~12 ms traffic+matmul floor?

bi is forced to 20480 (= 160*128) so panel sizes other than 128 divide
the padded catalog (the default ni_pad 20096 = 128*157 only admits
panel=128). Each config stays inside the solver's 12 MB VMEM guard;
FAILs (incl. Mosaic HTTP-500 crashes) are logged per config.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_pallas_panels.py > /tmp/tpu_pallas_panels.log 2>&1 &
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
    n_users, n_items, k = 100_000, 20_000, 64
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                    learn_rate=0.005, seed=0)
    model = ModelMF(params, n_users, n_items)

    def force(st):
        return float(jnp.sum(st.u_fac[0]) + jnp.sum(st.i_fac[0]))

    cases = [
        ("bu2560 p128 (headline)", dict(bu=2560, bi=None,
                                        dense_panel=128)),
        ("bu2560 p160 bi20480", dict(bu=2560, bi=20480,
                                     dense_panel=160)),
        ("bu2048 p192 bi20480", dict(bu=2048, bi=20480,
                                     dense_panel=192)),
        ("bu1536 p256 bi20480", dict(bu=1536, bi=20480,
                                     dense_panel=256)),
        ("bu3072 p128 bi20480", dict(bu=3072, bi=20480,
                                     dense_panel=128)),
    ]
    for label, kw in cases:
        try:
            s = BlockSGDSolver(model, params, mat, iu, ii,
                               collision_norm=True, engine="dense",
                               dense_kernel="pallas", **kw)
            st = init_state(params, n_users, n_items)
            key = jax.random.PRNGKey(0)
            key, k1 = jax.random.split(key)
            t0 = time.time()
            st = s.epoch(st, 0.005, k1)
            force(st)
            c = time.time() - t0
            times = []
            for _ in range(4):
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
