"""Pallas block-SGD shape bisect: the construct bisect passed at a tiny
shape (scripts/tpu_pallas_bisect.py — toolchain evidently fixed), so
find the largest compiling config at the bench shape and time it
against the XLA diag engine (92 ms / 107M ratings/s same-day).

VMEM budget per grid step ≈ item table (NI*bi*k*4B, persistent output)
+ 7 stream rows (row_len*4B each) + u block + one-hot temporaries.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_pallas_scale.py > /tmp/tpu_pallas2.log 2>&1 &
"""

import time

import numpy as np


def force(x):
    import jax.numpy as jnp
    return float(jnp.sum(x[0]))


def main():
    import jax

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.solvers.block_sgd import BlockSGDSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)

    shapes = {
        "mid 20kx5k": (20_000, 5_000, 0.05),
        "full 100kx20k": (100_000, 20_000, 0.005),
    }
    cases = [
        ("full 100kx20k", 64, 512, 512, 2048),
        ("full 100kx20k", 64, 768, 768, 1024),
        ("full 100kx20k", 64, 640, 640, 1280),
    ]
    mats = {}
    for name, (nu, ni, dens) in shapes.items():
        mat, _, _ = low_rank_ratings(nu, ni, k=8, density=dens, seed=0,
                                     noise=0.1, power_law=0.6,
                                     nonneg=True)
        iu, ii = freq.invalid_users_items(mat, nu, ni)
        mats[name] = (mat, iu, ii, nu, ni)
        print(f"{name}: nnz={mat.nnz}", flush=True)

    for shape, k, bu, bi, bs in cases:
        mat, iu, ii, nu, ni = mats[shape]
        params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                        learn_rate=0.005, seed=0)
        model = ModelMF(params, nu, ni)
        label = f"pallas {shape} k={k} bu={bu} bs={bs}"
        try:
            s = BlockSGDSolver(model, params, mat, iu, ii,
                               batch_size=bs, bu=bu, bi=bi,
                               collision_norm=True, engine="pallas")
            st = init_state(params, nu, ni)
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
            print(f"{label}: compile={c:.1f}s epoch={dt*1000:.0f}ms "
                  f"rate={s.nnz/dt/1e6:.1f}M ratings/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAIL: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)


if __name__ == "__main__":
    main()
