"""Dense-ALS probe at the full bench shape (VERDICT r3 #2).

Measures, same process / same chip:
  bucket_cg6   bucketed ALSSolver + 6-iter warm CG (the r3 bench path,
               195 ms / 50.7M ratings/s at round-1 device speed)
  dense_full   DenseALSSolver, full k*k QQ Grams (r3 formulation)
  dense_packed DenseALSSolver, packed k(k+1)/2 QQ + take-unpack
  dense_packed_chol  same, exact Cholesky solves (parity mode)
  gram_rate    raw [blk, ni] @ [ni, k^2] bf16 matmul rate (the Gram
               pass's speed-of-light for this shape)

Target: epoch <= 100 ms (>= 100M ratings/s) at 100k x 20k / 9.9M nnz,
k=64. Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_dense_als.py > /tmp/tpu_dense_als.log 2>&1 &
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.solvers.als import ALSSolver, DenseALSSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items, k = 100_000, 20_000, 64
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    print("nnz:", mat.nnz, flush=True)
    params = Params(fac_dim=k, u_reg=0.01, i_reg=0.01,
                    learn_rate=0.005, seed=0)
    inval_u, inval_i = freq.invalid_users_items(mat, n_users, n_items)
    model = ModelMF(params, n_users, n_items)

    def force(state):
        return float(jnp.sum(state.u_fac[0]) + jnp.sum(state.i_fac[0]))

    def time_solver(label, solver, n=3):
        state = init_state(params, n_users, n_items)
        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        state = solver.epoch(state, params.learn_rate, key)
        force(state)
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            state = solver.epoch(state, params.learn_rate, key)
        force(state)
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: compile+1st={comp:.1f}s epoch={dt*1000:.1f}ms "
              f"= {mat.nnz/dt/1e6:.1f}M ratings/s", flush=True)
        del state
        return dt

    # same-day reference: the r3 bench ALS path
    b = ALSSolver(model, params, mat, inval_u, inval_i, cg_iters=6)
    time_solver("bucket_cg6", b)
    del b

    d = DenseALSSolver(model, params, mat, inval_u, inval_i,
                       cg_iters=6, packed=False)
    time_solver("dense_full_cg6", d)
    # reuse the staged dense matrix across variants (4.2 GB bf16)
    dense = d.dense

    d2 = DenseALSSolver.__new__(DenseALSSolver)
    d2.__dict__.update(d.__dict__)
    d2.packed = True
    time_solver("dense_packed_cg6", d2)

    d3 = DenseALSSolver.__new__(DenseALSSolver)
    d3.__dict__.update(d.__dict__)
    d3.packed = True
    d3.cg_iters = 0
    time_solver("dense_packed_chol", d3)
    del d, d2, d3

    # raw Gram matmul rate at this shape (both packed widths)
    blk, ni_pad = 2048, dense.shape[1]
    for width in (k * k, k * (k + 1) // 2):
        q2 = jax.jit(lambda key: jax.random.normal(
            key, (ni_pad, width), jnp.bfloat16))(jax.random.PRNGKey(1))

        @jax.jit
        def grams(dense, q2):
            def body(acc, s):
                wv = jax.lax.dynamic_slice_in_dim(dense, s * blk, blk)
                g = jnp.dot((wv > 0).astype(jnp.bfloat16), q2,
                            preferred_element_type=jnp.float32)
                return acc + jnp.sum(g), None
            n_blocks = dense.shape[0] // blk
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(n_blocks, dtype=jnp.int32))
            return acc

        float(grams(dense, q2))  # compile
        t0 = time.perf_counter()
        for _ in range(3):
            r = grams(dense, q2)
        float(r)
        dt = (time.perf_counter() - t0) / 3
        fl = 2 * dense.shape[0] * ni_pad * width
        print(f"gram_rate width={width}: {dt*1000:.1f}ms = "
              f"{fl/dt/1e12:.1f} TFLOP/s", flush=True)
        del q2


if __name__ == "__main__":
    main()
