"""Decompose the packed dense-ALS epoch (164 ms bf16 / 159 ms int8) at
the full bench shape: per-matmul cost of the user Gram (row-sliced
dot), the item Gram (transposed einsum — suspected of missing the int8
MXU path), the same item Gram against a PRE-TRANSPOSED mask, the
b-vectors, the unpack-take, and a 6-iter CG solve pass.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_als_decomp.py > /tmp/tpu_als_decomp.log 2>&1 &
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    nu, ni, k, blk = 102400, 20480, 64, 2048
    width = k * (k + 1) // 2

    kk = jax.random.split(jax.random.PRNGKey(0), 4)
    dense = jax.jit(lambda key: jnp.where(
        jax.random.uniform(key, (nu, ni), jnp.float32) < 0.005,
        jax.random.uniform(key, (nu, ni), jnp.float32) + 0.5,
        0.0).astype(jnp.bfloat16))(kk[0])
    qq_bf = jax.jit(lambda key: jax.random.normal(
        key, (ni, width), jnp.bfloat16))(kk[1])
    pp_bf = jax.jit(lambda key: jax.random.normal(
        key, (nu, width), jnp.bfloat16))(kk[2])
    qq_i8 = jax.jit(lambda q: jnp.clip(jnp.round(
        q.astype(jnp.float32) * 42), -127, 127).astype(jnp.int8))(qq_bf)
    pp_i8 = jax.jit(lambda q: jnp.clip(jnp.round(
        q.astype(jnp.float32) * 42), -127, 127).astype(jnp.int8))(pp_bf)
    mt_i8 = jax.jit(lambda d: (d.T > 0).astype(jnp.int8))(dense)
    q_bf = jax.jit(lambda key: jax.random.normal(
        key, (ni, k), jnp.bfloat16))(kk[3])

    def timeit(label, f, *args):
        try:
            r = f(*args)
            float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                r = f(*args)
                float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
                best = min(best, time.perf_counter() - t0)
            print(f"{label}: {best*1000:.1f}ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAIL: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)

    def scan_over(n_rows, body):
        @jax.jit
        def f(*args):
            def step(acc, s):
                return acc + body(s, *args), None
            acc, _ = jax.lax.scan(step, jnp.float32(0),
                                  jnp.arange(n_rows // blk,
                                             dtype=jnp.int32))
            return acc
        return f

    # user Gram: dot over row slices
    timeit("ugram bf16", scan_over(nu, lambda s, d, q: jnp.sum(jnp.dot(
        (jax.lax.dynamic_slice_in_dim(d, s * blk, blk) > 0
         ).astype(jnp.bfloat16), q,
        preferred_element_type=jnp.float32))), dense, qq_bf)
    timeit("ugram int8", scan_over(nu, lambda s, d, q: jnp.sum(jnp.dot(
        (jax.lax.dynamic_slice_in_dim(d, s * blk, blk) > 0
         ).astype(jnp.int8), q,
        preferred_element_type=jnp.int32).astype(jnp.float32))),
        dense, qq_i8)
    # item Gram: transposed einsum over column slices (current path)
    timeit("igram bf16 transposed-einsum", scan_over(
        ni, lambda s, d, p: jnp.sum(jnp.einsum(
            "ur,uk->rk",
            (jax.lax.dynamic_slice_in_dim(d, s * blk, blk, axis=1) > 0
             ).astype(jnp.bfloat16), p,
            preferred_element_type=jnp.float32))), dense, pp_bf)
    timeit("igram int8 transposed-einsum", scan_over(
        ni, lambda s, d, p: jnp.sum(jnp.einsum(
            "ur,uk->rk",
            (jax.lax.dynamic_slice_in_dim(d, s * blk, blk, axis=1) > 0
             ).astype(jnp.int8), p,
            preferred_element_type=jnp.int32).astype(jnp.float32))),
        dense, pp_i8)
    # item Gram against a PRE-TRANSPOSED int8 mask (row-sliced dot)
    timeit("igram int8 pre-transposed dot", scan_over(
        ni, lambda s, m, p: jnp.sum(jnp.dot(
            jax.lax.dynamic_slice_in_dim(m, s * blk, blk), p,
            preferred_element_type=jnp.int32).astype(jnp.float32))),
        mt_i8, pp_i8)
    # b-vector, user side
    timeit("ub bf16", scan_over(nu, lambda s, d, q: jnp.sum(jnp.dot(
        jax.lax.dynamic_slice_in_dim(d, s * blk, blk), q,
        preferred_element_type=jnp.float32))), dense, q_bf)
    # unpack take: [blk, width] -> [blk, k*k]
    iu, il = np.triu_indices(k)
    pos = np.zeros((k, k), np.int32)
    pos[iu, il] = np.arange(iu.size, dtype=np.int32)
    pos[il, iu] = pos[iu, il]
    idx = jnp.asarray(pos.reshape(-1))
    g_pack = jax.jit(lambda key: jax.random.normal(
        key, (blk, width), jnp.float32))(kk[0])
    timeit("unpack take x50", scan_over(nu, lambda s, g: jnp.sum(
        jnp.take(g, idx, axis=1))), g_pack)
    # 6-iter CG pass over all nu rows (batched [blk, k, k] matvecs)
    from matfac_tpu.solvers.als import solve_spd_cg
    gram = jax.jit(lambda key: jax.random.normal(
        key, (blk, k, k), jnp.float32) * 0.01
        + 10 * jnp.eye(k)[None])(kk[1])
    bvec = jax.jit(lambda key: jax.random.normal(
        key, (blk, k), jnp.float32))(kk[2])
    timeit("cg6 x50", scan_over(nu, lambda s, g, b: jnp.sum(
        solve_spd_cg(g, b, b, 6))), gram, bvec)


if __name__ == "__main__":
    main()
