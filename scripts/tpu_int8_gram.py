"""Probe: int8 vs bf16 masked-Gram matmul rate at the dense-ALS shape.

The dense-ALS Gram operand M is 0/1, so int8 x int8 -> int32 is EXACT
in the mask operand and only quantizes Q2 (per-column scales; same
error class as the existing bf16 mode). If the v5e int8 MXU path is
~2x bf16, the two-Gram floor drops from ~101 ms to ~55 ms at the full
bench shape. Also measures the prestaged-mask saving (the per-sweep
(wv > 0) elementwise pass over 2.1G slots).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_int8_gram.py > /tmp/tpu_int8_gram.log 2>&1 &
"""

import time


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    nu, ni, width, blk = 102400, 20480, 2080, 2048

    kk = jax.random.split(jax.random.PRNGKey(0), 3)
    dense = jax.jit(lambda key: jnp.where(
        jax.random.uniform(key, (nu, ni), jnp.float32) < 0.005,
        jax.random.uniform(key, (nu, ni), jnp.float32) + 0.5,
        0.0).astype(jnp.bfloat16))(kk[0])
    m_i8 = jax.jit(lambda d: (d > 0).astype(jnp.int8))(dense)
    m_bf = jax.jit(lambda d: (d > 0).astype(jnp.bfloat16))(dense)
    q2_bf = jax.jit(lambda key: jax.random.normal(
        key, (ni, width), jnp.bfloat16))(kk[1])
    q2_i8 = jax.jit(lambda q: jnp.clip(
        jnp.round(q.astype(jnp.float32) * 42.0), -127, 127
    ).astype(jnp.int8))(q2_bf)

    def scan_mm(mat, q2, out_dtype, cast=None):
        @jax.jit
        def f(mat, q2):
            def body(acc, s):
                wv = jax.lax.dynamic_slice_in_dim(mat, s * blk, blk)
                if cast is not None:
                    wv = (wv > 0).astype(cast)
                g = jnp.dot(wv, q2, preferred_element_type=out_dtype)
                return acc + jnp.sum(g.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(nu // blk, dtype=jnp.int32))
            return acc
        return f

    cases = [
        ("bf16 prestaged-M", scan_mm(m_bf, q2_bf, jnp.float32), m_bf,
         q2_bf),
        ("bf16 mask-in-sweep", scan_mm(dense, q2_bf, jnp.float32,
                                       cast=jnp.bfloat16), dense, q2_bf),
        ("int8 prestaged-M", scan_mm(m_i8, q2_i8, jnp.int32), m_i8,
         q2_i8),
    ]
    fl = 2 * nu * ni * width
    for label, f, a, b in cases:
        try:
            float(f(a, b))
            t0 = time.perf_counter()
            for _ in range(3):
                r = f(a, b)
            float(r)
            dt = (time.perf_counter() - t0) / 3
            print(f"{label}: {dt*1000:.1f}ms = {fl/dt/1e12:.1f} "
                  f"T(FL)OP/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAIL: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
