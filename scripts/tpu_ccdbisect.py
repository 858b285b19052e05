"""Component bisect for the CCD++ 10M-nnz TPU kernel fault (round 2).

The nnz-chunked epoch STILL faults at 9.9M while every primitive is
proven safe at 2M — so the trigger is some structure at the 10M buffer
scale, not a single indexed op. Stages isolate components on 10M-sized
buffers; run ONE stage per process:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_ccdbisect.py <stage>

Stages: slice (dynamic_slice chain), gather (chunked gather accum),
seg (chunked segment_sum accum), upd (dynamic_update_slice chain),
sweep (one full chunked dim_sweep via per_dim mode), scan4 / scan64
(chunked epoch scan over 4 / 64 dims).
"""

import sys
import time

import numpy as np

N_USERS, N_ITEMS, NNZ, K = 100_000, 20_000, 9_900_000, 64
CHUNK = 2_000_000


def data():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    NP_ = -(-NNZ // CHUNK) * CHUNK
    rows = np.full(NP_, N_USERS, np.int32)
    cols = np.full(NP_, N_ITEMS, np.int32)
    rows[:NNZ] = rng.integers(0, N_USERS, NNZ)
    cols[:NNZ] = rng.integers(0, N_ITEMS, NNZ)
    res = np.zeros(NP_, np.float32)
    res[:NNZ] = rng.normal(3, 1, NNZ)
    return (jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(res),
            NP_ // CHUNK)


def t(fn, *a):
    import jax.numpy as jnp
    t0 = time.time()
    out = fn(*a)
    leaf = out[0] if isinstance(out, tuple) else out
    _ = float(jnp.sum(leaf.reshape(-1)[:4]))
    c = time.time() - t0
    t0 = time.time()
    out = fn(*a)
    leaf = out[0] if isinstance(out, tuple) else out
    _ = float(jnp.sum(leaf.reshape(-1)[:4]))
    return c, time.time() - t0


def main():
    stage = sys.argv[1]
    import jax
    import jax.numpy as jnp
    print("devices:", jax.devices(), "stage:", stage, flush=True)
    rows, cols, res, nc = data()
    u_k = jnp.zeros(N_USERS + 1, jnp.float32)
    v_k = jnp.ones(N_ITEMS + 1, jnp.float32)

    def _sl(x, off):
        return jax.lax.dynamic_slice(x, (off,), (CHUNK,))

    if stage == "slice":
        @jax.jit
        def f(res):
            def body(c, acc):
                return acc + jnp.sum(_sl(res, c * CHUNK))
            return jax.lax.fori_loop(0, nc, body, 0.0)
        c, dt = t(f, res)

    elif stage == "gather":
        @jax.jit
        def f(res, cols, v_k):
            def body(c, acc):
                off = c * CHUNK
                vg = v_k[_sl(cols, off)]
                return acc + jnp.sum(vg * _sl(res, off))
            return jax.lax.fori_loop(0, nc, body, 0.0)
        c, dt = t(f, res, cols, v_k)

    elif stage == "seg":
        @jax.jit
        def f(res, rows, cols, v_k):
            def body(c, su):
                off = c * CHUNK
                vg = v_k[_sl(cols, off)]
                r = _sl(res, off)
                return su + jax.ops.segment_sum(
                    jnp.stack([r * vg, vg * vg], axis=1),
                    _sl(rows, off), N_USERS + 1)
            return jax.lax.fori_loop(
                0, nc, body, jnp.zeros((N_USERS + 1, 2), jnp.float32))
        c, dt = t(f, res, rows, cols, v_k)

    elif stage == "upd":
        @jax.jit
        def f(res, rows, cols, u_k, v_k):
            def body(c, res):
                off = c * CHUNK
                r = (_sl(res, off)
                     + u_k[_sl(rows, off)] * v_k[_sl(cols, off)])
                return jax.lax.dynamic_update_slice(res, r, (off,))
            return jax.lax.fori_loop(0, nc, body, res)
        c, dt = t(f, res, rows, cols, u_k, v_k)

    elif stage in ("sweep", "scan4", "scan64"):
        from matfac_tpu.config import Params
        from matfac_tpu.solvers.ccd import _make_sweep_core
        p = Params(fac_dim=K, u_reg=0.05, i_reg=0.05)
        core = _make_sweep_core(N_USERS, N_ITEMS, 0.05, 0.05, 5, None,
                                nc, CHUNK)
        u_fac = jnp.zeros((N_USERS, K), jnp.float32)
        i_fac = jnp.full((N_ITEMS, K), 0.1, jnp.float32)
        if stage == "sweep":
            @jax.jit
            def f(u_fac, i_fac, res, rows, cols):
                return core(u_fac, i_fac, res, rows, cols, 0)
            c, dt = t(f, u_fac, i_fac, res, rows, cols)
        else:
            ndim = 4 if stage == "scan4" else K
            @jax.jit
            def f(u_fac, i_fac, res, rows, cols):
                def body(carry, kk):
                    return core(*carry, rows, cols, kk), None
                out, _ = jax.lax.scan(body, (u_fac, i_fac, res),
                                      jnp.arange(ndim))
                return out
            c, dt = t(f, u_fac, i_fac, res, rows, cols)
    else:
        raise SystemExit(f"unknown stage {stage}")

    print(f"OK {stage}: compile+first={c:.1f}s run={dt*1000:.0f}ms",
          flush=True)


if __name__ == "__main__":
    main()
