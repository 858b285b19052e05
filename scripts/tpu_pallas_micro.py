"""Mosaic in-kernel cost floor for the one-hot block-SGD batch update.

The round-2 Pallas row kernel measured ~15 us per [bs=1024, bu=512]
batch in-kernel — 5x the sum of its parts (one-hot build ~1.6 us +
4 matmuls ~1.3 us + grad math) — while the XLA diag engine pays
~4.5 us/batch end-to-end (62.4 ms / 13833 batches at the full bench
shape). Before building a Pallas DIAG kernel (which would remove both
the ~115 us/sequential-step tunnel overhead and the ~44 GB/epoch
one-hot HBM traffic), this probe decomposes the in-kernel cost at the
real shapes:

  noop    fori + per-iteration VMEM stream slices only
  build   + 2 one-hot builds (compare-iota, bf16)
  buildT  builds the TRANSPOSED one-hots [b, bs] directly instead
  mm      4 matmuls on PREBUILT one-hots, scatter side via oh.T
          (if Mosaic lowers the .T as a real VPU transpose this is
          where the missing 10 us hides)
  mmT     4 matmuls, scatter side on directly-built oh_T (no .T op)
  full    the exact shared _batch_update (ops/block_sgd_kernel.py)
  fullT   _batch_update re-plumbed to build oh_T directly

Per-batch cost = (t(ITERS_HI) - t(ITERS_LO)) / (ITERS_HI - ITERS_LO),
min of 3 — the two-point diff cancels the ~25-30 ms tunnel sync cost.
Go/no-go: a diag kernel wins if full/fullT lands ~<=3 us (epoch ~<=42 ms
at the full bench shape vs 62.4 ms XLA).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_pallas_micro.py > /tmp/tpu_pallas_micro.log 2>&1 &
"""

import functools
import time

import numpy as np


def build_probe(variant, iters, bs, bu, bi, k, span):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from matfac_tpu.ops.block_sgd_kernel import _batch_update

    mm_dtype = jnp.bfloat16
    lr = 0.005  # python float: jnp closures become captured consts

    def body_for(variant, refs, s, U, I):
        u_loc_ref, i_loc_ref, vals_ref, wts_ref = refs
        # lane-dim dynamic slices must be 256-aligned (unaligned
        # offsets crash the Mosaic compile with exit code 1)
        start = (s % (span // 256)) * 256
        u = u_loc_ref[0, pl.ds(start, bs)]
        i = i_loc_ref[0, pl.ds(start, bs)]
        r = vals_ref[0, pl.ds(start, bs)]
        w = wts_ref[0, pl.ds(start, bs)]
        if variant == "noop":
            U = U + r[0] * 1e-30
            I = I + w[0] * 1e-30
            return U, I
        if variant in ("build", "buildT"):
            if variant == "build":
                iota_u = jax.lax.broadcasted_iota(jnp.int32, (bs, bu), 1)
                iota_i = jax.lax.broadcasted_iota(jnp.int32, (bs, bi), 1)
                oh_u = (u[:, None] == iota_u).astype(mm_dtype)
                oh_i = (i[:, None] == iota_i).astype(mm_dtype)
                red_u = jnp.sum(oh_u.astype(jnp.float32), axis=0)
                red_i = jnp.sum(oh_i.astype(jnp.float32), axis=0)
            else:
                iota_u = jax.lax.broadcasted_iota(jnp.int32, (bu, bs), 0)
                iota_i = jax.lax.broadcasted_iota(jnp.int32, (bi, bs), 0)
                oh_u = (u[None, :] == iota_u).astype(mm_dtype)
                oh_i = (i[None, :] == iota_i).astype(mm_dtype)
                red_u = jnp.sum(oh_u.astype(jnp.float32), axis=1)
                red_i = jnp.sum(oh_i.astype(jnp.float32), axis=1)
            U = U + red_u[:, None] * 1e-30
            I = I + red_i[:, None] * 1e-30
            return U, I
        if variant == "full":
            return _batch_update(U, I, u, i, r, w, None, None, None,
                                 lr, k, bu, bi, 0.001, 0.001, False,
                                 False, mm_dtype)
        if variant == "fullT":
            iota_u = jax.lax.broadcasted_iota(jnp.int32, (bs, bu), 1)
            iota_i = jax.lax.broadcasted_iota(jnp.int32, (bs, bi), 1)
            oh_u = (u[:, None] == iota_u).astype(mm_dtype)
            oh_i = (i[:, None] == iota_i).astype(mm_dtype)
            iota_uT = jax.lax.broadcasted_iota(jnp.int32, (bu, bs), 0)
            iota_iT = jax.lax.broadcasted_iota(jnp.int32, (bi, bs), 0)
            oh_uT = (u[None, :] == iota_uT).astype(mm_dtype)
            oh_iT = (i[None, :] == iota_iT).astype(mm_dtype)
            pu = jnp.dot(oh_u, U.astype(mm_dtype),
                         preferred_element_type=jnp.float32)
            qi = jnp.dot(oh_i, I.astype(mm_dtype),
                         preferred_element_type=jnp.float32)
            pred = jnp.sum(pu * qi, axis=1)
            coeff = w * (r - pred)
            vmask = (w > 0).astype(jnp.float32)
            gu = -2.0 * coeff[:, None] * qi + 2.0 * 0.001 * vmask[:, None] * pu
            gi = -2.0 * coeff[:, None] * pu + 2.0 * 0.001 * vmask[:, None] * qi
            U = U + jnp.dot(oh_uT, (-lr * gu).astype(mm_dtype),
                            preferred_element_type=jnp.float32)
            I = I + jnp.dot(oh_iT, (-lr * gi).astype(mm_dtype),
                            preferred_element_type=jnp.float32)
            return U, I
        raise ValueError(variant)

    def kernel(u_loc_ref, i_loc_ref, vals_ref, wts_ref,
               u_in, i_in, u_out, i_out):
        refs = (u_loc_ref, i_loc_ref, vals_ref, wts_ref)
        if variant in ("mm", "mmT"):
            # prebuilt one-hots (hoisted by design: isolate matmul cost)
            u = u_loc_ref[0, pl.ds(0, bs)]
            i = i_loc_ref[0, pl.ds(0, bs)]
            iota_u = jax.lax.broadcasted_iota(jnp.int32, (bs, bu), 1)
            iota_i = jax.lax.broadcasted_iota(jnp.int32, (bs, bi), 1)
            oh_u = (u[:, None] == iota_u).astype(mm_dtype)
            oh_i = (i[:, None] == iota_i).astype(mm_dtype)
            if variant == "mmT":
                iota_uT = jax.lax.broadcasted_iota(jnp.int32, (bu, bs), 0)
                iota_iT = jax.lax.broadcasted_iota(jnp.int32, (bi, bs), 0)
                oh_uT = (u[None, :] == iota_uT).astype(mm_dtype)
                oh_iT = (i[None, :] == iota_iT).astype(mm_dtype)

            def step(s, UI):
                U, I = UI
                pu = jnp.dot(oh_u, U.astype(mm_dtype),
                             preferred_element_type=jnp.float32)
                qi = jnp.dot(oh_i, I.astype(mm_dtype),
                             preferred_element_type=jnp.float32)
                gu = qi * 1e-6
                gi = pu * 1e-6
                if variant == "mmT":
                    U = U + jnp.dot(oh_uT, gu.astype(mm_dtype),
                                    preferred_element_type=jnp.float32)
                    I = I + jnp.dot(oh_iT, gi.astype(mm_dtype),
                                    preferred_element_type=jnp.float32)
                else:
                    U = U + jnp.dot(oh_u.T, gu.astype(mm_dtype),
                                    preferred_element_type=jnp.float32)
                    I = I + jnp.dot(oh_i.T, gi.astype(mm_dtype),
                                    preferred_element_type=jnp.float32)
                return U, I
        else:
            def step(s, UI):
                U, I = UI
                return body_for(variant, refs, s, U, I)

        U, I = jax.lax.fori_loop(0, iters, step,
                                 (u_in[:, :], i_in[:, :]))
        u_out[:, :] = U
        i_out[:, :] = I

    @jax.jit
    def run(u_loc, i_loc, vals, wts, U0, I0):
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((bu, k), jnp.float32),
                       jax.ShapeDtypeStruct((bi, k), jnp.float32)],
        )(u_loc, i_loc, vals, wts, U0, I0)

    return run


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    IT_LO, IT_HI = 2048, 18432

    cases = [
        ("noop", 1024, 384, 384, 128),
        ("build", 1024, 384, 384, 128),
        ("buildT", 1024, 384, 384, 128),
        ("full", 1024, 384, 384, 128),
        ("fullT", 1024, 384, 384, 128),
        ("full", 1024, 384, 384, 64),
        ("fullT", 2048, 384, 384, 128),
        ("fullT", 1024, 256, 256, 128),
    ]
    for variant, bs, bu, bi, k in cases:
        span = 2048
        u_loc = jnp.asarray(rng.integers(0, bu, bs + span + 64),
                            jnp.int32)[None, :]
        i_loc = jnp.asarray(rng.integers(0, bi, bs + span + 64),
                            jnp.int32)[None, :]
        vals = jnp.asarray(rng.normal(size=bs + span + 64),
                           jnp.float32)[None, :]
        wts = jnp.ones((1, bs + span + 64), jnp.float32)
        U0 = jnp.asarray(rng.normal(size=(bu, k)) * 0.01, jnp.float32)
        I0 = jnp.asarray(rng.normal(size=(bi, k)) * 0.01, jnp.float32)
        label = f"{variant} bs={bs} b={bu} k={k}"
        try:
            ts = {}
            for iters in (IT_LO, IT_HI):
                run = build_probe(variant, iters, bs, bu, bi, k, span)
                t0 = time.time()
                out = run(u_loc, i_loc, vals, wts, U0, I0)
                float(jnp.sum(out[0][0]))
                comp = time.time() - t0
                best = np.inf
                for _ in range(3):
                    t0 = time.time()
                    out = run(u_loc, i_loc, vals, wts, U0, I0)
                    float(jnp.sum(out[0][0]))
                    best = min(best, time.time() - t0)
                ts[iters] = best
                print(f"  {label} iters={iters}: compile={comp:.1f}s "
                      f"best={best*1000:.1f}ms", flush=True)
            per = (ts[IT_HI] - ts[IT_LO]) / (IT_HI - IT_LO)
            rate = bs / per / 1e6 if per > 0 else float("inf")
            print(f"{label}: per-batch={per*1e6:.2f}us "
                  f"-> {rate:.0f}M ratings/s equiv", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAIL: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:300]}", flush=True)


if __name__ == "__main__":
    main()
