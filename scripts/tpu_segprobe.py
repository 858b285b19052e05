"""Isolate the slow/faulting primitive in the CCD++ path on the axon
backend: gather, scatter-add, segment_sum, and the CCD++ inner
expression, each at several nnz scales, each scale in its OWN
subprocess (a worker crash poisons the client for the rest of the
process — observed in the round-2 bisect).

Run: nohup python scripts/tpu_segprobe.py > /tmp/tpu_segprobe.log 2>&1 &
Single-stage mode: python scripts/tpu_segprobe.py --stage gather --nnz 2000000
"""

import argparse
import subprocess
import sys
import time


def run_stage(stage: str, nnz: int, n_rows: int = 100_000):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, n_rows, nnz).astype(np.int32))
    x = jnp.asarray(rng.normal(size=nnz).astype(np.float32))
    tab = jnp.asarray(rng.normal(size=n_rows).astype(np.float32))

    if stage == "gather":
        f = jax.jit(lambda t, r: t[r])
        args = (tab, rows)
    elif stage == "scatter":
        f = jax.jit(lambda v, r: jnp.zeros(n_rows, jnp.float32
                                           ).at[r].add(v))
        args = (x, rows)
    elif stage == "segsum":
        f = jax.jit(lambda v, r: jax.ops.segment_sum(v, r, n_rows))
        args = (x, rows)
    elif stage == "sorted_segsum":
        rows_s = jnp.sort(rows)
        f = jax.jit(lambda v, r: jax.ops.segment_sum(
            v, r, n_rows, indices_are_sorted=True))
        args = (x, rows_s)
    elif stage == "ccd_inner":
        # one inner alternation of one dim: 2 gathers + 2 segsums + mul
        def g(res, u_k, v_k, r, c):
            vg = v_k[c]
            num = jax.ops.segment_sum(res * vg, r, n_rows)
            den = jax.ops.segment_sum(vg * vg, r, n_rows)
            return num / (0.05 + den)
        f = jax.jit(g)
        cols = jnp.asarray(rng.integers(0, 20_000, nnz).astype(np.int32))
        args = (x, tab, jnp.asarray(
            rng.normal(size=20_000).astype(np.float32)), rows, cols)
    else:
        raise SystemExit(f"unknown stage {stage}")

    t0 = time.time()
    out = f(*args)
    _ = float(jnp.sum(out[:8]))
    compile_s = time.time() - t0
    times = []
    for _ in range(5):
        t0 = time.time()
        out = f(*args)
        _ = float(jnp.sum(out[:8]))
        times.append(time.time() - t0)
    dt = min(times)
    print(f"OK {stage} nnz={nnz}: compile={compile_s:.1f}s "
          f"t={dt*1000:.1f}ms ({nnz/dt/1e6:.0f}M elt/s)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage")
    ap.add_argument("--nnz", type=int, default=2_000_000)
    args = ap.parse_args()
    if args.stage:
        run_stage(args.stage, args.nnz)
        return
    for stage in ("gather", "scatter", "segsum", "sorted_segsum",
                  "ccd_inner"):
        for nnz in (2_000_000, 9_900_000):
            p = subprocess.run(
                [sys.executable, __file__, "--stage", stage,
                 "--nnz", str(nnz)],
                capture_output=True, text=True, timeout=1200)
            out = (p.stdout + p.stderr).strip().splitlines()
            tail = [l for l in out if l.startswith("OK")] or out[-2:]
            print(f"[{stage} {nnz}] rc={p.returncode}:", *tail,
                  flush=True)


if __name__ == "__main__":
    main()
