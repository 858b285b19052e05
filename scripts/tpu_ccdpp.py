"""CCD++ scale bisect + benchmark on the real TPU chip (VERDICT r1 #1).

Round 1: the monolithic scan epoch kernel-faulted the TPU worker at
100k-user/10M-nnz; fine at ML-100K scale. This script ramps nnz upward
through the three sweep modes and records, for each (scale, mode),
compile+run status and ratings/s — so the fault is localized and a
BENCH-able ML-10M number exists for whichever mode survives.

Run: nohup python scripts/tpu_ccdpp.py > /tmp/tpu_ccdpp.log 2>&1 &
(ONE TPU process at a time; poll the log.)
"""

import time

import numpy as np


def run_stage(n_users, n_items, nnz_target, k, mode, n_epochs=3,
              dim_chunk=8, nnz_chunk=None, engine="sorted",
              group_dims=1):
    import jax
    import jax.numpy as jnp

    from matfac_tpu.config import Params
    from matfac_tpu.data.csr import RatingMatrix
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.solvers.ccd import CCDPPSolver

    rng = np.random.default_rng(7)
    r = rng.integers(0, n_users, nnz_target)
    c = rng.integers(0, n_items, nnz_target)
    v = rng.normal(3.0, 1.0, nnz_target).astype(np.float32)
    mat = RatingMatrix.from_coo(r, c, v, n_users, n_items)
    params = Params(fac_dim=k, u_reg=0.05, i_reg=0.05, seed=1)
    model = ModelMF(params, n_users, n_items)
    iu = np.zeros(n_users, bool)
    ii = np.zeros(n_items, bool)
    solver = CCDPPSolver(model, params, mat, iu, ii, sweep_mode=mode,
                         dim_chunk=dim_chunk, nnz_chunk=nnz_chunk,
                         engine=engine, group_dims=group_dims)
    print(f"  nnz_chunk: nc={solver.nc} chunk={solver.chunk}", flush=True)
    st = init_state(params, n_users, n_items)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    key, ek = jax.random.split(key)
    st = solver.epoch(st, 0, ek)
    # axon: block_until_ready does not sync; force a readback
    _ = float(jnp.sum(st.u_fac[0]))
    compile_s = time.time() - t0
    times = []
    for _ in range(n_epochs):
        key, ek = jax.random.split(key)
        t0 = time.time()
        st = solver.epoch(st, 0, ek)
        _ = float(jnp.sum(st.u_fac[0]))
        times.append(time.time() - t0)
    dt = min(times)
    print(f"OK {mode}/{engine}/g={group_dims} {n_users}x{n_items} nnz={mat.nnz} k={k}: "
          f"compile+first={compile_s:.1f}s epoch={dt*1000:.0f}ms "
          f"rate={mat.nnz/dt/1e6:.1f}M ratings/s", flush=True)


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    k = 64
    # round 2: auto nnz_chunk (2M passes) is the kernel-fault fix; run
    # the headline ML-10M shape directly
    import os
    engines = os.environ.get("CCDPP_ENGINES", "sorted,scatter").split(",")
    groups = [int(g) for g in
              os.environ.get("CCDPP_GROUPS", "1").split(",")]
    stages = [
        (100_000, 20_000, 9_900_000, None),   # auto: chunked+nnz_chunk
    ]
    for engine in engines:
        for g in (groups if engine == "sorted" else [1]):
            for n_users, n_items, nnz, mode in stages:
                print(f"--- stage {mode}/{engine}/g={g} nnz={nnz}",
                      flush=True)
                try:
                    run_stage(n_users, n_items, nnz, k, mode,
                              n_epochs=2, engine=engine, group_dims=g)
                except Exception as e:  # noqa: BLE001 — log, continue
                    print(f"FAIL {mode}/{engine}/g={g} nnz={nnz}: "
                          f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
