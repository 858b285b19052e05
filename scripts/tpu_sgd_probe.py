"""SGD roofline probes on the real TPU chip (VERDICT r1 #2).

Stages:
  1. SGDSolver f32 at full bench scale (collision_norm on and off —
     quantifies the stabilizer's overhead on the hot path)
  2. SGDSolver with bfloat16 factor tables (halves table traffic)
  3. ops/sgd_kernel.fused_cell_update compiled by Mosaic at cell shape
     (the round-1 open question: dynamic gather/scatter lowering) —
     correctness vs interpret mode + timing if it compiles

Run: nohup python scripts/tpu_sgd_probe.py > /tmp/tpu_sgd.log 2>&1 &
"""

import time

import numpy as np


def force(x):
    import jax.numpy as jnp
    return float(jnp.sum(x[0]))


def time_epochs(solver, params, n_users, n_items, n=3, seed=0):
    import jax

    from matfac_tpu.models.base import init_state
    state = init_state(params, n_users, n_items)
    key = jax.random.PRNGKey(seed)
    key, k1 = jax.random.split(key)
    t0 = time.time()
    state = solver.epoch(state, params.learn_rate, k1)
    force(state.u_fac)
    compile_s = time.time() - t0
    times = []
    for _ in range(n):
        key, k1 = jax.random.split(key)
        t0 = time.time()
        state = solver.epoch(state, params.learn_rate, k1)
        force(state.u_fac)
        times.append(time.time() - t0)
    return compile_s, min(times)


def main():
    import jax
    import jax.numpy as jnp

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import ModelMF
    from matfac_tpu.solvers.sgd import SGDSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items, k = 100_000, 20_000, 64
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    print(f"nnz={mat.nnz}", flush=True)

    for label, dtype, cn, bs in [
            ("bf16+cn", "bfloat16", True, 65_536),
    ]:
        params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                        learn_rate=0.005, seed=0, batch_size=bs,
                        dtype=dtype)
        model = ModelMF(params, n_users, n_items)
        try:
            s = SGDSolver(model, params, mat, iu, ii, collision_norm=cn)
            c, dt = time_epochs(s, params, n_users, n_items)
            print(f"SGD {label}: compile={c:.1f}s epoch={dt*1000:.0f}ms "
                  f"rate={mat.nnz/dt/1e6:.1f}M ratings/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"SGD {label} FAIL: {type(e).__name__}: {e}",
                  flush=True)

    # ---- stage 2.5: one-hot block kernel at full scale ----
    from matfac_tpu.eval.metrics import Evaluator  # noqa: F401
    from matfac_tpu.solvers.block_sgd import BlockSGDSolver
    for label, mm_bf16, cn, bsz in [("block bf16+cn b256", True, True, 256),
                                    ("block bf16+cn b1024", True, True, 1024),
                                    ("block f32+cn b256", False, True, 256)]:
        params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                        learn_rate=0.005, seed=0)
        model = ModelMF(params, n_users, n_items)
        try:
            s = BlockSGDSolver(model, params, mat, iu, ii,
                               batch_size=bsz, bu=1024, bi=1024,
                               collision_norm=cn, mm_bf16=mm_bf16)
            print(f"{label}: S={s.S} pad_frac={s.pad_frac:.2f}",
                  flush=True)
            c, dt = time_epochs(s, params, n_users, n_items)
            eff = s.nnz / dt
            print(f"{label}: compile={c:.1f}s epoch={dt*1000:.0f}ms "
                  f"rate={eff/1e6:.1f}M ratings/s", flush=True)
            # sanity: objective must decrease over a few epochs
            from matfac_tpu.models.base import init_state
            st = init_state(params, n_users, n_items)
            pred_err = []
            keyc = jax.random.PRNGKey(1)
            for e in range(4):
                keyc, ek = jax.random.split(keyc)
                st = s.epoch(st, 0.02, ek)
                r8 = st.u_fac[:1024] @ st.i_fac[:1024].T
                pred_err.append(float(jnp.sum(r8 * r8)))
            print(f"{label}: energy trace {pred_err}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAIL: {type(e).__name__}: {str(e)[:1500]}",
                  flush=True)

    # ---- stage 3: Mosaic compile of the fused cell kernel ----
    from matfac_tpu.ops.sgd_kernel import fused_cell_update
    rng = np.random.default_rng(0)
    BU, BI, S, bs_cell = 1024, 4096, 16_384, 256
    u_blk = jnp.asarray(rng.normal(size=(BU, k)).astype(np.float32))
    i_blk = jnp.asarray(rng.normal(size=(BI, k)).astype(np.float32))
    u_loc = jnp.asarray(rng.integers(0, BU, S).astype(np.int32))
    i_loc = jnp.asarray(rng.integers(0, BI, S).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=S).astype(np.float32))
    wts = jnp.ones(S, jnp.float32)
    try:
        t0 = time.time()
        uo, io = fused_cell_update(u_blk, i_blk, u_loc, i_loc, vals, wts,
                                   0.005, bs_cell, 0.001, 0.001)
        _ = force(uo)
        print(f"Mosaic fused cell COMPILED+RAN in {time.time()-t0:.1f}s",
              flush=True)
        # parity vs interpret mode
        ui, ii2 = fused_cell_update(u_blk, i_blk, u_loc, i_loc, vals,
                                    wts, 0.005, bs_cell, 0.001, 0.001,
                                    interpret=True)
        du = float(jnp.max(jnp.abs(uo - ui)))
        di = float(jnp.max(jnp.abs(io - ii2)))
        print(f"Mosaic vs interpret: max|dU|={du:.2e} max|dI|={di:.2e}",
              flush=True)
        # timing: 10 calls
        t0 = time.time()
        for _ in range(10):
            uo, io = fused_cell_update(uo, io, u_loc, i_loc, vals, wts,
                                       0.005, bs_cell, 0.001, 0.001)
        _ = force(uo)
        dt = (time.time() - t0) / 10
        print(f"fused cell: {dt*1000:.1f}ms per {S} ratings "
              f"({S/dt/1e6:.1f}M ratings/s single-cell incl dispatch)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"Mosaic fused cell FAIL: {type(e).__name__}: "
              f"{str(e)[:2000]}", flush=True)


if __name__ == "__main__":
    main()
