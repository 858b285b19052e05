"""XLA one-hot block-SGD engine at bench scale on the real chip.

The Pallas twin crashes the axon remote Mosaic compile (HTTP 500 —
BASELINE.md round-2 notes), so the XLA engine carries the one-hot MXU
formulation. This probe measures it at the bench "full" shape against
the same-day SGDSolver f32 number (device speed varies day to day —
always compare same-process).

Run: nohup python scripts/tpu_blocksgd.py > /tmp/tpu_blocksgd.log 2>&1 &
(ONE TPU process at a time; poll the log.)
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
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.solvers.block_sgd import BlockSGDSolver
    from matfac_tpu.solvers.sgd import SGDSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items = 100_000, 20_000
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    print(f"nnz={mat.nnz}", flush=True)

    # same-day device-speed reference: scatter SGD f32 (round-1 chip
    # speed ran this at 258 ms; the round-2 degraded day at 543/560 ms)
    params = Params(fac_dim=64, u_reg=0.001, i_reg=0.001,
                    learn_rate=0.005, seed=0, batch_size=8192)
    model = ModelMF(params, n_users, n_items)
    s = SGDSolver(model, params, mat, iu, ii)
    c, dt = time_epochs(s, params, n_users, n_items)
    print(f"scatter SGD f32 ref: compile={c:.1f}s epoch={dt*1000:.0f}ms "
          f"rate={s.nnz/dt/1e6:.1f}M ratings/s", flush=True)

    for label, k, mm_bf16, bsz, bu, bi in [
            ("xla bf16 k64 b2048 bu1024", 64, True, 2048, 1024, 1024),
            ("xla bf16 k64 b4096 bu1024", 64, True, 4096, 1024, 1024),
            ("xla bf16 k64 b2048 bu512", 64, True, 2048, 512, 512),
            ("xla bf16 k64 b1024 bu512", 64, True, 1024, 512, 512),
            ("xla bf16 k64 b2048 bu1024 bi512", 64, True, 2048, 1024, 512),
            ("xla bf16 k128 b2048 bu1024", 128, True, 2048, 1024, 1024)]:
        params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                        learn_rate=0.005, seed=0)
        model = ModelMF(params, n_users, n_items)
        try:
            s = BlockSGDSolver(model, params, mat, iu, ii,
                               batch_size=bsz, bu=bu, bi=bi,
                               collision_norm=True, mm_bf16=mm_bf16,
                               engine="xla")
            print(f"{label}: S={s.S} pad_frac={s.pad_frac:.2f} "
                  f"n_steps={s.S//s.bs}", flush=True)
            c, dt = time_epochs(s, params, n_users, n_items)
            print(f"{label}: compile={c:.1f}s epoch={dt*1000:.0f}ms "
                  f"rate={s.nnz/dt/1e6:.1f}M ratings/s", flush=True)
            st = init_state(params, n_users, n_items)
            key = jax.random.PRNGKey(1)
            en = []
            for e in range(4):
                key, ek = jax.random.split(key)
                st = s.epoch(st, 0.02, ek)
                r8 = st.u_fac[:1024] @ st.i_fac[:1024].T
                en.append(round(float(jnp.sum(r8 * r8)), 1))
            print(f"{label}: energy trace {en}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAIL: {type(e).__name__}: {str(e)[:1200]}",
                  flush=True)


if __name__ == "__main__":
    main()
