"""Diagonal-batched block-SGD engine at bench scale on the real chip.

schedule="diag" runs NI axis-disjoint cells per round as one vmapped
one-hot matmul group, so small blocks (low per-rating FLOP, which is
proportional to 4k(bu+bi)) keep the MXU busy — the row schedule
measured 143 ms at bu=512 vs 117 ms at bu=1024 because its small
matmuls ([2048,512]@[512,64]) underfill the array.

Run: nohup python scripts/tpu_blocksgd_diag.py > /tmp/tpu_diag.log 2>&1 &
(ONE TPU process at a time; poll the log.)
"""

import time


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
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items = 100_000, 20_000
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    print(f"nnz={mat.nnz}", flush=True)

    for label, k, bsz, bu, bi in [
            ("diag k64 b512 B256", 64, 512, 256, 256),
            ("diag k64 b256 B256", 64, 256, 256, 256),
            ("diag k64 b1024 B512", 64, 1024, 512, 512),
            ("diag k64 b512 B512", 64, 512, 512, 512),
            ("diag k64 b2048 B1024", 64, 2048, 1024, 1024),
            ("diag k64 b256 B128", 64, 256, 128, 128),
            ("diag k128 b512 B256", 128, 512, 256, 256)]:
        params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                        learn_rate=0.005, seed=0)
        model = ModelMF(params, n_users, n_items)
        try:
            s = BlockSGDSolver(model, params, mat, iu, ii,
                               batch_size=bsz, bu=bu, bi=bi,
                               collision_norm=True, schedule="diag")
            print(f"{label}: S={s.S} pad_frac={s.pad_frac:.2f} "
                  f"n_steps={s.S//s.bs} NU={s.NU} NI={s.NI}",
                  flush=True)
            c, dt = time_epochs(s, params, n_users, n_items)
            print(f"{label}: compile={c:.1f}s epoch={dt*1000:.0f}ms "
                  f"rate={s.nnz/dt/1e6:.1f}M ratings/s", flush=True)
            st = init_state(params, n_users, n_items)
            en = []
            for e in range(4):
                st = s.epoch(st, 0.02, None)
                r8 = st.u_fac[:1024] @ st.i_fac[:1024].T
                en.append(round(float(jnp.sum(r8 * r8)), 1))
            print(f"{label}: energy trace {en}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAIL: {type(e).__name__}: {str(e)[:1200]}",
                  flush=True)


if __name__ == "__main__":
    main()
