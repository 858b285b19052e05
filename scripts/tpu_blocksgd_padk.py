"""pad_k=128 diag/row block-SGD probe: k=64 workloads through the
full-lane MXU path (diag k128 B256 measured 94 ms vs 153 ms at native
k=64 — N=128 fills the MXU result lanes).

Run: nohup python scripts/tpu_blocksgd_padk.py > /tmp/tpu_padk.log 2>&1 &
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

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import ModelMF
    from matfac_tpu.solvers.block_sgd import BlockSGDSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items = 100_000, 20_000
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    print(f"nnz={mat.nnz}", flush=True)

    for label, k, pad, sched, bsz, bu, bi in [
            ("diag k64pad128 b512 B256", 64, 128, "diag", 512, 256, 256),
            ("diag k64pad128 b1024 B384", 64, 128, "diag", 1024, 384, 384),
            ("diag k64pad128 b1024 B512", 64, 128, "diag", 1024, 512, 512),
            ("diag k64pad128 b2048 B1024", 64, 128, "diag", 2048, 1024, 1024),
            ("row k64pad128 b2048 bu1024", 64, 128, "row", 2048, 1024, 1024),
            ("diag k128 b1024 B512", 128, 0, "diag", 1024, 512, 512),
            ("diag k128 b2048 B1024", 128, 0, "diag", 2048, 1024, 1024)]:
        params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                        learn_rate=0.005, seed=0)
        model = ModelMF(params, n_users, n_items)
        try:
            s = BlockSGDSolver(model, params, mat, iu, ii,
                               batch_size=bsz, bu=bu, bi=bi,
                               collision_norm=True, schedule=sched,
                               pad_k=pad)
            print(f"{label}: S={s.S} pad_frac={s.pad_frac:.2f} "
                  f"n_steps={s.S//s.bs}", flush=True)
            c, dt = time_epochs(s, params, n_users, n_items)
            print(f"{label}: compile={c:.1f}s epoch={dt*1000:.0f}ms "
                  f"rate={s.nnz/dt/1e6:.1f}M ratings/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAIL: {type(e).__name__}: {str(e)[:800]}",
                  flush=True)


if __name__ == "__main__":
    main()
