"""Dense-stripe BPR throughput at the full bench shape (VERDICT r3 #3).

Same-process measurements: stream BPR (rankgap, n_tries=2 — the bench
config; plus n_tries=1, the fast config) vs DenseBPRSolver at n_negs =
1 and 2. Loss is read back each timed epoch for both engines so the
comparison includes the same scalar sync. A 10-epoch loss trajectory
sanity-checks learning at scale.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_dense_bpr.py > /tmp/tpu_dense_bpr.log 2>&1 &
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import init_state
    from matfac_tpu.models.bpr import ModelMFBPR
    from matfac_tpu.solvers.bpr import BPRSolver
    from matfac_tpu.solvers.bpr_dense import DenseBPRSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items, k = 100_000, 20_000, 64
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    params = Params(fac_dim=k, u_reg=0.01, i_reg=0.01,
                    learn_rate=0.05, seed=0, batch_size=65536)
    inval_u, inval_i = freq.invalid_users_items(mat, n_users, n_items)
    model = ModelMFBPR(params, n_users, n_items)

    def time_solver(label, solver, n_pairs, n=3):
        state = init_state(params, n_users, n_items)
        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        key, ek = jax.random.split(key)
        state = solver.epoch(state, params.learn_rate, ek)
        l0 = float(solver.last_loss)
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            key, ek = jax.random.split(key)
            state = solver.epoch(state, params.learn_rate, ek)
            last = float(solver.last_loss)
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: compile+1st={comp:.1f}s epoch={dt*1000:.1f}ms "
              f"= {n_pairs/dt/1e6:.1f}M pairs/s "
              f"(loss {l0:.3e} -> {last:.3e})", flush=True)
        del state
        return dt

    s2 = BPRSolver(model, params, mat, inval_u, inval_i, n_tries=2,
                   sampler="rankgap")
    time_solver("stream n_tries=2 (bench cfg)", s2, s2.n_pos)
    del s2
    s1 = BPRSolver(model, params, mat, inval_u, inval_i, n_tries=1,
                   sampler="rankgap")
    time_solver("stream n_tries=1 (fast cfg)", s1, s1.n_pos)
    del s1

    d1 = DenseBPRSolver(model, params, mat, inval_u, inval_i, n_negs=1)
    print(f"dense staging: NU={d1.NU} bu={d1.bu} S={d1.S} "
          f"pad_frac={d1.pad_frac:.2f}", flush=True)
    time_solver("dense n_negs=1", d1, d1.n_pos)

    # loss trajectory sanity at scale
    state = init_state(params, n_users, n_items)
    key = jax.random.PRNGKey(7)
    lr = params.learn_rate
    for ep in range(10):
        key, ek = jax.random.split(key)
        state = d1.epoch(state, lr, ek)
        lr *= 0.9
        print(f"  dense epoch {ep}: loss={float(d1.last_loss):.4e} "
              f"inv={int(d1.last_inversions)}", flush=True)
    del d1, state

    d2 = DenseBPRSolver(model, params, mat, inval_u, inval_i, n_negs=2)
    time_solver("dense n_negs=2", d2, 2 * d2.n_pos)
    del d2


if __name__ == "__main__":
    main()
