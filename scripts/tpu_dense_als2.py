"""Dense-ALS round 2: packed + int8 Grams at the full bench shape.

Follow-up to scripts/tpu_dense_als.py (bucket_cg6 194 ms /
dense_packed_cg6 164 ms same day): measures the int8-Gram mode
(scripts/tpu_int8_gram.py rate probe: 278 TOPS vs 161 bf16) through
the real DenseALSSolver path.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_dense_als2.py > /tmp/tpu_dense_als2.log 2>&1 &
"""

import time


def main():
    import jax
    import jax.numpy as jnp

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.solvers.als import ALSSolver, DenseALSSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items, k = 100_000, 20_000, 64
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    params = Params(fac_dim=k, u_reg=0.01, i_reg=0.01,
                    learn_rate=0.005, seed=0)
    inval_u, inval_i = freq.invalid_users_items(mat, n_users, n_items)
    model = ModelMF(params, n_users, n_items)

    def force(state):
        return float(jnp.sum(state.u_fac[0]) + jnp.sum(state.i_fac[0]))

    def time_solver(label, solver, n=3, quality_epochs=0):
        state = init_state(params, n_users, n_items)
        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        state = solver.epoch(state, params.learn_rate, key)
        force(state)
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            state = solver.epoch(state, params.learn_rate, key)
        force(state)
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: compile+1st={comp:.1f}s epoch={dt*1000:.1f}ms "
              f"= {mat.nnz/dt/1e6:.1f}M ratings/s", flush=True)
        del state
        return dt

    # same-day scatter/bucket reference for device-speed normalization
    b = ALSSolver(model, params, mat, inval_u, inval_i, cg_iters=6)
    time_solver("bucket_cg6", b)
    del b

    d = DenseALSSolver(model, params, mat, inval_u, inval_i,
                       cg_iters=6, packed=True, gram_int8=True)
    time_solver("dense_packed_int8_cg6", d)

    # quality spot-check: 10 epochs, train RMSE via the evaluator
    from matfac_tpu.eval.metrics import Evaluator
    from matfac_tpu.data.dataset import Data
    data = Data(train_mat=mat)
    ev = Evaluator(data, inval_u, inval_i, params)
    state = init_state(params, n_users, n_items)
    for _ in range(10):
        state = d.epoch(state, 0.0, None)
    print("int8 train RMSE after 10 epochs:",
          ev.rmse(model.eval_view(state), "train"), flush=True)


if __name__ == "__main__":
    main()
