"""Embedding-height scale axis on ONE chip: 1M users x 100k items,
~95M ratings, k=64 — the workload SURVEY.md §5 calls this project's
"long-context analog". Measures ALS(+CG), scatter SGD, block-SGD at a
scale-appropriate block size, and one RMSE eval.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_scale_1m.py > /tmp/tpu_1m.log 2>&1 &
"""

import time

import numpy as np


def force(x):
    import jax.numpy as jnp
    return float(jnp.sum(x[0]))


def main():
    import jax

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items, k = 1_000_000, 100_000, 64
    t0 = time.time()
    mat, uf, itf = low_rank_ratings(n_users, n_items, k=8,
                                    density=0.001, seed=0, noise=0.1,
                                    power_law=0.6, nonneg=True)
    print(f"gen: {time.time()-t0:.0f}s nnz={mat.nnz}", flush=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                    learn_rate=0.002, seed=0, batch_size=262_144)
    model = ModelMF(params, n_users, n_items)

    def run(name, make):
        import jax
        try:
            t0 = time.time()
            s = make()
            print(f"{name}: staged in {time.time()-t0:.0f}s", flush=True)
            st = init_state(params, n_users, n_items)
            key = jax.random.PRNGKey(0)
            key, k1 = jax.random.split(key)
            t0 = time.time()
            st = s.epoch(st, params.learn_rate, k1)
            force(st.u_fac)
            c = time.time() - t0
            times = []
            for _ in range(2):
                key, k1 = jax.random.split(key)
                t0 = time.time()
                st = s.epoch(st, params.learn_rate, k1)
                force(st.u_fac)
                times.append(time.time() - t0)
            dt = min(times)
            print(f"{name}: compile={c:.1f}s epoch={dt:.2f}s "
                  f"rate={mat.nnz/dt/1e6:.1f}M ratings/s", flush=True)
            return st
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAIL: {type(e).__name__}: {str(e)[:600]}",
                  flush=True)
            return None

    from matfac_tpu.solvers.als import ALSSolver
    st = run("ALS+CG k=64", lambda: ALSSolver(
        model, params, mat, iu, ii, cg_iters=6))

    if st is not None:
        # one RMSE eval at scale (train RMSE on the final state);
        # exercises the _EVAL_CHUNK scan path (unchunked OOMed: 51 GB
        # gathered-rows intermediate)
        try:
            from matfac_tpu.data.dataset import Data
            from matfac_tpu.eval.metrics import Evaluator
            data = Data.__new__(Data)
            data.train_mat = mat
            data.test_mat = None
            data.val_mat = None
            data.n_users, data.n_items = n_users, n_items
            ev = Evaluator(data, iu, ii, params)
            t0 = time.time()
            r = ev.rmse(model.eval_view(st), "train")
            print(f"train RMSE after 3 ALS epochs: {float(r):.4f} "
                  f"(eval {time.time()-t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"RMSE eval FAIL: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)

    from matfac_tpu.solvers.sgd import SGDSolver
    run("scatter SGD k=64", lambda: SGDSolver(model, params, mat, iu, ii))

    from matfac_tpu.solvers.block_sgd import BlockSGDSolver
    run("blockSGD diag b=2048 bs=4096", lambda: BlockSGDSolver(
        model, params, mat, iu, ii, batch_size=4096, bu=2048, bi=2048,
        collision_norm=True, schedule="diag", pad_k=128))


if __name__ == "__main__":
    main()
