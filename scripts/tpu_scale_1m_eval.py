"""1M-user scale, part 2: full-catalog HR@10 eval and BPR training at
1M users x 100k items (~100M ratings) on one chip — completes the
scale story of scripts/tpu_scale_1m.py (ALS/SGD engines).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_scale_1m_eval.py > /tmp/tpu_1m_eval.log 2>&1 &
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from matfac_tpu.config import Params
    from matfac_tpu.data.csr import RatingMatrix
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.eval.ranking import CatalogScorer
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.models.bpr import ModelMFBPR
    from matfac_tpu.solvers.bpr import BPRSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items, k = 1_000_000, 100_000, 64
    t0 = time.time()
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.001,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    print(f"gen: {time.time()-t0:.0f}s nnz={mat.nnz}", flush=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                    learn_rate=0.01, seed=0, batch_size=262_144)

    # ---- full-catalog HR@10 eval ----
    try:
        t0 = time.time()
        scorer = CatalogScorer(mat, iu, ii, n_users, n_items,
                               user_block=4096, item_block=32768)
        print(f"scorer staged in {time.time()-t0:.0f}s "
              f"(coo={scorer._use_coo})", flush=True)
        model = ModelMF(params, n_users, n_items)
        view = model.eval_view(init_state(params, n_users, n_items))
        rng = np.random.default_rng(1)
        loo = RatingMatrix.from_coo(
            np.arange(n_users, dtype=np.int64),
            rng.integers(0, n_items, n_users),
            np.ones(n_users, np.float32), n_users, n_items)
        t0 = time.time()
        hr = scorer.hit_rate(view, loo, 10)
        c = time.time() - t0
        times = []
        for _ in range(2):
            t0 = time.time()
            hr = scorer.hit_rate(view, loo, 10)
            times.append(time.time() - t0)
        print(f"HR@10 eval 1M x 100k: compile+first={c:.1f}s "
              f"warm={min(times):.2f}s (hr={hr:.5f})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"HR FAIL: {type(e).__name__}: {str(e)[:400]}", flush=True)

    # ---- BPR rankgap training epoch ----
    try:
        t0 = time.time()
        bmodel = ModelMFBPR(params, n_users, n_items)
        s = BPRSolver(bmodel, params, mat, iu, ii, n_tries=2,
                      sampler="rankgap")
        print(f"BPR staged in {time.time()-t0:.0f}s "
              f"(positives={s.n_pos})", flush=True)
        st = init_state(params, n_users, n_items)
        key = jax.random.PRNGKey(0)
        key, ek = jax.random.split(key)
        t0 = time.time()
        st = s.epoch(st, 0.01, ek)
        _ = float(jnp.sum(st.u_fac[0]))
        c = time.time() - t0
        times = []
        for _ in range(2):
            key, ek = jax.random.split(key)
            t0 = time.time()
            st = s.epoch(st, 0.01, ek)
            _ = float(jnp.sum(st.u_fac[0]))
            times.append(time.time() - t0)
        dt = min(times)
        print(f"BPR rankgap 1M x 100k: compile={c:.1f}s "
              f"epoch={dt:.2f}s rate={s.n_pos/dt/1e6:.1f}M pairs/s",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"BPR FAIL: {type(e).__name__}: {str(e)[:400]}",
              flush=True)


if __name__ == "__main__":
    main()
