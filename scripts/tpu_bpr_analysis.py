"""On-chip BPR throughput + batched analysis timing (VERDICT r1 #5/#7).

Stage 1: BPR stream epoch at 100k x 20k / ~9.9M positives, k=64, with
the round-2 sampler budget (2 tries) vs the round-1 budget (8) —
target >= 15M pairs/s.
Stage 2: batched topNRec (analysis.topn) with 10k sampled users x 1000
negatives — target: minutes, not hours (round 1 was one dispatch per
test item).

Run: nohup python scripts/tpu_bpr_analysis.py > /tmp/tpu_bpr.log 2>&1 &
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.models.bpr import ModelMFBPR
    from matfac_tpu.solvers.bpr import BPRSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items, k = 100_000, 20_000, 64
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    print(f"nnz={mat.nnz}", flush=True)

    for sampler, n_tries in (("rankgap", 2), ("rankgap", 1),
                             ("rankgap", 3)):
        params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                        learn_rate=0.01, seed=0, batch_size=65_536)
        model = ModelMFBPR(params, n_users, n_items)
        s = BPRSolver(model, params, mat, iu, ii, n_tries=n_tries,
                      sampler=sampler)
        st = init_state(params, n_users, n_items)
        key = jax.random.PRNGKey(0)
        key, ek = jax.random.split(key)
        t0 = time.time()
        st = s.epoch(st, 0.01, ek)
        _ = float(jnp.sum(st.u_fac[0]))
        c = time.time() - t0
        times = []
        for _ in range(3):
            key, ek = jax.random.split(key)
            t0 = time.time()
            st = s.epoch(st, 0.01, ek)
            _ = float(jnp.sum(st.u_fac[0]))
            times.append(time.time() - t0)
        dt = min(times)
        print(f"BPR {sampler} tries={n_tries}: compile={c:.1f}s "
              f"epoch={dt*1000:.0f}ms rate={s.n_pos/dt/1e6:.1f}M "
              f"pairs/s", flush=True)

    import os
    if os.environ.get("SKIP_TOPN"):
        return
    # ---- stage 2: batched topNRec at the reference protocol scale ----
    from matfac_tpu.analysis.topn import top_n_rec

    params = Params(fac_dim=k, seed=0)
    model = ModelMF(params, n_users, n_items)
    st = init_state(params, n_users, n_items)
    view = model.eval_view(st)
    # test set: one held-out item per user (leave-one-out shape)
    rng = np.random.default_rng(1)
    from matfac_tpu.data.csr import RatingMatrix
    tr = rng.integers(0, n_users, n_users)
    tc = rng.integers(0, n_items, n_users)
    test = RatingMatrix.from_coo(tr, tc, np.ones(n_users, np.float32),
                                 n_users, n_items)
    t0 = time.time()
    rep = top_n_rec(view, mat, test, iu, ii, n=10, n_samp_users=10_000,
                    n_negatives=1000, seed=3)
    dt = time.time() - t0
    print(f"topNRec 10k users x 1000 negs: {dt:.1f}s "
          f"({rep.n_test_items} pairs) recall={rep.recall}", flush=True)


if __name__ == "__main__":
    main()
