"""Bucket-RMSE analysis at the reference's 10k-user protocol on-chip
(predSampUsersRMSEFreqPar, topBucketComp.cpp:3883 — VERDICT r1 #5).

sample_top_n_analysis with freq + svd + PPR scorers at 100k x 20k,
10k sampled users. Round 1 would have issued ~10^5 tunneled device
dispatches; the batched path should finish in minutes.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_bucket_protocol.py > /tmp/tpu_bucket.log 2>&1 &
"""

import time

import numpy as np


def main():
    import jax

    from matfac_tpu.analysis.drivers import sample_top_n_analysis
    from matfac_tpu.config import Params
    from matfac_tpu.data.csr import RatingMatrix
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.eval.metrics import Evaluator
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.ops.ppr import PPREngine
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items, k = 100_000, 20_000, 64
    mat, tu, ti = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                   seed=0, noise=0.1, power_law=0.6,
                                   nonneg=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    print(f"nnz={mat.nnz}", flush=True)

    params = Params(fac_dim=k, seed=0)
    model = ModelMF(params, n_users, n_items)
    st = init_state(params, n_users, n_items)
    full_view = model.eval_view(st)
    # "orig" = the generating low-rank model (ground truth)
    import jax.numpy as jnp

    from matfac_tpu.models.base import EvalView
    pad = lambda a, n: np.pad(a, ((0, n - len(a)), (0, 0)))
    orig_view = EvalView(jnp.asarray(pad(tu, n_users), jnp.float32),
                         jnp.asarray(pad(ti, n_items), jnp.float32),
                         jnp.zeros(n_users), jnp.zeros(n_items),
                         jnp.float32(0))

    class _D:
        pass

    _D.train_mat, _D.test_mat, _D.val_mat = mat, mat, None
    _D.n_users, _D.n_items = n_users, n_items
    ev = Evaluator(_D, iu, ii, params)

    # synthetic item graph: top-32 random neighbors per item
    rng = np.random.default_rng(5)
    gr = np.repeat(np.arange(n_items), 32)
    gc = rng.integers(0, n_items, n_items * 32)
    gv = rng.random(n_items * 32).astype(np.float32)
    graph = RatingMatrix.from_coo(gr, gc, gv, n_items, n_items)
    ppr = PPREngine(graph)

    t0 = time.time()
    rep = sample_top_n_analysis(full_view, orig_view, ev, _D, iu, ii,
                                svd_view=orig_view, ppr_engine=ppr,
                                n_users=10_000, n_buckets=10, seed=3)
    dt = time.time() - t0
    print(f"sample_top_n_analysis 10k users x 3 scorers: {dt:.1f}s",
          flush=True)
    for name, curve in rep["bucket_curves"].items():
        print(f"  {name}: {np.round(curve, 4)}", flush=True)


if __name__ == "__main__":
    main()
