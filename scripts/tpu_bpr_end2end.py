"""End-to-end BPR training at bench scale on-chip: TrainLoopHR with the
round-2 rankgap sampler + tile-exact HR selection.

100k users x 20k items, ~9.9M positives, k=64. Leave-one-out val/test:
one held-out item per user. Records HR trajectory and wall-clock
(epoch + HR eval per iteration) — the combined evidence for PERF.md's
BPR and top-k rows.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_bpr_end2end.py > /tmp/tpu_bpr_e2e.log 2>&1 &
"""

import time

import numpy as np


def main():
    import jax

    from matfac_tpu.config import Params
    from matfac_tpu.data.csr import RatingMatrix
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.eval.ranking import CatalogScorer
    from matfac_tpu.models.base import init_state
    from matfac_tpu.models.bpr import ModelMFBPR
    from matfac_tpu.solvers.bpr import BPRSolver
    from matfac_tpu.train.loop import TrainLoopHR
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items, k = 100_000, 20_000, 64
    full, uf, if_ = low_rank_ratings(n_users, n_items, k=8,
                                     density=0.0055, seed=0, noise=0.05,
                                     power_law=0.6, nonneg=True)
    # leave-one-out split: hold out one RANDOM positive per row for val
    # and another for test (id-position splits are popularity-biased:
    # CSR rows are sorted by item id and synthetic popularity follows
    # id rank, so "last entry" = rarest item — HR would sit at 0)
    r, c, v = full.to_coo()
    ip = full.indptr
    deg = np.diff(ip)
    rng = np.random.default_rng(42)
    hold_val = np.zeros(full.nnz, bool)
    hold_test = np.zeros(full.nnz, bool)
    rows3 = np.nonzero(deg >= 3)[0]
    pick = rng.random((len(rows3), 2))
    val_e = ip[rows3] + (pick[:, 0] * deg[rows3]).astype(np.int64)
    test_off = (pick[:, 1] * (deg[rows3] - 1)).astype(np.int64)
    test_e = ip[rows3] + np.where(test_off >= val_e - ip[rows3],
                                  test_off + 1, test_off)
    hold_val[val_e] = True
    hold_test[test_e] = True
    keep = ~hold_val & ~hold_test
    train = RatingMatrix.from_coo(r[keep], c[keep], v[keep],
                                  n_users, n_items)
    val = RatingMatrix.from_coo(r[hold_val], c[hold_val], v[hold_val],
                                n_users, n_items)
    test = RatingMatrix.from_coo(r[hold_test], c[hold_test],
                                 v[hold_test], n_users, n_items)
    print(f"train nnz={train.nnz} val={val.nnz} test={test.nnz}",
          flush=True)

    iu, ii = freq.invalid_users_items(train, n_users, n_items)
    params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001, learn_rate=0.1,
                    max_iter=60, seed=0, batch_size=65_536, disp_iter=5,
                    obj_iter=1, bpr_sampler="rankgap", n_negatives=2)
    model = ModelMFBPR(params, n_users, n_items)
    solver = BPRSolver(model, params, train, iu, ii, n_tries=2)
    scorer = CatalogScorer(train, iu, ii, n_users, n_items,
                           user_block=4096, item_block=32768)
    loop = TrainLoopHR(model, solver, scorer, val, params,
                       log_fn=lambda s: print(s, flush=True))
    t0 = time.time()
    rep = loop.run(init_state(params, n_users, n_items))
    wall = time.time() - t0
    print(f"wall={wall:.1f}s for {params.max_iter} epochs "
          f"({wall/params.max_iter*1000:.0f} ms/iter incl. HR eval)",
          flush=True)
    print(f"best val HR@10: {rep.best_metric:.4f} "
          f"(random ~ {10/(n_items - train.nnz/n_users):.4f})",
          flush=True)
    test_hr = scorer.hit_rate(model.eval_view(rep.best_state), test, 10)
    print(f"test HR@10: {test_hr:.4f}", flush=True)


if __name__ == "__main__":
    main()
