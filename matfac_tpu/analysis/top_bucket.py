"""Per-user item-scoring comparisons and top-bucket RMSE curves.

TPU-native analog of /root/reference/topBucketComp.cpp: several ways to
score a user's candidate items —

  * model:     predicted rating (itemPredScores, :468)
  * optimal:   ground-truth model's rating (itemOptScores, :441)
  * frequency: global item frequency (itemFreqScores, :550)
  * svd:       scores from an SVD factorization (itemSVDScores, :403)
  * ppr:       personalized PageRank restarted on the user's rated
               items weighted by rating (itemGraphItemScores, :348-400)

— plus score-fusion ops (average / product / log-sum, :192-345) and the
sliding-window RMSE-vs-rank curves written by writeTopBuckRMSEs
(:4684): order a user's candidate items by one score, then report the
pred-vs-orig RMSE of each successive bucket of the ranking.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax.numpy as jnp
import numpy as np

from matfac_tpu.data.csr import RatingMatrix
from matfac_tpu.eval.metrics import predict_pairs
from matfac_tpu.models.base import EvalView


def item_pred_scores(view: EvalView, user: int, items: np.ndarray
                     ) -> np.ndarray:
    r = jnp.full(len(items), user, jnp.int32)
    c = jnp.asarray(items.astype(np.int32))
    return np.asarray(predict_pairs(view, r, c))


def item_freq_scores(train_mat: RatingMatrix, items: np.ndarray
                     ) -> np.ndarray:
    return train_mat.col_degrees()[items].astype(np.float64)


def fuse_scores(scores: Sequence[np.ndarray], how: str = "avg"
                ) -> np.ndarray:
    """Score fusion (topBucketComp.cpp:192-345). Each score vector is
    first normalized to sum 1 (the reference normalizes PPR-like
    distributions)."""
    norm = []
    for s in scores:
        t = s.sum()
        norm.append(s / t if t > 0 else s)
    norm = np.stack(norm)
    if how == "avg":
        return norm.mean(axis=0)
    if how == "prod":
        return norm.prod(axis=0)
    if how == "logsum":
        with np.errstate(divide="ignore"):
            return np.where(norm > 0, np.log(norm), -np.inf).sum(axis=0)
    raise ValueError(how)


def top_bucket_rmse_curve(orig_view: EvalView, full_view: EvalView,
                          user: int, items: np.ndarray,
                          scores: np.ndarray, n_buckets: int = 10
                          ) -> np.ndarray:
    """RMSE of pred vs ground truth over successive buckets of the
    user's score-ranked candidate items."""
    order = items[np.argsort(-scores, kind="stable")]
    r = jnp.full(len(order), user, jnp.int32)
    c = jnp.asarray(order.astype(np.int32))
    a = np.asarray(predict_pairs(orig_view, r, c))
    p = np.asarray(predict_pairs(full_view, r, c))
    d2 = (a - p) ** 2
    per = max(len(order) // n_buckets, 1)
    out = np.zeros(n_buckets)
    for b in range(n_buckets):
        s = b * per
        e = len(order) if b == n_buckets - 1 else min((b + 1) * per,
                                                      len(order))
        out[b] = np.sqrt(d2[s:e].mean()) if e > s else np.nan
    return out


def pred_samp_users_rmse(orig_view: EvalView, full_view: EvalView,
                         train_mat: RatingMatrix,
                         invalid_users: np.ndarray,
                         invalid_items: np.ndarray,
                         scorers: Dict[str, Callable[[int, np.ndarray],
                                                     np.ndarray]],
                         n_users: int = 1000, n_buckets: int = 10,
                         seed: int = 1) -> Dict[str, np.ndarray]:
    """predSampUsersRMSEFreqPar / ...ProbPar analog
    (topBucketComp.cpp:2669, :3883): sample users, average each scorer's
    top-bucket RMSE curve over them. ``scorers`` maps name ->
    fn(user, candidate_items) -> scores."""
    rng = np.random.default_rng(seed)
    cand_mask = ~invalid_items[:train_mat.ncols]
    elig = np.nonzero(~invalid_users[:train_mat.nrows])[0]
    users = (rng.choice(elig, n_users, replace=False)
             if len(elig) > n_users else elig)
    curves = {k: np.zeros(n_buckets) for k in scorers}
    counts = {k: 0 for k in scorers}
    for u in users:
        u = int(u)
        rated = train_mat.row(u)[0]
        items = np.nonzero(cand_mask)[0]
        items = np.setdiff1d(items, rated, assume_unique=False)
        if len(items) < n_buckets:
            continue
        for name, fn in scorers.items():
            sc = fn(u, items)
            curve = top_bucket_rmse_curve(orig_view, full_view, u, items,
                                          sc, n_buckets)
            if np.isfinite(curve).all():
                curves[name] += curve
                counts[name] += 1
    return {k: curves[k] / max(counts[k], 1) for k in scorers}
