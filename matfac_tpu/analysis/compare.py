"""Multi-model agreement analysis.

Analog of /root/reference/analyzeModels.cpp (compJaccSimAccu :4 and
friends): load several trained factor sets, compare per-item prediction
accuracy and cross-model consistency (mean/variance of predictions per
pair), and correlate per-item agreement with item-item Jaccard
similarity structure.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from matfac_tpu.data.csr import RatingMatrix
from matfac_tpu.eval.metrics import predict_pairs
from matfac_tpu.models.base import EvalView
from matfac_tpu.utils.freq import pearson_corr


def model_agreement(views: Sequence[EvalView], test_mat: RatingMatrix,
                    invalid_users: np.ndarray, invalid_items: np.ndarray
                    ) -> Dict[str, np.ndarray]:
    """Per-item statistics over test entries:

      * rmse_per_model [M, n_items]  — each model's per-item test RMSE
      * pred_mean / pred_var [nnz]   — ensemble mean/variance per pair
      * item_disagreement [n_items]  — mean cross-model pred variance
    """
    r, c, v = test_mat.to_coo()
    keep = ~invalid_users[r] & ~invalid_items[c]
    r, c, v = r[keep], c[keep], v[keep]
    rj = jnp.asarray(r.astype(np.int32))
    cj = jnp.asarray(c.astype(np.int32))
    preds = np.stack([np.asarray(predict_pairs(vw, rj, cj))
                      for vw in views])          # [M, nnz]
    M = len(views)
    n_items = test_mat.ncols
    sq = (preds - v[None, :]) ** 2
    rmse_pm = np.full((M, n_items), np.nan)
    counts = np.bincount(c, minlength=n_items).astype(np.float64)
    for m in range(M):
        ssum = np.bincount(c, weights=sq[m], minlength=n_items)
        with np.errstate(invalid="ignore", divide="ignore"):
            rmse_pm[m] = np.sqrt(ssum / counts)
    var = preds.var(axis=0)
    disagree = np.bincount(c, weights=var, minlength=n_items)
    with np.errstate(invalid="ignore", divide="ignore"):
        disagree = disagree / counts
    return {"rmse_per_model": rmse_pm,
            "pred_mean": preds.mean(axis=0),
            "pred_var": var,
            "item_disagreement": disagree,
            "item_counts": counts}


def jaccard_accuracy_correlation(agreement: Dict[str, np.ndarray],
                                 jacc_graph: RatingMatrix) -> float:
    """compJaccSimAccu essence: correlation between an item's mean
    Jaccard similarity to its graph neighbors and its ensemble
    agreement (negative variance)."""
    n_items = jacc_graph.nrows
    deg = jacc_graph.row_degrees()
    sim_sum = np.zeros(n_items)
    rr, cc, vv = jacc_graph.to_coo()
    np.add.at(sim_sum, rr, vv)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_sim = np.where(deg > 0, sim_sum / np.maximum(deg, 1), 0.0)
    dis = agreement["item_disagreement"][:n_items]
    ok = np.isfinite(dis) & (agreement["item_counts"][:n_items] > 0)
    return pearson_corr(mean_sim[ok], -dis[ok])
