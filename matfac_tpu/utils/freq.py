"""Frequency / validity / rank-map helpers.

TPU-native analog of the reference utility layer
(/root/reference/util.cpp): row/col frequencies (getRowColFreq,
util.cpp:555), invalid-entity detection (getInvalidUsersItems,
util.cpp:511-544), head-item extraction (getHeadItems, util.cpp:4-34),
and the frequency quartile / percentile rank maps the driver builds
(main.cpp:1109-1201). Everything returns dense numpy arrays so it can be
shipped to device as masks/tables.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from matfac_tpu.data.csr import RatingMatrix


def row_col_freq(mat: RatingMatrix) -> Tuple[np.ndarray, np.ndarray]:
    """Ratings-count per user / item (getRowColFreq, util.cpp:555)."""
    return (mat.row_degrees().astype(np.float64),
            mat.col_degrees().astype(np.float64))


def invalid_users_items(mat: RatingMatrix, n_users: int, n_items: int
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Boolean invalid masks over [n_users], [n_items].

    Semantics of getInvalidUsersItems (util.cpp:511-544) plus the
    out-of-range extension every trainer applies (e.g. modelMF.cpp:40-45):
    users/items with zero train ratings are invalid, as are indices >=
    the train matrix's dimensions up to the global n_users/n_items.
    """
    u_bad = np.ones(n_users, dtype=bool)
    i_bad = np.ones(n_items, dtype=bool)
    deg_u = mat.row_degrees()
    deg_i = mat.col_degrees()
    nr = min(mat.nrows, n_users)
    nc = min(mat.ncols, n_items)
    u_bad[:nr] = deg_u[:nr] == 0
    i_bad[:nc] = deg_i[:nc] == 0
    return u_bad, i_bad


def head_items(mat: RatingMatrix, head_pc: float) -> np.ndarray:
    """Items covering ``head_pc`` of total rating mass, most-rated first
    (getHeadItems, util.cpp:4-34). Returns a boolean mask [n_items]."""
    freq = mat.col_degrees().astype(np.float64)
    order = np.argsort(-freq, kind="stable")
    csum = np.cumsum(freq[order])
    total = csum[-1] if len(csum) else 0.0
    cutoff = np.searchsorted(csum, head_pc * total) + 1
    mask = np.zeros(mat.ncols, dtype=bool)
    mask[order[:cutoff]] = True
    return mask


def quartile_assignments(freq: np.ndarray, valid: np.ndarray,
                         n_quantiles: int = 4) -> np.ndarray:
    """Frequency-quantile id per entity, -1 for invalid.

    Analog of getUserItemRankMap / setAdapRank (main.cpp:1109-1168):
    valid entities sorted by ascending frequency are split into
    ``n_quantiles`` equal-count buckets; bucket 0 = least frequent (tail).
    """
    out = np.full(len(freq), -1, dtype=np.int32)
    idx = np.nonzero(valid)[0]
    if len(idx) == 0:
        return out
    order = idx[np.argsort(freq[idx], kind="stable")]
    n = len(order)
    per = max(n // n_quantiles, 1)
    for q in range(n_quantiles):
        s = q * per
        e = (q + 1) * per if q < n_quantiles - 1 else n
        out[order[s:e]] = q
    return out


def percentile_rank_map(freq: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Percentile-in-[0,1] of each entity's frequency among valid entities
    (getUserItemRankMapPc analog, main.cpp:1170-1201); invalid → 0."""
    out = np.zeros(len(freq), dtype=np.float64)
    idx = np.nonzero(valid)[0]
    if len(idx) == 0:
        return out
    order = np.argsort(freq[idx], kind="stable")
    ranks = np.empty(len(idx), dtype=np.float64)
    ranks[order] = np.arange(1, len(idx) + 1)
    out[idx] = ranks / len(idx)
    return out


def freq_scale_stats(user_freq: np.ndarray, item_freq: np.ndarray
                     ) -> Tuple[float, float, float, float]:
    """(min, max, mean, std) over concat(userFreq, itemFreq) — the TMF
    z-scoring constants (modelDropoutSigmoid.h:38-150 ctor)."""
    concat = np.concatenate([user_freq, item_freq]).astype(np.float64)
    return (float(concat.min()), float(concat.max()),
            float(concat.mean()), float(concat.std()))


def pearson_corr(a: np.ndarray, b: np.ndarray) -> float:
    """util.cpp pearsonCorr analog."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if len(a) < 2:
        return 0.0
    sa, sb = a.std(), b.std()
    if sa == 0 or sb == 0:
        return 0.0
    return float(((a - a.mean()) * (b - b.mean())).mean() / (sa * sb))
