"""Offline tooling — parity with the reference's ``python/`` scripts
(/root/reference/python/, 27 files; SURVEY.md §2 "python/ tooling").

Covered here:
  * convert_scipy_npz   — convert_scipy_sparse_to_text_csr.py
  * to_snap_graph       — toSNAPGraph.py (edge-list export)
  * average_log_values  — avgLines.py / avgModelsOp.py (average metric
                          lines across seed-replicated run logs)
  * parse_training_logs — analyzOpFiles.py (scrape epoch metric lines)
  * gen_sweep_jobs      — genSpJobs.py / genMultMethJobs.py (job-script
                          generation for hyperparameter sweeps; emits
                          plain shell lines instead of PBS)
  * compute_conf_bucket_rmse       — computeConf.py (vectorized)
  * quartile_rmse_from_predictions — computeTestQuartileRMSE.py
  * overlap_rep_factor /
    pairwise_overlap_stats         — compOverlapFreq.py
  * write_filtered_min_rating      — writeTestFiltMaxRat.py

The remaining scripts are trivial log/column mungers (avg*.py,
cumSum.py, averageCol.py, compcoldiff.py — one-line numpy ops over
whitespace files), plotting (plotProbRMSE.py), or are subsumed by
framework modules (compareGPRPPR.py -> analysis.drivers.compare_ppr_gpr,
pprItemBucketsRMSE.py -> analysis.confidence bucket curves,
toQMFTriplet.py -> io.write_triplets, extractDenseMat.py ->
csr.RatingMatrix.toarray, compTestCSRItemDist.py -> utils.freq).

Dataset converters (triplets/QMF: io.write_triplets; MovieLens:
data.movielens) and synthetic factors (genLatFacs: data.synthetic) live
in their subject modules.
"""

from __future__ import annotations

import itertools
import os
import re
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

from matfac_tpu.data.csr import RatingMatrix
from matfac_tpu.data.io import write_csr


def convert_scipy_npz(npz_path: str, out_path: str) -> RatingMatrix:
    """scipy.sparse .npz -> GKlib text CSR."""
    import scipy.sparse as sp
    m = sp.load_npz(npz_path).tocsr()
    mat = RatingMatrix(m.indptr.astype(np.int64),
                       m.indices.astype(np.int32),
                       m.data.astype(np.float32), m.shape[1])
    write_csr(mat, out_path)
    return mat


def to_snap_graph(mat: RatingMatrix, path: str,
                  directed: bool = False) -> None:
    """Adjacency -> SNAP edge list (``src dst`` per line)."""
    r, c, _ = mat.to_coo()
    with open(path, "w") as f:
        f.write(f"# Nodes: {max(mat.nrows, mat.ncols)} "
                f"Edges: {mat.nnz}\n")
        for a, b in zip(r, c):
            f.write(f"{a} {b}\n")
            if not directed:
                f.write(f"{b} {a}\n")


_METRIC_RE = re.compile(
    r"epoch (\d+): (?:obj ([\d.eE+-]+) val_rmse ([\d.eE+-]+)"
    r"|HR ([\d.eE+-]+))")


def parse_training_logs(text: str) -> List[Dict[str, float]]:
    """Scrape this framework's epoch log lines into records."""
    out = []
    for m in _METRIC_RE.finditer(text):
        rec: Dict[str, float] = {"epoch": float(m.group(1))}
        if m.group(2) is not None:
            rec["objective"] = float(m.group(2))
            rec["val_rmse"] = float(m.group(3))
        else:
            rec["hr"] = float(m.group(4))
        out.append(rec)
    return out


def average_log_values(paths: Sequence[str], key: str = "val_rmse"
                       ) -> float:
    """avgLines.py analog: mean of each run's FINAL value of ``key``."""
    finals = []
    for p in paths:
        with open(p) as f:
            recs = [r for r in parse_training_logs(f.read()) if key in r]
        if recs:
            finals.append(recs[-1][key])
    return float(np.mean(finals)) if finals else float("nan")


def gen_sweep_jobs(base_cmd: str, grid: Dict[str, Iterable],
                   out_dir: Optional[str] = None,
                   prefix: str = "job") -> List[str]:
    """genSpJobs/genMultMethJobs analog: cartesian hyperparameter sweep
    -> one shell command per combo (optionally written to
    ``out_dir/{prefix}_N.sh``)."""
    keys = list(grid)
    cmds = []
    for combo in itertools.product(*(grid[k] for k in keys)):
        flags = " ".join(f"--{k} {v}" for k, v in zip(keys, combo))
        cmds.append(f"{base_cmd} {flags}")
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        for i, cmd in enumerate(cmds):
            with open(os.path.join(out_dir, f"{prefix}_{i}.sh"),
                      "w") as f:
                f.write("#!/bin/sh\n" + cmd + "\n")
    return cmds


# ----------------------------------------------------------------------
# round-2 ports of the non-trivial remaining python/ scripts
# ----------------------------------------------------------------------

def compute_conf_bucket_rmse(u_facs: Sequence[np.ndarray],
                             i_facs: Sequence[np.ndarray],
                             u_fac: np.ndarray, i_fac: np.ndarray,
                             orig_u: np.ndarray, orig_i: np.ndarray,
                             n_buckets: int = 10) -> np.ndarray:
    """computeConf.py::computeConfBuckRMSEFrmModels analog
    (/root/reference/python/computeConf.py:66-102), vectorized.

    Ensemble confidence per (u, i) = 1/std of the predictions across the
    model pairs in ``u_facs``/``i_facs`` (-1 where std == 0, matching
    computeConf :4-15); items are bucketed per user by decreasing
    confidence and each bucket's pred-vs-ground-truth RMSE is returned
    ([n_buckets])."""
    import jax.numpy as jnp

    n_users, n_items = u_fac.shape[0], i_fac.shape[0]
    preds = jnp.stack([jnp.asarray(uf) @ jnp.asarray(vf).T
                       for uf, vf in zip(u_facs, i_facs)])  # [M,U,I]
    std = jnp.std(preds, axis=0)
    conf = jnp.where(std != 0, 1.0 / jnp.where(std != 0, std, 1.0), -1.0)
    order = jnp.argsort(-conf, axis=1, stable=True)         # [U,I]
    est = jnp.asarray(u_fac) @ jnp.asarray(i_fac).T
    tru = jnp.asarray(orig_u) @ jnp.asarray(orig_i).T
    se = jnp.take_along_axis((est - tru) ** 2, order, axis=1)
    per = n_items // n_buckets
    out = np.zeros(n_buckets)
    se = np.asarray(se)
    for b in range(n_buckets):
        s = b * per
        e = n_items if b == n_buckets - 1 else min((b + 1) * per,
                                                   n_items)
        out[b] = np.sqrt(se[:, s:e].mean()) if e > s else np.nan
    return out


def quartile_rmse_from_predictions(pred_rows: Sequence,
                                   u_part: Dict[int, int],
                                   i_part: Dict[int, int],
                                   val_lookup) -> Dict[str, object]:
    """computeTestQuartileRMSE.py analog
    (/root/reference/python/computeTestQuartileRMSE.py:28-78): given
    (user, item, predRating) rows, per-partition RMSEs against the
    values from ``val_lookup(u, i)``. Rows whose user or item has no
    partition are counted as missing."""
    from collections import defaultdict
    u_sq = defaultdict(float); u_ct = defaultdict(float)
    i_sq = defaultdict(float); i_ct = defaultdict(float)
    all_sq = 0.0; all_ct = 0.0; missing = 0
    for user, item, pred in pred_rows:
        user, item = int(user), int(item)
        if user in u_part and item in i_part:
            d = float(val_lookup(user, item)) - float(pred)
            u_sq[u_part[user]] += d * d; u_ct[u_part[user]] += 1
            i_sq[i_part[item]] += d * d; i_ct[i_part[item]] += 1
            all_sq += d * d; all_ct += 1
        else:
            missing += 1
    return {
        "all_rmse": float(np.sqrt(all_sq / all_ct)) if all_ct else
        float("nan"),
        "missing": missing,
        "user_part_rmse": {p: float(np.sqrt(u_sq[p] / c))
                           for p, c in u_ct.items()},
        "item_part_rmse": {p: float(np.sqrt(i_sq[p] / c))
                           for p, c in i_ct.items()},
    }


def overlap_rep_factor(set1: set, set2: set, pop_size: int
                       ) -> Dict[str, float]:
    """compOverlapFreq.py::getRepFacNProb analog
    (/root/reference/python/compOverlapFreq.py:6-21): representation
    factor (observed/expected overlap of two sets drawn from a
    population) and the hypergeometric tail probability of seeing that
    much or more overlap by chance."""
    from scipy import stats
    ov = len(set1 & set2)
    expected = len(set1) * len(set2) / pop_size
    rep = ov / expected if expected > 0 else float("nan")
    prob = float(stats.hypergeom.sf(ov + 1, pop_size, len(set1),
                                    len(set2)))
    return {"overlap": ov, "expected": expected, "rep_factor": rep,
            "prob": prob}


def pairwise_overlap_stats(item_sets: Sequence[set], pop_size: int
                           ) -> Dict[str, float]:
    """compOverlapFreq.py::compOverlapPc/compOverlapStats analogs
    (:84-131): mean pairwise overlap fraction + mean representation
    factor across all set pairs."""
    n = len(item_sets)
    pw, pw_ct = 0.0, 0
    reps, probs = [], []
    inter = set(item_sets[0]) if item_sets else set()
    for i in range(n):
        inter &= item_sets[i]
        for j in range(i + 1, n):
            s1, s2 = item_sets[i], item_sets[j]
            if s1 and s2:
                ov = len(s1 & s2)
                pw += ov / len(s1) + ov / len(s2)
                pw_ct += 2
                r = overlap_rep_factor(s1, s2, pop_size)
                reps.append(r["rep_factor"]); probs.append(r["prob"])
    return {
        "mean_pairwise_pc": pw / pw_ct if pw_ct else float("nan"),
        "all_intersection": len(inter),
        "mean_rep_factor": float(np.mean(reps)) if reps else float("nan"),
        "mean_prob": float(np.mean(probs)) if probs else float("nan"),
    }


def write_filtered_min_rating(mat: RatingMatrix, out_path: str,
                              min_rating: float = 5.0,
                              head_items: Optional[set] = None
                              ) -> int:
    """writeTestFiltMaxRat.py analog
    (/root/reference/python/writeTestFiltMaxRat.py:3-17): keep only
    entries with rating >= min_rating whose item is not a head item;
    writes GKlib text CSR (same row count), returns ratings kept."""
    head_items = head_items or set()
    kept = 0
    with open(out_path, "w") as g:
        for u in range(mat.nrows):
            cols, vals = mat.row(u)
            parts = []
            for i, v in zip(cols, vals):
                if int(i) in head_items or v < min_rating:
                    continue
                parts.append(f"{int(i)} {v:g}")
                kept += 1
            g.write(" ".join(parts) + "\n")
    return kept
