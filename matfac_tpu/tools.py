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
