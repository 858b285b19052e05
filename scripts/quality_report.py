"""Solver quality comparison on an ML-100K-shaped synthetic problem.

Runs every pointwise solver through the real training loop on the same
943x1682 / ~100k-rating config (the reference's PR1 shape, BASELINE.md)
and reports best validation / test RMSE and epochs to best — the
cross-solver parity evidence the reference could only gather manually
across binaries.

Usage: PYTHONPATH=. python scripts/quality_report.py [--cpu]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--maxiter", type=int, default=60)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import synthetic_data
    from matfac_tpu.train.loop import train_model

    data, uf, vf = synthetic_data(
        n_users=943, n_items=1682, k=8, density=0.063, seed=100,
        noise=0.1, power_law=0.6, nonneg=True, test_pc=0.1, val_pc=0.1)
    print(f"config: {data} (ML-100K shape)")

    # iterative first-order solvers need more epochs than the
    # closed-form sweeps to reach the same floor
    configs = [
        # SGD regs are per-occurrence (effective lambda = freq*reg) —
        # 0.005 here corresponds to the coordinate solvers' 0.05; see
        # scripts/sgd_parity.py
        ("sgd", 5, dict(learn_rate=0.1, batch_size=2048, u_reg=0.005,
                        i_reg=0.005)),
        ("sgdparsvd", 5, dict(learn_rate=0.05, batch_size=2048,
                              u_reg=0.1, i_reg=1.0)),
        ("als", 1, dict(u_reg=0.05, i_reg=0.05)),
        ("ialspp", 1, dict(u_reg=0.05, i_reg=0.05)),
        ("alsdense", 1, dict(u_reg=0.05, i_reg=0.05)),
        ("ccd++", 1, dict(u_reg=0.05, i_reg=0.05)),
        ("ccd++g5", 1, dict(u_reg=0.05, i_reg=0.05,
                            ccd_group_dims=5)),
        ("ccd", 5, dict(u_reg=0.05, i_reg=0.05)),
        # row-dense engine (the perf headline) at the quality grid
        ("densesgd", 5, dict(learn_rate=0.1, u_reg=0.005,
                             i_reg=0.005)),
    ]
    rows = []
    for method, iter_mult, kw in configs:
        p = Params(fac_dim=10, max_iter=args.maxiter * iter_mult, seed=1,
                   disp_iter=10 ** 6, **kw)
        t0 = time.time()
        mm = "ccd++" if method == "ccd++g5" else method
        rep, model, ev, _ = train_model(data, p, algo="mf",
                                        mf_method=mm,
                                        log_fn=lambda s: None)
        test = ev.rmse(model.eval_view(rep.best_state), "test")
        rows.append((method, rep.best_metric, test, rep.best_iter,
                     rep.stop_reason, time.time() - t0))
        print(f"{method:10s} best_val={rep.best_metric:.4f} "
              f"test={test:.4f} best_iter={rep.best_iter:3d} "
              f"stop={rep.stop_reason} ({rows[-1][5]:.1f}s)")

    vals = [r[1] for r in rows]
    spread = max(vals) - min(vals)
    print(f"\nval-RMSE spread across solvers: {spread:.4f} "
          f"(parity target: within run-to-run variance)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
