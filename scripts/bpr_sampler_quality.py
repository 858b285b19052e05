"""BPR sampler quality parity: rankgap vs literal gap sampler through
the full HR-selected training loop at the ML-100K shape.

The rankgap sampler deviates from the literal one only in the
cross-gap mixture when gaps contain never-rated items (README
deviation #11); this run shows the end metric (best val HR@10 /
test HR@10) is statistically equivalent.

Usage: PYTHONPATH=. python scripts/bpr_sampler_quality.py [--cpu]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--maxiter", type=int, default=40)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import leave_one_out_data
    from matfac_tpu.train.loop import train_model

    data = leave_one_out_data(n_users=943, n_items=1682, per_user=50,
                              seed=4, structured=True)
    print(f"config: {data}")

    for sampler in ("rankgap", "gap"):
        for seed in (1, 2, 3):
            p = Params(fac_dim=16, u_reg=0.002, i_reg=0.002,
                       learn_rate=0.2, max_iter=args.maxiter, seed=seed,
                       batch_size=8192, disp_iter=10 ** 6,
                       bpr_sampler=sampler, n_negatives=2)
            t0 = time.time()
            rep, model, scorer, _ = train_model(data, p, algo="bpr",
                                                log_fn=lambda s: None)
            test_hr = scorer.hit_rate(
                model.eval_view(rep.best_state), data.test_mat, 10)
            print(f"{sampler:8s} seed={seed} "
                  f"val HR@10={rep.best_metric:.4f} "
                  f"test HR@10={test_hr:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
