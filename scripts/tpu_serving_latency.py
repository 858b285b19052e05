"""Serving latency: warm per-query recommend() percentiles over the
tunneled chip (Recommender, serving.py) at the bench catalog shape.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_serving_latency.py > /tmp/tpu_serving.log 2>&1 &
"""

import time

import numpy as np


def main():
    import jax

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.serving import Recommender
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items, k = 100_000, 20_000, 64
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    params = Params(fac_dim=k, seed=0)
    model = ModelMF(params, n_users, n_items)
    view = model.eval_view(init_state(params, n_users, n_items))
    rec = Recommender(view, mat, n_users, n_items, iu, ii,
                      user_block=256)

    rng = np.random.default_rng(0)
    # warm the block scorer on a few blocks
    rec.recommend([0], n=10)
    lat = []
    for _ in range(100):
        u = int(rng.integers(0, n_users))
        t0 = time.time()
        rec.recommend([u], n=10)
        lat.append(time.time() - t0)
    lat = np.sort(np.array(lat) * 1000)
    print(f"single-user recommend over tunnel: p50={lat[50]:.1f}ms "
          f"p95={lat[95]:.1f}ms p99={lat[99]:.1f}ms", flush=True)

    # batched queries (256 scattered users); warm the 256-pad-bucket
    # compile first so the mean is steady-state
    rec.recommend(list(rng.integers(0, n_users, 256)), n=10)
    t0 = time.time()
    for _ in range(10):
        us = rng.integers(0, n_users, 256)
        rec.recommend(list(us), n=10)
    print(f"256-user batch: {(time.time()-t0)/10*1000:.0f}ms/batch "
          f"(warm)", flush=True)


if __name__ == "__main__":
    main()
