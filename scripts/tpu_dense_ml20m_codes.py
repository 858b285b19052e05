"""Row-dense SGD with int8 rating-code tiles at the ML-20M shape
(138k x 27k, ~19.7M ratings, star-quantized values), rank-64 and
rank-128 — VERDICT r4 #1: the 11.4 GiB bf16+int8 grid that failed
remote compile drops to ~3.6 GiB at 1 B/slot, inside the proven
single-chip envelope.

Also measures the full bench shape (100k x 20k, 9.9M nnz) with code
tiles vs the float-tile headline protocol, so PERF.md can record what
halving R+W traffic buys at the shape where the 404.8M record lives.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_dense_ml20m_codes.py > /tmp/tpu_ml20m_codes.log 2>&1 &
"""

import time

import numpy as np


def star_quantize(mat):
    """Snap ratings to the 0.5-star grid in [0.5, 5.0] (ML-20M's
    scale) — makes the data exactly int8-code representable."""
    q = np.clip(np.round(mat.values / 0.5), 1, 10) * 0.5
    mat.values[:] = q.astype(np.float32)
    return mat


def main():
    import jax
    import jax.numpy as jnp

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.solvers.block_sgd import BlockSGDSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)

    def force(st):
        return float(jnp.sum(st.u_fac[0]) + jnp.sum(st.i_fac[0]))

    def run(tag, mat, iu, ii, n_users, n_items, k, codes, epochs=3):
        params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                        learn_rate=0.005, seed=0)
        model = ModelMF(params, n_users, n_items)
        try:
            t0 = time.time()
            s = BlockSGDSolver(model, params, mat, iu, ii,
                               collision_norm=True, engine="dense",
                               bu=None, bi=None, dense_codes=codes,
                               dense_budget_bytes=12 << 30)
            stage = time.time() - t0
            mode = ("codes" if s.W_cells is None else "float")
            st = init_state(params, n_users, n_items)
            key = jax.random.PRNGKey(0)
            # 2-epoch warmup (donated-variant recompile, bench.py note)
            t0 = time.time()
            for _ in range(2):
                key, k1 = jax.random.split(key)
                st = s.epoch(st, 0.005, k1)
            force(st)
            c = time.time() - t0
            times = []
            for _ in range(epochs):
                key, k1 = jax.random.split(key)
                t0 = time.time()
                st = s.epoch(st, 0.005, k1)
                force(st)
                times.append(time.time() - t0)
            dt = min(times)
            print(f"{tag} k={k} mode={mode}: stage={stage:.1f}s "
                  f"compile+warm={c:.1f}s epoch={dt*1000:.1f}ms "
                  f"rate={s.nnz/dt/1e6:.1f}M ratings/s "
                  f"(all epochs: {[round(t*1000,1) for t in times]})",
                  flush=True)
            del s, st
        except Exception as e:  # noqa: BLE001
            print(f"{tag} k={k} codes={codes} FAIL: "
                  f"{type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)

    # --- ML-20M shape, star data, code tiles (the VERDICT ask)
    n_users, n_items = 138_000, 27_000
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8,
                                 density=20e6 / (n_users * n_items),
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    star_quantize(mat)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    print(f"ML20M shape nnz={mat.nnz}", flush=True)
    for k in (64, 128):
        run("ML20M", mat, iu, ii, n_users, n_items, k, "auto")
    del mat

    # --- full bench shape: code tiles vs float tiles, same data
    n_users, n_items = 100_000, 20_000
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    star_quantize(mat)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    print(f"full-bench shape nnz={mat.nnz}", flush=True)
    run("full-stars", mat, iu, ii, n_users, n_items, 64, "off")
    run("full-stars", mat, iu, ii, n_users, n_items, 64, "auto")


if __name__ == "__main__":
    main()
