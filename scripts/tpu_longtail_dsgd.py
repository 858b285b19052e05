"""Long-tail model family + DSGD N=1 on-chip timings.

Stage 1: TMF (sigmoid rank-mask) and IFWMF (per-example weights)
through the block-SGD engine at the full bench shape — the rank-mask /
weight hooks ride the staged stream (use_mask path).
Stage 2: DSGD N=1 re-measure after the round-2 residency fix
(round-1 note: 6.6M ratings/s with per-epoch re-staging).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_longtail_dsgd.py > /tmp/tpu_lt.log 2>&1 &
"""

import time

import numpy as np


def force(x):
    import jax.numpy as jnp
    return float(jnp.sum(x[0]))


def time_epochs(solver, params, n_users, n_items, n=3):
    import jax

    from matfac_tpu.models.base import init_state
    state = init_state(params, n_users, n_items)
    key = jax.random.PRNGKey(0)
    key, k1 = jax.random.split(key)
    t0 = time.time()
    state = solver.epoch(state, params.learn_rate, k1)
    force(state.u_fac)
    c = time.time() - t0
    times = []
    for _ in range(n):
        key, k1 = jax.random.split(key)
        t0 = time.time()
        state = solver.epoch(state, params.learn_rate, k1)
        force(state.u_fac)
        times.append(time.time() - t0)
    return c, min(times)


def main():
    import jax

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import ModelMF
    from matfac_tpu.models.longtail import (ModelDropoutSigmoid,
                                            ModelInvPopMF)
    from matfac_tpu.solvers.block_sgd import BlockSGDSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items, k = 100_000, 20_000, 64
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    uf, itf = freq.row_col_freq(mat)
    uf = np.resize(uf, n_users) if len(uf) >= n_users else np.pad(
        uf, (0, n_users - len(uf)))
    itf = np.resize(itf, n_items) if len(itf) >= n_items else np.pad(
        itf, (0, n_items - len(itf)))
    print(f"nnz={mat.nnz}", flush=True)

    params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                    learn_rate=0.005, seed=0, rho_rms=1.0, alpha=0.0)

    def blk(model):
        return BlockSGDSolver(model, params, mat, iu, ii,
                              batch_size=1024, bu=384, bi=384,
                              collision_norm=True, schedule="diag",
                              pad_k=128)

    for name, model in (
            ("MF", ModelMF(params, n_users, n_items)),
            ("IFWMF", ModelInvPopMF(params, n_users, n_items, uf, itf,
                                    iu, ii)),
            ("TMF", ModelDropoutSigmoid(params, n_users, n_items, uf,
                                        itf))):
        try:
            s = blk(model)
            c, dt = time_epochs(s, params, n_users, n_items)
            print(f"blocksgd {name}: compile={c:.1f}s "
                  f"epoch={dt*1000:.0f}ms "
                  f"rate={s.nnz/dt/1e6:.1f}M ratings/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"blocksgd {name} FAIL: {type(e).__name__}: "
                  f"{str(e)[:400]}", flush=True)

    # ---- stage 2: DSGD N=1 (resident staging) ----
    try:
        from jax.sharding import Mesh

        from matfac_tpu.parallel.dsgd import DSGDShardedSolver
        mesh = Mesh(np.array(jax.devices()[:1]), ("u",))
        model = ModelMF(params, n_users, n_items)
        s = DSGDShardedSolver(model, params, mat, iu, ii, mesh,
                              balance_items=True)
        c, dt = time_epochs(s, params, n_users, n_items)
        print(f"DSGD N=1: compile={c:.1f}s epoch={dt*1000:.0f}ms "
              f"rate={s.nnz/dt/1e6:.1f}M ratings/s "
              f"(round-1: 6.6M with per-epoch restaging)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"DSGD FAIL: {type(e).__name__}: {str(e)[:400]}",
              flush=True)


if __name__ == "__main__":
    main()
