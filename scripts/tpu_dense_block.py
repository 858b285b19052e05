"""Dense-cell engine vs one-hot diag engine on the real chip.

The dense engine replaces the one-hot matmuls with 3 dense matmuls per
cell (6k FLOP / dense slot, no one-hot materialization traffic, no
per-batch stream machinery) and cuts the sequential round count via a
square-ish cell grid (NU ~ NI) — see ops/dense_block_kernel.py. This
script measures both engines same-process (device speed swings day to
day — CLAUDE.md) at the bench shapes.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_dense_block.py > /tmp/tpu_dense_block.log 2>&1 &
"""

import time

import numpy as np


def force(x):
    import jax.numpy as jnp
    return float(jnp.sum(x[0]))


def time_epochs(solver, params, nu, ni, n=3):
    import jax
    from matfac_tpu.models.base import init_state
    state = init_state(params, nu, ni)
    key = jax.random.PRNGKey(0)
    key, k1 = jax.random.split(key)
    t0 = time.time()
    state = solver.epoch(state, params.learn_rate, k1)
    force(state.u_fac)
    compile_s = time.time() - t0
    best = np.inf
    for _ in range(n):
        key, k1 = jax.random.split(key)
        t0 = time.time()
        state = solver.epoch(state, params.learn_rate, k1)
        force(state.u_fac)
        best = min(best, time.time() - t0)
    return compile_s, best, state


def main():
    import jax

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import ModelMF
    from matfac_tpu.solvers.block_sgd import BlockSGDSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)

    shapes = [("medium", 20_000, 5_000, 0.05),
              ("full", 100_000, 20_000, 0.005)]
    for name, nu, ni, dens in shapes:
        mat, _, _ = low_rank_ratings(nu, ni, k=8, density=dens, seed=0,
                                     noise=0.1, power_law=0.6,
                                     nonneg=True)
        iu, ii = freq.invalid_users_items(mat, nu, ni)
        params = Params(fac_dim=64, u_reg=0.01, i_reg=0.01,
                        learn_rate=0.005, seed=0)
        model = ModelMF(params, nu, ni)
        print(f"{name}: nnz={mat.nnz}", flush=True)

        # same-process reference: the current headline config
        ref = BlockSGDSolver(model, params, mat, iu, ii,
                             batch_size=None, bu=384, bi=384,
                             collision_norm=True, engine="xla",
                             schedule="diag", pad_k=128)
        c, dt, _ = time_epochs(ref, params, nu, ni)
        ref_rate = ref.nnz / dt / 1e6
        print(f"  onehot-diag b384 auto: compile={c:.1f}s "
              f"epoch={dt*1000:.1f}ms rate={ref_rate:.1f}M r/s",
              flush=True)

        # (None, None) = the ROW-stripe default (NI=1, dynamic-slice
        # stripes); one explicit cell grid kept for contrast with the
        # gather-bound diag layout (tpu_dense_probe.py decomposition)
        for bu, bi in [(None, None), (2048, 512)]:
            try:
                t0 = time.time()
                den = BlockSGDSolver(model, params, mat, iu, ii,
                                     collision_norm=True,
                                     engine="dense", bu=bu, bi=bi)
                stage_s = time.time() - t0
                c, dt, st = time_epochs(den, params, nu, ni)
                label = f"dense bu={den.bu} bi={den.bi} NU={den.NU} " \
                        f"NI={den.NI} R={den.R_cells.dtype}"
                rate = den.nnz / dt / 1e6
                print(f"  {label}: stage={stage_s:.1f}s compile={c:.1f}s"
                      f" epoch={dt*1000:.1f}ms rate={rate:.1f}M r/s "
                      f"({rate/ref_rate:.2f}x ref)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  dense bu={bu} bi={bi} FAIL: "
                      f"{type(e).__name__}: "
                      f"{str(e).splitlines()[0][:200]}", flush=True)
            finally:
                try:
                    del den
                except NameError:
                    pass


if __name__ == "__main__":
    main()
