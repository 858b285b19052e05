"""Benchmark — prints ONE JSON line.

Primary metric (BASELINE.md): SGD ratings/sec/chip on an ML-scale
synthetic problem, with ALS ratings/sec/chip as a secondary in "extra".
The reference publishes no numbers (SURVEY.md §6), so vs_baseline is
measured against the recorded first-round value in BENCH_BASELINE
(defaults to this round's own target, i.e. 1.0 on the first run).

Env knobs:
  BENCH_SCALE=small|full   (small = CPU smoke run)
  BENCH_EPOCHS=N           timed epochs (default 3)
"""

import json
import os
import signal
import sys
import time

import numpy as np

SCALE = os.environ.get("BENCH_SCALE", "medium")
TIMED_EPOCHS = int(os.environ.get("BENCH_EPOCHS", "3"))

# Round-1 measured SGD throughput on one TPU v5e chip per scale —
# later rounds are compared against these (vs_baseline = value/baseline).
_R1_BASELINES = {"small": 3_500_000, "medium": 43_700_000,
                 "full": 38_000_000}
_env_baseline = float(os.environ.get("BENCH_BASELINE", "0"))
BENCH_BASELINE = _env_baseline or _R1_BASELINES.get(
    os.environ.get("BENCH_SCALE", "medium"), 0)


def main():
    import jax

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.solvers.als import ALSSolver
    from matfac_tpu.solvers.sgd import SGDSolver
    from matfac_tpu.utils import freq

    scales = {
        "small": (2000, 1000, 16, 0.02, 8192),
        "medium": (20_000, 5_000, 64, 0.05, 65_536),
        "full": (100_000, 20_000, 64, 0.005, 65_536),
    }
    n_users, n_items, k, density, bs = scales[SCALE]

    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=density,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    params = Params(fac_dim=k, u_reg=0.01, i_reg=0.01, learn_rate=0.005,
                    seed=0, batch_size=bs)
    inval_u, inval_i = freq.invalid_users_items(mat, n_users, n_items)
    model = ModelMF(params, n_users, n_items)

    import jax.numpy as jnp

    def force(state):
        # block_until_ready is NOT a reliable sync on the tunneled axon
        # backend — force a device->host readback of a value that
        # depends on the whole update chain
        return float(jnp.sum(state.u_fac[0]) + jnp.sum(state.i_fac[0]))

    def time_epochs(solver, n, _params=None, _nu=None, _ni=None):
        _params = _params or params
        state = init_state(_params, _nu or n_users, _ni or n_items)
        key = jax.random.PRNGKey(0)
        # warmup (compile) — TWO epochs: solvers with resident staged
        # layouts compile a second (donated-input) program variant on
        # their second call, and a 1-epoch warmup left that ~270 ms
        # compile inside the timed window (measured: the dense engine
        # swung 24.4-32 ms/epoch across bench runs, but is stable at
        # 24.4 after a 2-epoch warmup — scripts/tpu_dense_stability.py)
        for _ in range(2):
            key, k1 = jax.random.split(key)
            state = solver.epoch(state, _params.learn_rate, k1)
        force(state)
        t0 = time.perf_counter()
        for _ in range(n):
            key, k1 = jax.random.split(key)
            state = solver.epoch(state, _params.learn_rate, k1)
        force(state)
        return (time.perf_counter() - t0) / n

    sgd = SGDSolver(model, params, mat, inval_u, inval_i)
    sgd_epoch_s = time_epochs(sgd, TIMED_EPOCHS)
    sgd_rps = sgd.nnz / sgd_epoch_s

    # one-hot MXU cell engine (round 2): same SGD update semantics
    # (minibatched, collision-normalized; quality table in BASELINE.md),
    # restructured so gathers/scatters ride the MXU as one-hot matmuls.
    # The diagonal (DSGD-round) schedule batches NI axis-disjoint cells
    # per step and pads k to the MXU's 128 result lanes (exactly
    # equivalent — see solvers/block_sgd.py pad_k); measured 111M
    # ratings/s at full scale vs 84M for the row schedule (PERF.md).
    # This is the headline SGD number; the scatter engine rides in extra.
    from matfac_tpu.solvers.block_sgd import BlockSGDSolver
    # batch_size=None = auto: ~64k ratings per sequential diag step —
    # at the medium shape the old fixed bs=1024 left ~45 ms of a 59 ms
    # epoch as per-step dispatch latency (VERDICT r2 weak #1; PERF.md
    # "Medium-scale dispatch floor"); full scale resolves to the same
    # bs=1024 as before.
    blk = BlockSGDSolver(model, params, mat, inval_u, inval_i,
                         batch_size=None, bu=384, bi=384,
                         collision_norm=True, engine="xla",
                         schedule="diag",
                         pad_k=128 if k <= 128 else 0)
    blk_epoch_s = time_epochs(blk, TIMED_EPOCHS)
    blk_rps = blk.nnz / blk_epoch_s

    # row-stripe dense engine (round 4): per round one user stripe
    # updates against the FULL catalog in 3 full-width matmuls on
    # static dense rating/validity tiles — no one-hots, no per-rating
    # index streams (ops/dense_block_kernel.dense_sweep_rows; measured
    # 242M ratings/s at the full shape, 1.93x the one-hot engine
    # same-process). Gated on the dense-grid HBM budget; falls back to
    # the one-hot engine's number when the grid doesn't fit.
    dense_rps = None
    dense_epoch_s = None
    try:
        den = BlockSGDSolver(model, params, mat, inval_u, inval_i,
                             collision_norm=True, engine="dense",
                             bu=None, bi=None)
        dense_epoch_s = time_epochs(den, TIMED_EPOCHS)
        dense_rps = den.nnz / dense_epoch_s
        del den
    except Exception:  # noqa: BLE001 — budget guard or OOM
        dense_rps = None

    # int8 rating-CODE dense engine (round 5): the same row-dense
    # engine on star-quantized ratings (the realistic ML data class —
    # exactly representable as code * 0.5) stages 1 B/slot and reads
    # 3x less R+W per epoch; measured 524.6M ratings/s at the full
    # shape vs the float row's 404.8M. Rides as an extra so the float
    # number stays the cross-round comparable.
    dense_codes_rps = None
    try:
        if dense_rps is not None:
            import numpy as _np
            smat = mat.copy()
            smat.values[:] = (_np.clip(_np.round(smat.values / 0.5),
                                       1, 10) * 0.5).astype(_np.float32)
            dcod = BlockSGDSolver(model, params, smat, inval_u,
                                  inval_i, collision_norm=True,
                                  engine="dense", bu=None, bi=None,
                                  dense_codes="codes")
            if dcod.W_cells is None:   # codes actually staged
                dense_codes_rps = dcod.nnz / time_epochs(dcod,
                                                         TIMED_EPOCHS)
            del dcod, smat
    except Exception:  # noqa: BLE001
        dense_codes_rps = None

    # warm-started CG solves: the ALS perf path (exact-solve parity is
    # a solver option; see solvers/als.py solve_spd_cg)
    als = ALSSolver(model, params, mat, inval_u, inval_i, cg_iters=6)
    als_epoch_s = time_epochs(als, TIMED_EPOCHS)
    als_rps = mat.nnz / als_epoch_s
    del als

    # dense masked-Gram ALS (round 4: packed QQ + prestaged int8
    # masks): the faster ALS at bench densities — measured 164 ms vs
    # 194 ms bucketed at the full shape before the int8 staging
    # (scripts/tpu_dense_als.py). Rides as an extra; the bucketed
    # number stays the cross-round comparable.
    alsdense_rps = None
    try:
        from matfac_tpu.solvers.als import DenseALSSolver
        dals = DenseALSSolver(model, params, mat, inval_u, inval_i,
                              cg_iters=6, gram_int8=True)
        alsdense_rps = mat.nnz / time_epochs(dals, TIMED_EPOCHS)
        del dals
    except Exception:  # noqa: BLE001 — HBM budget guard
        alsdense_rps = None

    # BPR pairwise (rankgap sampler, round-2) + full-catalog HR@10 eval
    # (tile-exact top-k + COO exclusion + device-side LOO) as secondary
    # metrics; small scale skips them (compile dominates)
    bpr_pps = hr_ms = None
    try:
        if SCALE == "small":
            raise RuntimeError("skipped at small scale")
        from matfac_tpu.data.csr import RatingMatrix
        from matfac_tpu.eval.ranking import CatalogScorer
        from matfac_tpu.models.bpr import ModelMFBPR

        from matfac_tpu.solvers.bpr import BPRSolver
        bmodel = ModelMFBPR(params, n_users, n_items)
        bpr = BPRSolver(bmodel, params, mat, inval_u, inval_i,
                        n_tries=2, sampler="rankgap")
        bpr_epoch_s = time_epochs(bpr, TIMED_EPOCHS)
        bpr_pps = bpr.n_pos / bpr_epoch_s
        del bpr
        # dense-stripe BPR engine (round 4): full-catalog score panels
        # cut 9 index streams/pair to 4 (solvers/bpr_dense.py); rides
        # as an extra so the stream number stays comparable across
        # rounds
        bpr_dense_pps = None
        try:
            from matfac_tpu.solvers.bpr_dense import DenseBPRSolver
            dbpr = DenseBPRSolver(bmodel, params, mat, inval_u,
                                  inval_i)
            bpr_dense_pps = dbpr.n_pos / time_epochs(dbpr, TIMED_EPOCHS)
            del dbpr
        except Exception:  # noqa: BLE001 — HBM budget guard
            bpr_dense_pps = None
        scorer = CatalogScorer(mat, inval_u, inval_i, n_users, n_items,
                               user_block=4096, item_block=32768)
        rng = np.random.default_rng(1)
        loo = RatingMatrix.from_coo(
            np.arange(n_users, dtype=np.int64),
            rng.integers(0, n_items, n_users),
            np.ones(n_users, np.float32), n_users, n_items)
        view = bmodel.eval_view(init_state(params, n_users, n_items))
        scorer.hit_rate(view, loo, 10)   # compile + stage
        t0 = time.perf_counter()
        for _ in range(TIMED_EPOCHS):
            scorer.hit_rate(view, loo, 10)
        hr_ms = (time.perf_counter() - t0) / TIMED_EPOCHS * 1000
    except Exception:  # noqa: BLE001
        # secondary metrics must never cost the already-measured
        # headline numbers their JSON line
        bpr_pps = hr_ms = None

    # driver-visible FULL-shape headline (VERDICT r4 #9): when the
    # medium bench runs on a real accelerator, stage one extra
    # full-shape densesgd measurement so the headline number lands in
    # BENCH_r*.json each round (watchdog-guarded like everything else)
    full_dense_rps = None
    full_dense_epoch_s = None
    try:
        if (SCALE == "medium"
                and jax.devices()[0].platform not in ("cpu",)):
            fu, fi, fk, fd = 100_000, 20_000, 64, 0.005
            fmat, _, _ = low_rank_ratings(fu, fi, k=8, density=fd,
                                          seed=0, noise=0.1,
                                          power_law=0.6, nonneg=True)
            fparams = Params(fac_dim=fk, u_reg=0.01, i_reg=0.01,
                             learn_rate=0.005, seed=0)
            f_iu, f_ii = freq.invalid_users_items(fmat, fu, fi)
            fmodel = ModelMF(fparams, fu, fi)
            fden = BlockSGDSolver(fmodel, fparams, fmat, f_iu, f_ii,
                                  collision_norm=True, engine="dense",
                                  bu=None, bi=None)
            full_dense_epoch_s = time_epochs(fden, TIMED_EPOCHS,
                                             _params=fparams, _nu=fu,
                                             _ni=fi)
            full_dense_rps = fden.nnz / full_dense_epoch_s
            del fden, fmat
    except Exception:  # noqa: BLE001 — never cost the medium numbers
        full_dense_rps = None

    candidates = {"sgd": sgd_rps, "blocksgd": blk_rps}
    if dense_rps is not None:
        candidates["densesgd"] = dense_rps
    engine = max(candidates, key=candidates.get)
    best_rps = candidates[engine]
    baseline = BENCH_BASELINE or best_rps
    result = {
        "metric": "sgd_ratings_per_sec_per_chip",
        "value": round(best_rps, 1),
        "unit": "ratings/s/chip",
        "vs_baseline": round(best_rps / baseline, 3),
        "extra": {
            "device": str(jax.devices()[0]),
            "nnz": int(mat.nnz),
            "fac_dim": k,
            "engine": engine,
            "blocksgd_epoch_s": round(blk_epoch_s, 4),
            "blocksgd_ratings_per_sec": round(blk_rps, 1),
            "sgd_epoch_s": round(sgd_epoch_s, 4),
            "sgd_ratings_per_sec": round(sgd_rps, 1),
            "densesgd_epoch_s": (round(dense_epoch_s, 4)
                                 if dense_epoch_s else None),
            "densesgd_ratings_per_sec": (round(dense_rps, 1)
                                         if dense_rps else None),
            "densesgd_codes_ratings_per_sec": (
                round(dense_codes_rps, 1) if dense_codes_rps
                else None),
            "als_epoch_s": round(als_epoch_s, 4),
            "als_ratings_per_sec": round(als_rps, 1),
            "alsdense_ratings_per_sec": (round(alsdense_rps, 1)
                                         if alsdense_rps else None),
            "full_densesgd_epoch_s": (round(full_dense_epoch_s, 4)
                                      if full_dense_epoch_s else None),
            "full_densesgd_ratings_per_sec": (round(full_dense_rps, 1)
                                              if full_dense_rps
                                              else None),
        },
    }
    if bpr_pps is not None:
        result["extra"]["bpr_pairs_per_sec"] = round(bpr_pps, 1)
        result["extra"]["hr10_eval_ms"] = round(hr_ms, 1)
        if bpr_dense_pps is not None:
            result["extra"]["bpr_dense_pairs_per_sec"] = round(
                bpr_dense_pps, 1)
    try:
        with open(_last_good_path(), "w") as f:
            json.dump(result, f)
    except OSError:
        pass
    print(json.dumps(result))


def _last_good_path():
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"BENCH_LAST_GOOD_{SCALE}.json")


def _watchdog(signum, frame):
    # a wedged device tunnel must not stall the driver: report the last
    # good measurement (flagged) if one exists, else a zero sentinel
    try:
        with open(_last_good_path()) as f:
            result = json.load(f)
        result["extra"]["stale"] = ("device unavailable this run; "
                                    "reporting last completed "
                                    "measurement")
    except (OSError, json.JSONDecodeError):
        result = {"metric": "sgd_ratings_per_sec_per_chip",
                  "value": 0.0, "unit": "ratings/s/chip",
                  "vs_baseline": 0.0,
                  "extra": {"error": "bench watchdog timeout"}}
    print(json.dumps(result), flush=True)
    os._exit(2)


if __name__ == "__main__":
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(int(os.environ.get("BENCH_TIMEOUT_S", "1500")))
    main()
