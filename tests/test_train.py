"""Training-loop state machine + checkpoint tests.

The termination logic (model.cpp:1471-1540) is exercised with scripted
stub solvers/evaluators so every branch is hit deterministically:
best-snapshot, LR halving at 100 stagnant epochs, 500-epoch give-up,
NaN rollback, |dObj| < EPS convergence.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from matfac_tpu.config import Params
from matfac_tpu.data.synthetic import synthetic_data
from matfac_tpu.models.base import MFState, ModelMF, init_state
from matfac_tpu.train import checkpoint as ckpt
from matfac_tpu.train.loop import TrainLoop, train_model


class StubModel:
    use_bias = False
    use_factors = True
    n_users = 4
    n_items = 3

    def eval_view(self, state):
        return state

    def example_weight(self, rows, cols):
        return jnp.ones(rows.shape)


class StubSolver:
    """Each epoch increments a counter in u_fac[0,0]."""

    def __init__(self, nan_at=None):
        self.nan_at = nan_at
        self.calls = 0

    def epoch(self, state, lr, key):
        self.calls += 1
        return state._replace(u_fac=state.u_fac + 1.0)


class StubEvaluator:
    """Scripted objective / val-RMSE sequences, keyed by epoch count."""

    def __init__(self, objs, vals):
        self.objs = objs
        self.vals = vals
        self.i = -1

        class _C:
            rows = jnp.zeros(1, jnp.int32)
            cols = jnp.zeros(1, jnp.int32)
        self.train_coo = _C()

    def objective(self, view, state, weights=None, use_factors=True,
                  use_bias=False):
        self.i += 1
        return self.objs[min(self.i, len(self.objs) - 1)]

    def rmse(self, view, which):
        if which == "val":
            return self.vals[min(max(self.i, 0), len(self.vals) - 1)]
        return 0.0


def dummy_state():
    z = jnp.zeros((4, 3))
    return MFState(z, z, jnp.zeros(4), jnp.zeros(3), jnp.zeros(()))


def make_loop(objs, vals, **params_kw):
    p = Params(max_iter=params_kw.pop("max_iter", 20), learn_rate=0.1,
               **params_kw)
    ev = StubEvaluator(objs, vals)
    solver = StubSolver()
    loop = TrainLoop(StubModel(), solver, ev, p, log_fn=lambda s: None)
    return loop, solver, ev


def test_converges_on_small_obj_delta():
    # objs: initial, then e0, e1 (delta < eps at e1)
    objs = [100.0, 50.0, 50.0 + 1e-7]
    vals = [1.0, 0.9, 0.8]
    loop, solver, _ = make_loop(objs, vals)
    rep = loop.run(dummy_state())
    assert rep.stop_reason == "converged"
    assert solver.calls == 2


def test_best_snapshot_tracks_val():
    # val improves at e0, worsens after; best snapshot is e0's state
    objs = [100.0] + [90.0 - i for i in range(10)]
    vals = [1.0, 0.5, 0.7, 0.8, 0.9, 1.0, 1.1, 1.2, 1.3, 1.4, 1.5]
    loop, solver, _ = make_loop(objs, vals, max_iter=5)
    rep = loop.run(dummy_state())
    assert rep.best_iter == 0
    assert rep.best_metric == 0.5
    # epoch 0 ran once before the first objective check
    assert float(rep.best_state.u_fac[0, 0]) == 1.0
    assert float(rep.state.u_fac[0, 0]) == 5.0


def test_lr_halves_after_100_stagnant():
    objs = [100.0] + [90.0 - 0.1 * i for i in range(200)]
    vals = [0.5] + [0.9] * 200   # never improves on the initial 0.5...
    loop, solver, _ = make_loop(objs, vals, max_iter=150)
    rep = loop.run(dummy_state())
    # bestIter stays -1; halving kicks in at iter >= 99 (99 - -1 = 100)
    lrs = [h.lr for h in rep.history]
    assert lrs[98] == pytest.approx(0.1)
    assert lrs[99] == pytest.approx(0.05)
    assert lrs[100] == pytest.approx(0.025)


def test_chance_iter_gives_up():
    objs = [100.0] + [90.0 - 0.1 * i for i in range(600)]
    vals = [0.5] + [0.9] * 600
    loop, solver, _ = make_loop(objs, vals, max_iter=600)
    rep = loop.run(dummy_state())
    assert rep.stop_reason == "not_converged_chance_iter"
    assert solver.calls == 500  # iter 499: 499 - (-1) = 500 = CHANCE_ITER


def test_nan_rollback_restores_best_and_halves_lr():
    objs = [100.0, 90.0, float("nan"), 80.0, 70.0]
    vals = [1.0, 0.5, 0.6, 0.6, 0.6]
    loop, solver, _ = make_loop(objs, vals, max_iter=4)
    rep = loop.run(dummy_state())
    lrs = [h.lr for h in rep.history]
    # after NaN at check 2 (epoch 1): state restored to best (epoch 0)
    assert lrs[-1] == pytest.approx(0.05)
    assert rep.stop_reason == "max_iter"
    # rollback happened: epoch counter in state restarts from best state
    # best was epoch0 (u=1), then epochs 2,3 ran on restored state
    assert float(rep.state.u_fac[0, 0]) == 3.0


def test_checkpoint_text_roundtrip(tmp_path):
    p = Params(fac_dim=3, u_reg=0.01, i_reg=0.02, learn_rate=0.005)
    state = init_state(p, 6, 5)
    sig = ckpt.model_signature(p, 6, 5)
    assert sig == "6X5_3_0.01_0.02_0.005"
    prefix = str(tmp_path / "m")
    ckpt.save_facs(state, prefix, sig)
    blank = init_state(p, 6, 5, seed=99)
    back = ckpt.load_facs(blank, prefix, sig)
    np.testing.assert_allclose(back.u_fac, state.u_fac, rtol=1e-5)
    np.testing.assert_allclose(back.i_fac, state.i_fac, rtol=1e-5)
    assert ckpt.load_facs(blank, prefix + "nope", sig) is None


def test_checkpoint_invalid_roundtrip(tmp_path):
    prefix = str(tmp_path / "m")
    iu = np.array([True, False, True, False])
    ii = np.array([False, False, True])
    ckpt.save_invalid(prefix, iu, ii)
    iu2, ii2 = ckpt.load_invalid(prefix, 4, 3)
    np.testing.assert_array_equal(iu, iu2)
    np.testing.assert_array_equal(ii, ii2)


def test_checkpoint_state_roundtrip(tmp_path):
    p = Params(fac_dim=2)
    state = init_state(p, 3, 4)
    path = str(tmp_path / "st.npz")
    ckpt.save_state(path, state, epoch=np.int64(7), lr=np.float64(0.01))
    back, extra = ckpt.load_state(path)
    np.testing.assert_allclose(back.u_fac, state.u_fac)
    assert extra["epoch"] == 7
    assert extra["lr"] == 0.01


# ----------------------------------------------------------------------
# end-to-end: train_model front door
# ----------------------------------------------------------------------

@pytest.mark.parametrize("mf_method", ["sgd", "als", "ccd++"])
def test_train_model_end_to_end(mf_method, tmp_path):
    data, _, _ = synthetic_data(n_users=100, n_items=80, k=3,
                                density=0.3, seed=3, noise=0.05,
                                nonneg=True)
    p = Params(fac_dim=3, u_reg=0.05, i_reg=0.05, learn_rate=0.05,
               max_iter=40, seed=1, batch_size=256, disp_iter=1000)
    rep, model, ev, (iu, ii) = train_model(
        data, p, algo="mf", mf_method=mf_method,
        log_fn=lambda s: None, prefix=str(tmp_path / "m"))
    best_val = rep.best_metric
    assert best_val < 0.5, f"{mf_method}: val {best_val}"
    # checkpoint files exist
    sig = ckpt.model_signature(p, data.n_users, data.n_items)
    up, ip = ckpt.fac_paths(str(tmp_path / "m"), sig)
    assert os.path.exists(up) and os.path.exists(ip)


def test_train_model_longtail_models():
    data, _, _ = synthetic_data(n_users=80, n_items=60, k=3,
                                density=0.3, seed=4, noise=0.05,
                                power_law=0.8, nonneg=True)
    for algo in ["IFWMF", "TMF", "TMFDropout", "mf_bias"]:
        p = Params(fac_dim=3, u_reg=0.01, i_reg=0.01, learn_rate=0.02,
                   max_iter=8, seed=1, rho_rms=1.0, alpha=0.0,
                   disp_iter=1000)
        rep, model, ev, _ = train_model(data, p, algo=algo,
                                        mf_method="sgd",
                                        log_fn=lambda s: None)
        assert np.isfinite(rep.best_metric), algo
        # training improved on the init model
        init_val = ev.rmse(model.eval_view(
            init_state(p, data.n_users, data.n_items)), "val")
        assert rep.best_metric < init_val, algo


def test_train_model_sgdparsvd():
    data, uf, vf = synthetic_data(n_users=80, n_items=60, k=3,
                                  density=0.35, seed=11, noise=0.05,
                                  nonneg=True)
    p = Params(fac_dim=3, u_reg=0.1, i_reg=1.0, learn_rate=0.02,
               max_iter=15, seed=1, batch_size=256, disp_iter=1000)
    rep, model, ev, _ = train_model(data, p, algo="mf",
                                    mf_method="sgdparsvd",
                                    log_fn=lambda s: None)
    assert np.isfinite(rep.best_metric)
    assert rep.best_metric < 1.0  # SVD init should start close already


def test_full_low_rank_err():
    from matfac_tpu.models.base import EvalView
    import jax.numpy as jnp
    from matfac_tpu.utils import freq as ufreq
    from matfac_tpu.eval.metrics import Evaluator

    data, uf, vf = synthetic_data(n_users=40, n_items=30, k=3,
                                  density=0.3, seed=12, noise=0.0)
    p = Params(fac_dim=3)
    iu, ii = ufreq.invalid_users_items(data.train_mat, data.n_users,
                                       data.n_items)
    ev = Evaluator(data, iu, ii, p)
    gt = EvalView(jnp.asarray(uf), jnp.asarray(vf),
                  jnp.zeros(data.n_users), jnp.zeros(data.n_items),
                  jnp.float32(0))
    # ground truth vs itself -> 0 error
    assert ev.full_low_rank_err(gt, uf, vf) < 1e-5
    # shifted model -> positive error
    sh = gt._replace(u_fac=gt.u_fac + 0.5)
    err = ev.full_low_rank_err(sh, uf, vf)
    assert err > 0.1
    # unobserved-only excludes rated cells
    err_all = ev.full_low_rank_err(sh, uf, vf, exclude_rated=False)
    assert np.isfinite(err_all)


def test_loop_resume(tmp_path):
    """Interrupt at epoch 5, resume, and reach the same place as an
    uninterrupted run (same per-epoch keys via the saved key_seed)."""
    data, _, _ = synthetic_data(n_users=60, n_items=45, k=3,
                                density=0.35, seed=21, noise=0.05,
                                nonneg=True)
    prefix = str(tmp_path / "r")
    p1 = Params(fac_dim=3, u_reg=0.05, i_reg=0.05, learn_rate=0.03,
                max_iter=6, seed=4, batch_size=256, disp_iter=1000,
                save_iter=5)
    rep1, model, ev, _ = train_model(data, p1, mf_method="sgd",
                                     log_fn=lambda s: None, prefix=prefix)
    import os
    assert os.path.exists(prefix + "_loop.npz")
    # resume and run to 20 epochs
    from matfac_tpu.eval.metrics import Evaluator
    from matfac_tpu.solvers.sgd import SGDSolver
    from matfac_tpu.train.loop import TrainLoop
    from matfac_tpu.utils import freq as ufreq

    p2 = p1.replace(max_iter=20)
    iu, ii = ufreq.invalid_users_items(data.train_mat, data.n_users,
                                       data.n_items)
    model2 = ModelMF(p2, data.n_users, data.n_items)
    solver = SGDSolver(model2, p2, data.train_mat, iu, ii)
    ev2 = Evaluator(data, iu, ii, p2)
    loop = TrainLoop(model2, solver, ev2, p2, prefix=prefix,
                     log_fn=lambda s: None)
    rep2 = loop.run(init_state(p2, data.n_users, data.n_items),
                    resume=True)
    # resumed run continues beyond the first run's best
    assert rep2.best_metric <= rep1.best_metric + 1e-6


class StubRankSolver:
    def __init__(self, losses=None):
        self.calls = 0
        self.losses = losses or []
        self.last_loss = jnp.zeros(())
        self.last_inversions = jnp.zeros((), jnp.int32)

    def epoch(self, state, lr, key):
        if self.calls < len(self.losses):
            self.last_loss = jnp.float32(self.losses[self.calls])
        self.calls += 1
        return state._replace(u_fac=state.u_fac + 1.0)


class StubScorer:
    def __init__(self, hrs):
        self.hrs = hrs
        self.i = -1

    def hit_rate(self, view, mat, n):
        self.i += 1
        return self.hrs[min(self.i, len(self.hrs) - 1)]


def test_hr_loop_lr_decay_and_selection():
    from matfac_tpu.train.loop import TrainLoopHR

    p = Params(max_iter=5, learn_rate=1.0)
    scorer = StubScorer([0.1, 0.5, 0.3, 0.6, 0.2, 0.2])
    solver = StubRankSolver()
    loop = TrainLoopHR(StubModel(), solver, scorer, None, p,
                       log_fn=lambda s: None)
    rep = loop.run(dummy_state())
    # best HR 0.6 at check 3 (epoch 2)
    assert rep.best_metric == 0.6
    assert rep.best_iter == 2
    # lr decays x0.9 each epoch (modelMFBPR.cpp:533)
    assert rep.history[-1].lr == pytest.approx(1.0 * 0.9 ** 5)
    # best state snapshot taken at epoch 2 (3 epochs had run)
    assert float(rep.best_state.u_fac[0, 0]) == 3.0


def test_hr_loop_nonfinite_loss_stops():
    from matfac_tpu.train.loop import TrainLoopHR

    p = Params(max_iter=10, learn_rate=1.0)
    scorer = StubScorer([0.1] * 12)
    solver = StubRankSolver(losses=[1.0, 2.0, float("inf")])
    loop = TrainLoopHR(StubModel(), solver, scorer, None, p,
                       log_fn=lambda s: None)
    rep = loop.run(dummy_state())
    assert rep.stop_reason == "nonfinite_loss"
    assert solver.calls == 3


def _run_loop(data, params, prefix, resume, solver_kind="sgd"):
    from matfac_tpu.eval.metrics import Evaluator
    from matfac_tpu.solvers.ccd import CCDPPSolver
    from matfac_tpu.solvers.sgd import SGDSolver
    from matfac_tpu.utils import freq as ufreq

    iu, ii = ufreq.invalid_users_items(data.train_mat, data.n_users,
                                       data.n_items)
    model = ModelMF(params, data.n_users, data.n_items)
    cls = SGDSolver if solver_kind == "sgd" else CCDPPSolver
    solver = cls(model, params, data.train_mat, iu, ii)
    ev = Evaluator(data, iu, ii, params)
    loop = TrainLoop(model, solver, ev, params, prefix=prefix,
                     log_fn=lambda s: None)
    return loop.run(init_state(params, data.n_users, data.n_items),
                    resume=resume)


@pytest.mark.parametrize("solver_kind", ["sgd", "ccdpp"])
def test_loop_resume_bit_exact(tmp_path, solver_kind):
    """A run interrupted at epoch 5 and resumed reaches the SAME final
    state as an uninterrupted run: the raw PRNG key and solver-internal
    state (CCD++ residual) are persisted (round-2 exact-resume fix)."""
    data, _, _ = synthetic_data(n_users=50, n_items=40, k=3,
                                density=0.35, seed=31, noise=0.05,
                                nonneg=True)
    base = Params(fac_dim=3, u_reg=0.05, i_reg=0.05, learn_rate=0.03,
                  max_iter=10, seed=4, batch_size=256, disp_iter=1000,
                  save_iter=1)
    rep_full = _run_loop(data, base, str(tmp_path / "full"), False,
                         solver_kind)
    # interrupted: 5 epochs (checkpoint each epoch), then resume to 10
    _run_loop(data, base.replace(max_iter=5), str(tmp_path / "part"),
              False, solver_kind)
    rep_res = _run_loop(data, base, str(tmp_path / "part"), True,
                        solver_kind)
    np.testing.assert_array_equal(np.asarray(rep_full.state.u_fac),
                                  np.asarray(rep_res.state.u_fac))
    np.testing.assert_array_equal(np.asarray(rep_full.state.i_fac),
                                  np.asarray(rep_res.state.i_fac))
    assert rep_full.best_metric == rep_res.best_metric


def test_bin_facs_reference_layout_roundtrip(tmp_path):
    """.binmat files are a headerless little-endian float64 row-major
    stream (io.cpp:157-303) — a file hand-written in the documented
    reference layout must load bit-exactly, and our writes must read
    back with plain struct unpacking."""
    import struct

    p = Params(fac_dim=3, u_reg=0.01, i_reg=0.01, learn_rate=0.005)
    st = init_state(p, 4, 5, seed=9)
    sig = ckpt.model_signature(p, 4, 5)
    prefix = str(tmp_path / "b")
    up, ip = ckpt.save_bin_facs(st, prefix, sig)
    # read back with raw struct = what the reference's ifstream does
    raw = open(up, "rb").read()
    vals = struct.unpack("<%dd" % (4 * 3), raw)
    np.testing.assert_allclose(
        np.array(vals).reshape(4, 3),
        np.asarray(st.u_fac, dtype=np.float64), rtol=0, atol=1e-7)
    # and a file written the reference way loads exactly
    ref = np.arange(20, dtype=np.float64).reshape(4, 5) / 7.0
    with open(str(tmp_path / f"c_uFac_{sig}.binmat"), "wb") as f:
        for row in ref:
            for v in row:
                f.write(struct.pack("<d", v))
    with open(str(tmp_path / f"c_iFac_{sig}.binmat"), "wb") as f:
        f.write(struct.pack("<%dd" % 25, *np.zeros(25)))
    st2 = init_state(p.replace(fac_dim=5), 4, 5, seed=1)
    out = ckpt.load_bin_facs(st2, str(tmp_path / "c"),
                             ckpt.model_signature(p, 4, 5))
    np.testing.assert_allclose(np.asarray(out.u_fac), ref.astype(np.float32))


def test_auto_method_selection():
    """mf_method='auto' resolves per the measured guidance: ALS for
    plain MF, block-SGD for the deterministic long-tail models, sgd
    for Poisson-sampled ranks and biases."""
    from matfac_tpu.data.synthetic import synthetic_data
    from matfac_tpu.train.loop import _auto_method

    data, _, _ = synthetic_data(n_users=60, n_items=40, k=3,
                                density=0.3, seed=1)
    p = Params(fac_dim=4)
    assert _auto_method("mf", data, p, None) == "als"
    # deterministic SGD-family models prefer the row-dense engine when
    # the dense grid fits (round 4); tiny shapes always fit
    assert _auto_method("tmf", data, p, None) == "densesgd"
    assert _auto_method("ifwmf", data, p, None) == "densesgd"
    # round 5: the dense row engine resamples Poisson ranks per stripe
    # visit (README deviation #15), so tmfdropout rides it too
    assert _auto_method("tmfdropout", data, p, None) == "densesgd"
    assert _auto_method("mf_bias", data, p, None) == "sgd"
    # mesh branch makes the same quality-basin argument: sharded ALS
    # for plain MF, block-DSGD for the SGD-trained long-tail families
    assert _auto_method("mf", data, p, object()) == "als"
    assert _auto_method("tmf", data, p, object()) == "blocksgd"
    assert _auto_method("ifwmf", data, p, object()) == "blocksgd"
    assert _auto_method("tmfdropout", data, p, object()) == "blocksgd"

    # end-to-end: auto trains and logs the resolution
    logs = []
    rep, model, ev, _ = train_model(data, Params(
        fac_dim=4, max_iter=5, u_reg=0.05, i_reg=0.05,
        disp_iter=10 ** 6), algo="mf", mf_method="auto",
        log_fn=logs.append)
    assert any("resolved to 'als'" in s for s in logs)
    assert np.isfinite(rep.best_metric)


def test_blocksgd_rejects_poisson_sampled_model():
    """Routing ModelPoissonDropout to the static-rank block engine
    would silently train the deterministic TMF variant instead."""
    import pytest

    from matfac_tpu.data.synthetic import synthetic_data
    from matfac_tpu.models.longtail import ModelPoissonDropout
    from matfac_tpu.solvers.block_sgd import BlockSGDSolver
    from matfac_tpu.utils import freq as ufreq

    data, _, _ = synthetic_data(n_users=60, n_items=40, k=3,
                                density=0.3, seed=1)
    iu, ii = ufreq.invalid_users_items(data.train_mat, data.n_users,
                                       data.n_items)
    uf, itf = ufreq.row_col_freq(data.train_mat)
    uf = np.pad(uf, (0, data.n_users - len(uf)))
    itf = np.pad(itf, (0, data.n_items - len(itf)))
    p = Params(fac_dim=4, rho_rms=1.0)
    m = ModelPoissonDropout(p, data.n_users, data.n_items, uf, itf)
    with pytest.raises(ValueError, match="sampled ranks"):
        BlockSGDSolver(m, p, data.train_mat, iu, ii, batch_size=32,
                       bu=32, bi=32)
    # the dense DIAG grid (bi < catalog) cannot thread per-round masks
    with pytest.raises(ValueError, match="row layout"):
        BlockSGDSolver(m, p, data.train_mat, iu, ii, bu=32, bi=32,
                       engine="dense")


def test_full_model_text_save_load_roundtrip(tmp_path):
    """Model::save/load parity (model.cpp:31-86): biases + mu ride the
    text checkpoint with the reference's file names — uBias/iBias as
    one-value-per-line .vec, global bias as {prefix}_{sig}_gBias."""
    p = Params(fac_dim=3, u_reg=0.01, i_reg=0.01, learn_rate=0.005)
    st = init_state(p, 4, 5, seed=9)
    st = st._replace(u_bias=jnp.arange(4, dtype=jnp.float32) / 7,
                     i_bias=-jnp.arange(5, dtype=jnp.float32) / 3,
                     mu=jnp.asarray(2.5, jnp.float32))
    sig = ckpt.model_signature(p, 4, 5)
    prefix = str(tmp_path / "m")
    ckpt.save_full(st, prefix, sig)
    # reference-layout names exist
    assert (tmp_path / f"m_uBias_{sig}.vec").exists()
    assert (tmp_path / f"m_iBias_{sig}.vec").exists()
    assert (tmp_path / f"m_{sig}_gBias").exists()
    out = ckpt.load_full(init_state(p, 4, 5, seed=1), prefix, sig)
    np.testing.assert_allclose(np.asarray(out.u_fac),
                               np.asarray(st.u_fac), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.u_bias),
                               np.asarray(st.u_bias), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.i_bias),
                               np.asarray(st.i_bias), atol=1e-5)
    assert abs(float(out.mu) - 2.5) < 1e-7
    # a hand-written reference-layout fixture loads too
    (tmp_path / f"r_uBias_{sig}.vec").write_text("1.5\n-2\n0\n3.25\n")
    (tmp_path / f"r_iBias_{sig}.vec").write_text("0\n0\n1\n0\n-1\n")
    (tmp_path / f"r_{sig}_gBias").write_text("3.75\n")
    ckpt.save_facs(st, str(tmp_path / "r"), sig)
    out2 = ckpt.load_full(init_state(p, 4, 5, seed=1),
                          str(tmp_path / "r"), sig)
    np.testing.assert_allclose(np.asarray(out2.u_bias),
                               [1.5, -2, 0, 3.25])
    assert float(out2.mu) == 3.75
    # missing bias files -> None (existence-checked as a set)
    assert ckpt.load_full(init_state(p, 4, 5), str(tmp_path / "x"),
                          sig) is None


def test_bias_model_text_checkpoint_roundtrip(tmp_path):
    """Training mf_bias with a prefix persists mu/uBias/iBias; loading
    them back reproduces the best snapshot's predictions."""
    from matfac_tpu.data.synthetic import synthetic_data

    data, _, _ = synthetic_data(n_users=50, n_items=40, k=3,
                                density=0.35, seed=31, noise=0.05,
                                nonneg=True)
    p = Params(fac_dim=3, u_reg=0.01, i_reg=0.01, learn_rate=0.02,
               max_iter=6, seed=4, disp_iter=1000, save_iter=2)
    prefix = str(tmp_path / "bias")
    rep, model, ev, _ = train_model(data, p, algo="mf_bias",
                                    log_fn=lambda s: None,
                                    prefix=prefix)
    sig = ckpt.model_signature(p, data.n_users, data.n_items)
    out = ckpt.load_full(init_state(p, data.n_users, data.n_items),
                         prefix, sig)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out.u_bias),
                               np.asarray(rep.best_state.u_bias),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.i_bias),
                               np.asarray(rep.best_state.i_bias),
                               rtol=0, atol=2e-5)
    assert abs(float(out.mu) - float(rep.best_state.mu)) < 2e-5


def test_train_model_resume_passthrough(tmp_path):
    """The front door (and hence the CLI --resume flag) plumbs resume
    into the loop: a second call with resume=True continues from the
    saved epoch instead of restarting."""
    from matfac_tpu.data.synthetic import synthetic_data

    data, _, _ = synthetic_data(n_users=50, n_items=40, k=3,
                                density=0.35, seed=31, noise=0.05,
                                nonneg=True)
    p = Params(fac_dim=3, u_reg=0.05, i_reg=0.05, learn_rate=0.03,
               max_iter=4, seed=4, disp_iter=1000, save_iter=1)
    prefix = str(tmp_path / "r")
    train_model(data, p, algo="mf", mf_method="sgd",
                log_fn=lambda s: None, prefix=prefix)
    logs = []
    train_model(data, p.replace(max_iter=8), algo="mf",
                mf_method="sgd", log_fn=logs.append, prefix=prefix,
                resume=True)
    assert any("resumed from" in s for s in logs), logs


def test_head_weighted_mf():
    """othersrc ModelMFWt parity: head items (covering 50% rating
    mass) get data-fit weight lambda0=0.8, tail items 1.0; the weight
    rides the example_weight hook through every SGD engine and the
    weighted objective."""
    from matfac_tpu.data.synthetic import synthetic_data
    from matfac_tpu.models.longtail import ModelHeadWeightedMF
    from matfac_tpu.utils.freq import head_items

    data, _, _ = synthetic_data(n_users=120, n_items=80, k=3,
                                density=0.3, seed=21, noise=0.05,
                                power_law=1.0, nonneg=True)
    p = Params(fac_dim=4, u_reg=0.001, i_reg=0.001, learn_rate=0.05,
               max_iter=200, seed=5, disp_iter=10 ** 6)
    head = head_items(data.train_mat, 0.5)
    m = ModelHeadWeightedMF(p, data.n_users, data.n_items, head)
    w = np.asarray(m.example_weight(
        jnp.arange(10, dtype=jnp.int32),
        jnp.arange(10, dtype=jnp.int32)))
    expect = np.where(head[:10], 0.8, 1.0)
    np.testing.assert_allclose(w, expect)

    logs = []
    rep, model, ev, _ = train_model(data, p, algo="mf_headwt",
                                    mf_method="auto", log_fn=logs.append)
    assert model.name == "mf_headwt"
    assert np.isfinite(rep.best_metric) and rep.best_metric < 0.45, \
        rep.best_metric


def test_weighted_models_rejected_by_coordinate_solvers():
    """Coordinate solvers ignore example_weight/rank-mask hooks —
    routing a weighted model there must raise, not silently train
    plain MF under a weighted objective (review r3)."""
    from matfac_tpu.data.synthetic import synthetic_data

    data, _, _ = synthetic_data(n_users=60, n_items=40, k=3,
                                density=0.3, seed=1, nonneg=True)
    p = Params(fac_dim=4, max_iter=2, rho_rms=1.0, alpha=0.0,
               disp_iter=10 ** 6)
    for algo in ("ifwmf", "tmf", "mf_headwt"):
        for method in ("als", "ccd++"):
            with pytest.raises(ValueError, match="does not honor"):
                train_model(data, p, algo=algo, mf_method=method,
                            log_fn=lambda s: None)
    # plain MF still routes fine
    rep, *_ = train_model(data, p, algo="mf", mf_method="als",
                          log_fn=lambda s: None)
    assert np.isfinite(rep.best_metric)


def test_loop_resume_survives_missing_best_file(tmp_path):
    """A checkpoint pair interrupted between the loop.npz and
    best.npz writes must restart gracefully, not crash resume."""
    import os

    from matfac_tpu.data.synthetic import synthetic_data

    data, _, _ = synthetic_data(n_users=50, n_items=40, k=3,
                                density=0.35, seed=31, noise=0.05,
                                nonneg=True)
    p = Params(fac_dim=3, u_reg=0.05, i_reg=0.05, learn_rate=0.03,
               max_iter=3, seed=4, disp_iter=1000, save_iter=1)
    prefix = str(tmp_path / "r")
    train_model(data, p, algo="mf", mf_method="sgd",
                log_fn=lambda s: None, prefix=prefix)
    os.remove(prefix + "_loop_best.npz")
    logs = []
    rep, *_ = train_model(data, p, algo="mf", mf_method="sgd",
                          log_fn=logs.append, prefix=prefix,
                          resume=True)
    assert any("starting fresh" in s for s in logs), logs
    assert np.isfinite(rep.best_metric)


def test_auto_tmf_trains_on_dense_engine_e2e():
    """algo=TMF + mf_method=auto routes through the row-dense engine
    (round 4) end to end: trains, converges, and the solver actually
    staged factorized masks."""
    from matfac_tpu.data.synthetic import synthetic_data
    from matfac_tpu.train.loop import train_model

    data, _, _ = synthetic_data(n_users=150, n_items=100, k=4,
                                density=0.3, seed=9, noise=0.05,
                                nonneg=True)
    p = Params(fac_dim=4, u_reg=0.001, i_reg=0.001, learn_rate=0.05,
               max_iter=150, seed=5, rho_rms=0.5, alpha=-1.0,
               disp_iter=10 ** 6)
    logs = []
    rep, model, ev, _ = train_model(data, p, algo="TMF",
                                    mf_method="auto",
                                    log_fn=logs.append)
    assert any("densesgd" in s for s in logs), logs[:2]
    # TMF truncates ranks on FULL-rank truth, so every engine plateaus
    # ~0.66-0.72 here (blocksgd 0.66 / sgd 0.68 / dense 0.72 measured)
    # — assert the in-family plateau, not the noise floor
    assert rep.best_metric < 0.85, rep.best_metric
