"""Dense-cell SGD engine tests (ops/dense_block_kernel.py).

The dense engine claims EXACT update parity with the one-hot diag
engine at batch = cell (README deviation #1 batch-size hyperparameter;
the equivalence argument is in the kernel module docstring). These
tests pin (a) the single-cell update against _batch_update, (b) whole
epochs against BlockSGDSolver(schedule="diag") sharing the same
on-device schedule key stream, (c) IFWMF weighted parity, (d)
convergence to the synthetic noise floor, and (e) the budget/mask
guards."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matfac_tpu.config import Params
from matfac_tpu.data.synthetic import low_rank_ratings

from matfac_tpu.models.base import ModelMF, init_state
from matfac_tpu.ops.block_sgd_kernel import _batch_update
from matfac_tpu.ops.dense_block_kernel import cell_dense_update
from matfac_tpu.solvers.block_sgd import BlockSGDSolver
from matfac_tpu.utils import freq


@pytest.mark.parametrize("collision_norm", [False, True])
def test_dense_cell_update_matches_batch_update(collision_norm):
    """One dense cell step == _batch_update over the cell's COO at
    bs = cell size (f32 matmuls)."""
    rng = np.random.default_rng(0)
    bu, bi, k, nnz = 16, 8, 4, 40
    u = rng.integers(0, bu, nnz).astype(np.int32)
    i = rng.integers(0, bi, nnz).astype(np.int32)
    # dedupe (u, i) pairs: dense tiles assume CSR-unique entries
    _, keep = np.unique(u.astype(np.int64) * bi + i, return_index=True)
    u, i = u[keep], i[keep]
    nnz = len(u)
    r = rng.normal(size=nnz).astype(np.float32)
    w = rng.choice([0.5, 1.0, 2.0], nnz).astype(np.float32)
    w[rng.random(nnz) < 0.2] = 0.0  # invalid slots ride with w=0
    U0 = rng.normal(size=(bu, k)).astype(np.float32) * 0.3
    I0 = rng.normal(size=(bi, k)).astype(np.float32) * 0.3
    lr, ur, ir = 0.05, 0.01, 0.02

    Uo, Io = _batch_update(
        jnp.asarray(U0), jnp.asarray(I0), jnp.asarray(u), jnp.asarray(i),
        jnp.asarray(r), jnp.asarray(w),
        None if not collision_norm else _counts(u, w, bu),
        None if not collision_norm else _counts(i, w, bi),
        None, jnp.float32(lr), k, bu, bi, ur, ir, collision_norm,
        False, jnp.float32)

    R = np.zeros((bu, bi), np.float32)
    W = np.zeros((bu, bi), np.float32)
    R[u, i] = r
    W[u, i] = w
    Ud, Id = cell_dense_update(
        jnp.asarray(U0), jnp.asarray(I0), jnp.asarray(R), jnp.asarray(W),
        jnp.float32(lr), ur, ir, collision_norm, jnp.float32)
    np.testing.assert_allclose(np.asarray(Uo), np.asarray(Ud),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(Io), np.asarray(Id),
                               rtol=2e-5, atol=2e-6)


def _counts(idx, w, width):
    """per-element max(within-batch valid same-entity count, 1) — the
    staged collision divisor (solvers/block_sgd.py)."""
    cnt = np.zeros(width)
    np.add.at(cnt, idx, (w > 0).astype(np.float64))
    return jnp.asarray(np.maximum(cnt[idx], 1.0).astype(np.float32))


def _setup(n_users=60, n_items=40, seed=7):
    mat, _, _ = low_rank_ratings(n_users, n_items, 3, density=0.3,
                                 seed=seed, noise=0.05, nonneg=True)
    params = Params(fac_dim=4, u_reg=0.01, i_reg=0.01, learn_rate=0.05,
                    seed=2)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    return mat, params, iu, ii


@pytest.mark.parametrize("collision_norm", [False, True])
def test_dense_epoch_matches_onehot_diag(collision_norm):
    """Full epochs: dense engine == one-hot diag engine at bs = cell
    (both consume the same host rng -> same on-device schedule key)."""
    mat, params, iu, ii = _setup()
    model = ModelMF(params, 60, 40)
    dense = BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=16,
                           collision_norm=collision_norm,
                           mm_bf16=False, engine="dense")
    onehot = BlockSGDSolver(model, params, mat, iu, ii,
                            batch_size=1 << 20, bu=16, bi=16,
                            collision_norm=collision_norm,
                            mm_bf16=False, engine="xla",
                            schedule="diag")
    assert onehot.bs == onehot.S  # one batch per cell
    sd = init_state(params, 60, 40, seed=3)
    so = init_state(params, 60, 40, seed=3)
    for _ in range(3):
        sd = dense.epoch(sd, params.learn_rate, None)
        so = onehot.epoch(so, params.learn_rate, None)
    np.testing.assert_allclose(np.asarray(sd.u_fac),
                               np.asarray(so.u_fac),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sd.i_fac),
                               np.asarray(so.i_fac),
                               rtol=1e-4, atol=1e-5)


def test_dense_epoch_weighted_matches_onehot():
    """IFWMF per-example weights ride the dense W tiles (f32 under the
    default budget) — parity with the one-hot engine holds."""
    from matfac_tpu.models.longtail import ModelInvPopMF
    mat, params, iu, ii = _setup()
    uf, itf = freq.row_col_freq(mat)
    uf = np.resize(uf, 60)
    itf = np.resize(itf, 40)
    model = ModelInvPopMF(params, 60, 40, uf, itf,
                          invalid_users=iu, invalid_items=ii)
    dense = BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=16,
                           collision_norm=True, mm_bf16=False,
                           engine="dense")
    assert dense.W_cells.dtype == jnp.float32
    onehot = BlockSGDSolver(model, params, mat, iu, ii,
                            batch_size=1 << 20, bu=16, bi=16,
                            collision_norm=True, mm_bf16=False,
                            engine="xla", schedule="diag")
    sd = init_state(params, 60, 40, seed=3)
    so = init_state(params, 60, 40, seed=3)
    for _ in range(2):
        sd = dense.epoch(sd, params.learn_rate, None)
        so = onehot.epoch(so, params.learn_rate, None)
    np.testing.assert_allclose(np.asarray(sd.u_fac),
                               np.asarray(so.u_fac),
                               rtol=1e-4, atol=1e-5)


def test_dense_plain_mf_w_is_int8():
    mat, params, iu, ii = _setup()
    model = ModelMF(params, 60, 40)
    dense = BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=16,
                           engine="dense")
    assert dense.W_cells.dtype == jnp.int8
    # every training rating landed in exactly one dense slot
    assert int(jnp.sum(dense.W_cells)) == dense.nnz


def test_dense_converges():
    mat, params, iu, ii = _setup(n_users=120, n_items=80)
    model = ModelMF(params, 120, 80)
    # auto block sizing at this tiny shape collapses to ONE cell
    # (full-batch GD — converges, but slowly); sweep real cells instead
    dense = BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=16,
                           collision_norm=True, engine="dense")
    state = init_state(params, 120, 80, seed=1)
    for _ in range(60):
        state = dense.epoch(state, params.learn_rate, None)
    r, c, v = mat.to_coo()
    keep = ~iu[r] & ~ii[c]
    r, c, v = r[keep], c[keep], v[keep]
    U = np.asarray(state.u_fac)
    I = np.asarray(state.i_fac)
    pred = np.sum(U[r] * I[c], axis=1)
    rmse = float(np.sqrt(np.mean((pred - v) ** 2)))
    assert rmse < 0.15  # noise=0.05 floor + margin


def test_dense_auto_block_sizing_smoke():
    """bu/bi=None picks a square-ish cell grid and the epoch runs."""
    mat, params, iu, ii = _setup(n_users=120, n_items=80)
    model = ModelMF(params, 120, 80)
    dense = BlockSGDSolver(model, params, mat, iu, ii, bu=None, bi=None,
                           engine="dense")
    assert dense.NU >= 1 and dense.NI >= 1
    assert dense.bu % 8 == 0 and dense.bi % 128 == 0
    state = init_state(params, 120, 80, seed=1)
    out = dense.epoch(state, params.learn_rate, None)
    assert np.isfinite(np.asarray(out.u_fac)).all()


@pytest.mark.parametrize("collision_norm", [False, True])
def test_dense_rows_matches_onehot_full_width(collision_norm):
    """The ROW-stripe layout (bi = catalog width, the dense default) ==
    the one-hot diag engine at NI = 1 with batch = stripe; both consume
    the same schedule key stream, and dense_epoch_rows_keyed derives
    its stripe order from device_diag_schedule(G=1) precisely so the
    visit orders coincide."""
    mat, params, iu, ii = _setup()
    model = ModelMF(params, 60, 40)
    dense = BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=None,
                           collision_norm=collision_norm,
                           mm_bf16=False, engine="dense")
    assert dense.NI == 1 and dense.bi >= 40
    onehot = BlockSGDSolver(model, params, mat, iu, ii,
                            batch_size=1 << 20, bu=16, bi=dense.bi,
                            collision_norm=collision_norm,
                            mm_bf16=False, engine="xla",
                            schedule="diag")
    sd = init_state(params, 60, 40, seed=3)
    so = init_state(params, 60, 40, seed=3)
    for _ in range(3):
        sd = dense.epoch(sd, params.learn_rate, None)
        so = onehot.epoch(so, params.learn_rate, None)
    np.testing.assert_allclose(np.asarray(sd.u_fac),
                               np.asarray(so.u_fac),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sd.i_fac),
                               np.asarray(so.i_fac),
                               rtol=1e-4, atol=1e-5)


def test_dense_rows_converges():
    """Row-stripe batches (stripe x full catalog) still reach the
    synthetic noise floor with collision normalization."""
    mat, params, iu, ii = _setup(n_users=120, n_items=80)
    model = ModelMF(params, 120, 80)
    dense = BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=None,
                           collision_norm=True, engine="dense")
    assert dense.NI == 1
    state = init_state(params, 120, 80, seed=1)
    for _ in range(60):
        state = dense.epoch(state, params.learn_rate, None)
    r, c, v = mat.to_coo()
    keep = ~iu[r] & ~ii[c]
    r, c, v = r[keep], c[keep], v[keep]
    U = np.asarray(state.u_fac)
    I = np.asarray(state.i_fac)
    pred = np.sum(U[r] * I[c], axis=1)
    rmse = float(np.sqrt(np.mean((pred - v) ** 2)))
    assert rmse < 0.15  # noise=0.05 floor + margin


def test_dense_budget_guard():
    mat, params, iu, ii = _setup()
    model = ModelMF(params, 60, 40)
    with pytest.raises(ValueError, match="dense_budget"):
        BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=16,
                       engine="dense", dense_budget_bytes=1024)


def test_dense_rejects_rank_masked_models():
    from matfac_tpu.models.longtail import ModelDropoutSigmoid
    mat, params, iu, ii = _setup()
    uf, itf = freq.row_col_freq(mat)
    uf = np.resize(uf, 60)
    itf = np.resize(itf, 40)
    model = ModelDropoutSigmoid(params, 60, 40, uf, itf)
    with pytest.raises(ValueError, match="rank-masked|dense"):
        BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=16,
                       engine="dense")


@pytest.mark.parametrize("collision_norm", [False, True])
def test_dense_rows_tmf_matches_onehot(collision_norm):
    """TMF on the row-dense engine: the factorized per-entity masks
    (min(r_u, r_i) => Mu[d]*Mi[d]) must reproduce the one-hot engine's
    per-pair iota masks exactly (same schedule keys, f32 matmuls)."""
    from matfac_tpu.models.longtail import ModelDropoutSigmoid

    mat, params, iu, ii = _setup()
    p = Params(fac_dim=4, u_reg=0.01, i_reg=0.02, learn_rate=0.05,
               seed=2, rho_rms=1.0, alpha=0.0)
    uf, itf = freq.row_col_freq(mat)
    uf = np.resize(uf, 60)
    itf = np.resize(itf, 40)
    model = ModelDropoutSigmoid(p, 60, 40, uf, itf)
    dense = BlockSGDSolver(model, p, mat, iu, ii, bu=16, bi=None,
                           collision_norm=collision_norm,
                           mm_bf16=False, engine="dense")
    # masks must be non-trivial for the test to mean anything
    mu3, mi = dense._mask_tabs
    assert float(np.asarray(mi).min()) == 0.0
    onehot = BlockSGDSolver(model, p, mat, iu, ii,
                            batch_size=1 << 20, bu=16, bi=dense.bi,
                            collision_norm=collision_norm,
                            mm_bf16=False, engine="xla",
                            schedule="diag")
    assert onehot.use_mask
    sd = init_state(p, 60, 40, seed=3)
    so = init_state(p, 60, 40, seed=3)
    for _ in range(3):
        sd = dense.epoch(sd, p.learn_rate, None)
        so = onehot.epoch(so, p.learn_rate, None)
    np.testing.assert_allclose(np.asarray(sd.u_fac),
                               np.asarray(so.u_fac),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sd.i_fac),
                               np.asarray(so.i_fac),
                               rtol=1e-4, atol=1e-5)


def test_dense_rows_tmf_converges():
    from matfac_tpu.eval.metrics import Evaluator
    from matfac_tpu.data.dataset import Data
    from matfac_tpu.models.longtail import ModelDropoutSigmoid

    mat, params, iu, ii = _setup(n_users=120, n_items=80)
    p = Params(fac_dim=4, u_reg=0.001, i_reg=0.001, learn_rate=0.05,
               seed=2, rho_rms=0.5, alpha=-1.0)
    uf, itf = freq.row_col_freq(mat)
    uf = np.resize(uf, 120)
    itf = np.resize(itf, 80)
    model = ModelDropoutSigmoid(p, 120, 80, uf, itf)
    dense = BlockSGDSolver(model, p, mat, iu, ii, bu=16, bi=None,
                           collision_norm=True, engine="dense")
    state = init_state(p, 120, 80, seed=1)
    for _ in range(60):
        state = dense.epoch(state, p.learn_rate, None)
    ev = Evaluator(Data(train_mat=mat), iu, ii, p)
    tr = ev.rmse(model.eval_view(state), "train")
    assert tr < 0.5, tr


# ----------------------------------------------------------------------
# int8 rating-code tiles (round 5, VERDICT r4 #1)
# ----------------------------------------------------------------------

def test_rating_code_scale_detection():
    from matfac_tpu.solvers.block_sgd import rating_code_scale
    # half-star grid (ML-20M's rating scale)
    stars = np.asarray([0.5, 1.0, 2.5, 5.0, 4.5], np.float32)
    g = rating_code_scale(stars)
    assert g == 0.5
    # integer stars
    assert rating_code_scale(np.asarray([1, 5, 3], np.float32)) == 1.0
    # non-contiguous integer grid needs the min-gap candidate
    assert rating_code_scale(np.asarray([2.0, 3.0, 5.0],
                                        np.float32)) == 1.0
    # zero-valued ratings cannot carry validity
    assert rating_code_scale(np.asarray([0.0, 1.0], np.float32)) is None
    # continuous ratings are not representable
    rng = np.random.default_rng(0)
    assert rating_code_scale(
        rng.normal(size=50).astype(np.float32) + 3.0) is None
    # > 127 levels overflow int8
    assert rating_code_scale(
        np.arange(1, 200, dtype=np.float32)) is None
    # negative grids are fine (centered stars)
    assert rating_code_scale(np.asarray([-2.0, -1.0, 1.0, 2.0],
                                        np.float32)) == 1.0


def _star_setup(n_users=60, n_items=40, seed=7):
    """_setup with ratings snapped to the 0.5-star grid in [0.5, 5]."""
    mat, params, iu, ii = _setup(n_users, n_items, seed)
    q = np.clip(np.round(mat.values / 0.5), 1, 10) * 0.5
    mat.values[:] = q.astype(np.float32)
    return mat, params, iu, ii


@pytest.mark.parametrize("layout", ["rows", "diag"])
def test_dense_codes_bit_exact_on_stars(layout):
    """Star-grid data: the int8 code engine must be BIT-EXACT vs float
    tile staging (code * scale reproduces every rating exactly in f32,
    and the update arithmetic is the same op sequence)."""
    mat, params, iu, ii = _star_setup()
    model = ModelMF(params, 60, 40)
    bi = None if layout == "rows" else 16
    code = BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=bi,
                          collision_norm=True, mm_bf16=False,
                          engine="dense", dense_codes="codes")
    assert code.W_cells is None and code.r_scale == 0.5
    assert code.R_cells.dtype == jnp.int8
    flt = BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=bi,
                         collision_norm=True, mm_bf16=False,
                         engine="dense", dense_codes="off")
    assert flt.W_cells is not None
    sc = init_state(params, 60, 40, seed=3)
    sf = init_state(params, 60, 40, seed=3)
    for _ in range(3):
        sc = code.epoch(sc, params.learn_rate, None)
        sf = flt.epoch(sf, params.learn_rate, None)
    assert np.array_equal(np.asarray(sc.u_fac), np.asarray(sf.u_fac))
    assert np.array_equal(np.asarray(sc.i_fac), np.asarray(sf.i_fac))


def test_dense_codes_tmf_masked_parity():
    """TMF rank masks ride the code tiles unchanged."""
    from matfac_tpu.models.longtail import ModelDropoutSigmoid
    mat, params, iu, ii = _star_setup()
    p = Params(fac_dim=4, u_reg=0.01, i_reg=0.02, learn_rate=0.05,
               seed=2, rho_rms=1.0, alpha=0.0)
    uf, itf = freq.row_col_freq(mat)
    uf = np.resize(uf, 60)
    itf = np.resize(itf, 40)
    model = ModelDropoutSigmoid(p, 60, 40, uf, itf)
    code = BlockSGDSolver(model, p, mat, iu, ii, bu=16, bi=None,
                          collision_norm=True, mm_bf16=False,
                          engine="dense", dense_codes="codes")
    assert code.W_cells is None
    flt = BlockSGDSolver(model, p, mat, iu, ii, bu=16, bi=None,
                         collision_norm=True, mm_bf16=False,
                         engine="dense", dense_codes="off")
    sc = init_state(p, 60, 40, seed=3)
    sf = init_state(p, 60, 40, seed=3)
    for _ in range(3):
        sc = code.epoch(sc, p.learn_rate, None)
        sf = flt.epoch(sf, p.learn_rate, None)
    assert np.array_equal(np.asarray(sc.u_fac), np.asarray(sf.u_fac))


def test_dense_codes_lossy_error_class_and_training():
    """Continuous ratings under dense_codes='lossy': staged rating =
    code * scale within scale/2 (scale = max|r|/127; near-zero clamps
    within scale), and no rating drops. Training still converges."""
    mat, params, iu, ii = _setup(n_users=120, n_items=80)
    model = ModelMF(params, 120, 80)
    solver = BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=None,
                            collision_norm=True, engine="dense",
                            dense_codes="lossy")
    assert solver.W_cells is None
    g = solver.r_scale
    # reconstruct staged rating per kept COO entry and bound the error
    r, c, v = mat.to_coo()
    keep = ~iu[r] & ~ii[c]
    r, c, v = r[keep], c[keep], v[keep]
    R = np.asarray(solver.R_cells).astype(np.float32) * g
    NU, bu = solver.NU, solver.bu
    r2 = solver.u_perm[r]
    staged = R[r2 // bu, r2 % bu, solver.i_perm[c]]
    assert np.all(staged != 0)          # nothing dropped
    err = np.abs(staged - v)
    assert err.max() <= g + 1e-6, (err.max(), g)
    state = init_state(params, 120, 80, seed=1)
    for _ in range(40):
        state = solver.epoch(state, params.learn_rate, None)
    from matfac_tpu.eval.metrics import Evaluator
    from matfac_tpu.data.dataset import Data
    ev = Evaluator(Data(train_mat=mat), iu, ii, params)
    assert ev.rmse(model.eval_view(state), "train") < 0.5


def test_dense_codes_auto_falls_back_to_float_tiles():
    """Continuous data + dense_codes='auto' -> float staging (no
    silent lossy quantization); tiny star grids under 'auto' also
    stage float (the measured speed policy — codes only pay at
    traffic-bound grids), and 'codes' on continuous data raises."""
    mat, params, iu, ii = _setup()
    model = ModelMF(params, 60, 40)
    solver = BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=None,
                            engine="dense", dense_codes="auto")
    assert solver.W_cells is not None and solver.r_scale is None
    smat, *_ = _star_setup()
    auto = BlockSGDSolver(model, params, smat, iu, ii, bu=16, bi=None,
                          engine="dense", dense_codes="auto")
    assert auto.W_cells is not None   # tiny grid: policy picks float
    with pytest.raises(ValueError, match="representable"):
        BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=None,
                       engine="dense", dense_codes="codes")


# ----------------------------------------------------------------------
# TMF+Poisson per-round CRN resampling (round 5, VERDICT r4 #3)
# ----------------------------------------------------------------------

def _pois_model(n_users=60, n_items=40, mat=None):
    from matfac_tpu.models.longtail import ModelPoissonDropout
    p = Params(fac_dim=8, u_reg=0.01, i_reg=0.01, learn_rate=0.05,
               seed=2, rho_rms=1.0, alpha=0.0)
    uf, itf = freq.row_col_freq(mat)
    uf = np.resize(uf, n_users)
    itf = np.resize(itf, n_items)
    return ModelPoissonDropout(p, n_users, n_items, uf, itf), p


def test_poisson_cdf_table_and_crn_quantile_marginal():
    """The CDF table's CRN quantile transform q(lam) = clip(#{m :
    C[lam-1, m] < U}, 1, k): (a) q is monotone in lam at every U, so
    pair rank factorizes as min; (b) for uniform U the marginal of
    q(lam) equals clip(Poisson(lam), 1, k) exactly (pmf check)."""
    import math as _m
    mat, params, iu, ii = _setup()
    model, p = _pois_model(mat=mat)
    k = model.k
    C = model.poisson_cdf_table()
    assert C.shape == (k, k)
    # (a) monotone in lam for a dense grid of U
    us = np.linspace(1e-6, 1 - 1e-6, 4001)
    q = np.clip((C[None, :, :] < us[:, None, None]).sum(-1), 1, k)
    assert np.all(np.diff(q, axis=1) >= 0)
    # (b) marginal pmf: P(q(lam) = r) from the U-measure of each level
    # set vs the clipped-Poisson pmf
    for lam in (1, 3, k):
        pmf = np.zeros(k + 1)
        for r in range(1, k + 1):
            pmf[r] = np.mean(q[:, lam - 1] == r)
        pois = [_m.exp(-lam + m * _m.log(lam) - _m.lgamma(m + 1))
                for m in range(0, 200)]
        expect = np.zeros(k + 1)
        expect[1] = pois[0] + pois[1]                 # clip lo
        for r in range(2, k):
            expect[r] = pois[r]
        expect[k] = 1.0 - sum(pois[:k])               # clip hi
        np.testing.assert_allclose(pmf[1:], expect[1:], atol=2e-3)


def test_dense_poisson_matches_numpy_replica():
    """One dense-Poisson epoch == a host replica that re-derives the
    per-round uniforms/schedule from the same key and applies
    cell_dense_update with the replica masks (pins the wiring)."""
    from matfac_tpu.ops.block_sgd_kernel import device_diag_schedule

    mat, params, iu, ii = _setup()
    model, p = _pois_model(mat=mat)
    s = BlockSGDSolver(model, p, mat, iu, ii, bu=16, bi=None,
                       collision_norm=True, mm_bf16=False,
                       engine="dense")
    assert s._pois and s._pois_tabs is not None
    state = init_state(p, 60, 40, seed=3)
    # drive one epoch, capturing the key the solver will use
    ek = jax.random.PRNGKey(int(s._sched_rng.integers(2**31)))
    s._sched_rng = _FixedRng(ek)                      # replay below
    out = s.epoch(state, p.learn_rate, None)

    # ---- host replica
    lu3, li, cdf = (np.asarray(a) for a in s._pois_tabs)
    NU, bu = s.NU, s.bu
    k = model.k
    key2, ku = jax.random.split(ek)
    round_u = np.asarray(jax.random.uniform(ku, (NU,), jnp.float32))
    ub_idx, _, _ = device_diag_schedule(key2, NU, 1, 1)
    order = np.asarray(ub_idx)[:, 0]
    u3 = np.asarray(state.u_fac)[np.asarray(s.u_perm_inv_dev)]
    u3 = np.concatenate([u3, np.zeros((bu * (NU + 1) - len(u3), k),
                                      np.float32)])[: (NU + 1) * bu]
    u3 = jnp.asarray(u3.reshape(NU + 1, bu, k))
    it = np.asarray(state.i_fac)[np.asarray(s.i_perm_inv_dev)]
    it = jnp.asarray(it)
    R = np.asarray(s.R_cells, np.float32)
    W = (R != 0).astype(np.float32) if s.W_cells is None \
        else np.asarray(s.W_cells, np.float32)
    vals = R * (s.r_scale or 1.0)
    from matfac_tpu.ops.dense_block_kernel import cell_dense_update
    iota = np.arange(k)
    for t in range(NU):
        ub = int(order[t])
        qt = np.clip((cdf < round_u[t]).sum(1), 1, k)
        Mu = (iota[None, :] < qt[lu3[ub] - 1][:, None]).astype(np.float32)
        Mi = (iota[None, :] < qt[li - 1][:, None]).astype(np.float32)
        U, it = cell_dense_update(
            u3[ub], it, jnp.asarray(vals[ub]), jnp.asarray(W[ub]),
            jnp.float32(p.learn_rate), float(p.u_reg), float(p.i_reg),
            True, jnp.float32, Mu=jnp.asarray(Mu), Mi=jnp.asarray(Mi))
        u3 = u3.at[ub].set(U)
    exp_u = np.asarray(u3[:NU].reshape(-1, k))[np.asarray(s.u_perm_dev)]
    exp_i = np.asarray(it)[np.asarray(s.i_perm_dev)]
    np.testing.assert_allclose(np.asarray(out.u_fac), exp_u,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.i_fac), exp_i,
                               rtol=1e-5, atol=1e-6)


class _FixedRng:
    """Replays one predetermined PRNGKey seed for the epoch call."""
    def __init__(self, key):
        self._seed = int(np.asarray(jax.random.key_data(key))[-1])
        self._served = False

    def integers(self, *_a, **_k):
        return self._seed


def test_dense_poisson_converges_and_dispatches():
    """tmf_dropout trains through the dense row engine end-to-end and
    _auto_method picks densesgd when the grid fits."""
    from matfac_tpu.data.dataset import Data
    from matfac_tpu.eval.metrics import Evaluator
    from matfac_tpu.train.loop import _auto_method, train_model

    from matfac_tpu.data.io import split_train_test_val
    mat, params, iu, ii = _setup(n_users=120, n_items=80)
    model, p = _pois_model(120, 80, mat)
    p2 = Params(fac_dim=8, u_reg=0.001, i_reg=0.001, learn_rate=0.05,
                seed=2, rho_rms=0.5, alpha=-1.0, max_iter=50)
    tr, te, va = split_train_test_val(mat, 0.1, 0.1, seed=0)
    data = Data(train_mat=tr, test_mat=te, val_mat=va)
    assert _auto_method("tmfdropout", data, p2, None) == "densesgd"
    rep = train_model(data, p2, algo="TMFDropout", mf_method="densesgd",
                      log_fn=lambda *_: None)[0]
    ev = Evaluator(data, iu, ii, p2)
    # inference view uses the CDF-rank truncation; train RMSE must
    # reach the coarse basin
    from matfac_tpu.models.longtail import ModelPoissonDropout
    uf, itf = freq.row_col_freq(mat)
    m2 = ModelPoissonDropout(p2, 120, 80, np.resize(uf, 120),
                             np.resize(itf, 80))
    tr = ev.rmse(m2.eval_view(rep.best_state), "train")
    assert tr < 0.6, tr
