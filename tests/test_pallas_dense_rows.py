"""Pallas row-stripe dense kernel (ops/dense_row_kernel.py) — interpret
-mode parity with the XLA rows engine, whose own parity/convergence is
pinned in tests/test_dense_block.py. Hardware behavior is measured by
scripts/tpu_dense_rows.py (PERF.md)."""

import numpy as np
import pytest

import jax.numpy as jnp

from matfac_tpu.config import Params
from matfac_tpu.data.synthetic import low_rank_ratings
from matfac_tpu.models.base import ModelMF, init_state
from matfac_tpu.solvers.block_sgd import BlockSGDSolver
from matfac_tpu.utils import freq


def _setup(n_users=60, n_items=40, seed=7):
    mat, _, _ = low_rank_ratings(n_users, n_items, 3, density=0.3,
                                 seed=seed, noise=0.05, nonneg=True)
    params = Params(fac_dim=4, u_reg=0.01, i_reg=0.02, learn_rate=0.05,
                    seed=2)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    return mat, params, iu, ii


@pytest.mark.parametrize("collision_norm", [False, True])
def test_pallas_rows_matches_xla_rows(collision_norm):
    mat, params, iu, ii = _setup()
    model = ModelMF(params, 60, 40)
    pal = BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=None,
                         collision_norm=collision_norm, mm_bf16=False,
                         engine="dense", dense_kernel="pallas",
                         dense_panel=64, interpret=True)
    assert pal.NI == 1 and pal.n_items_pad % 64 == 0
    xla = BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=None,
                         collision_norm=collision_norm, mm_bf16=False,
                         engine="dense")
    sp = init_state(params, 60, 40, seed=3)
    sx = init_state(params, 60, 40, seed=3)
    for _ in range(2):
        sp = pal.epoch(sp, params.learn_rate, None)
        sx = xla.epoch(sx, params.learn_rate, None)
    np.testing.assert_allclose(np.asarray(sp.u_fac),
                               np.asarray(sx.u_fac),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sp.i_fac),
                               np.asarray(sx.i_fac),
                               rtol=1e-5, atol=1e-6)


def test_pallas_rows_weighted_parity():
    """IFWMF weights ride the dense W tiles through the panel kernel."""
    from matfac_tpu.models.longtail import ModelInvPopMF
    mat, params, iu, ii = _setup()
    uf, itf = freq.row_col_freq(mat)
    uf = np.resize(uf, 60)
    itf = np.resize(itf, 40)
    model = ModelInvPopMF(params, 60, 40, uf, itf,
                          invalid_users=iu, invalid_items=ii)
    pal = BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=None,
                         collision_norm=True, mm_bf16=False,
                         engine="dense", dense_kernel="pallas",
                         dense_panel=64, interpret=True)
    xla = BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=None,
                         collision_norm=True, mm_bf16=False,
                         engine="dense")
    sp = init_state(params, 60, 40, seed=3)
    sx = init_state(params, 60, 40, seed=3)
    sp = pal.epoch(sp, params.learn_rate, None)
    sx = xla.epoch(sx, params.learn_rate, None)
    np.testing.assert_allclose(np.asarray(sp.u_fac),
                               np.asarray(sx.u_fac),
                               rtol=1e-5, atol=1e-6)


def test_pallas_rows_vmem_gate():
    mat, params, iu, ii = _setup()
    model = ModelMF(params, 60, 40)
    with pytest.raises(ValueError, match="VMEM|row layout"):
        BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=32,
                       engine="dense", dense_kernel="pallas")


# ----------------------------------------------------------------------
# bf16-resident + int8-code kernel (round 5)
# ----------------------------------------------------------------------

def _star_setup(n_users=60, n_items=40, seed=7):
    mat, params, iu, ii = _setup(n_users, n_items, seed)
    q = np.clip(np.round(mat.values / 0.5), 1, 10) * 0.5
    mat.values[:] = q.astype(np.float32)
    return mat, params, iu, ii


@pytest.mark.parametrize("collision_norm", [False, True])
def test_pallas_codes_matches_xla_rows(collision_norm):
    """Interpret-mode parity: the bf16-resident code kernel tracks the
    XLA rows engine (mm_bf16=True so the matmul precision matches)
    within the documented bf16 i-table store rounding (~4e-3 rel after
    2 epochs at this scale); u rows are f32 end-to-end so they inherit
    only the i-table drift."""
    mat, params, iu, ii = _star_setup()
    model = ModelMF(params, 60, 40)
    pal = BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=None,
                         collision_norm=collision_norm,
                         engine="dense", dense_kernel="pallas_codes",
                         dense_panel=64, interpret=True)
    assert pal.W_cells is None and pal.r_scale == 0.5
    xla = BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=None,
                         collision_norm=collision_norm,
                         engine="dense", dense_codes="codes")
    assert xla.W_cells is None
    sp = init_state(params, 60, 40, seed=3)
    sx = init_state(params, 60, 40, seed=3)
    for _ in range(2):
        sp = pal.epoch(sp, params.learn_rate, None)
        sx = xla.epoch(sx, params.learn_rate, None)
    np.testing.assert_allclose(np.asarray(sp.u_fac),
                               np.asarray(sx.u_fac),
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(sp.i_fac),
                               np.asarray(sx.i_fac),
                               rtol=5e-3, atol=5e-4)


def test_pallas_codes_requires_code_tiles():
    mat, params, iu, ii = _setup()   # continuous ratings
    model = ModelMF(params, 60, 40)
    with pytest.raises(ValueError, match="star-grid|code"):
        BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=None,
                       engine="dense", dense_kernel="pallas_codes",
                       dense_panel=64, interpret=True)


def test_pallas_codes_converges():
    mat, params, iu, ii = _star_setup(n_users=120, n_items=80)
    model = ModelMF(params, 120, 80)
    solver = BlockSGDSolver(model, params, mat, iu, ii, bu=16, bi=None,
                            collision_norm=True, engine="dense",
                            dense_kernel="pallas_codes",
                            dense_panel=64, interpret=True)
    state = init_state(params, 120, 80, seed=1)
    for _ in range(100):
        state = solver.epoch(state, params.learn_rate, None)
    r, c, v = mat.to_coo()
    keep = ~iu[r] & ~ii[c]
    r, c, v = r[keep], c[keep], v[keep]
    pred = np.sum(np.asarray(state.u_fac)[r]
                  * np.asarray(state.i_fac)[c], axis=1)
    rmse = float(np.sqrt(np.mean((pred - v) ** 2)))
    # tracks the XLA code engine's own trajectory (0.289 at 100
    # epochs measured) within bf16 table rounding
    assert rmse < 0.35, rmse
