"""othersrc model variants: ModelMFLoc, ModelMFFreq, ModelDropoutMFBias.

Exact-semantics pins: the per-side update gates are checked against a
numpy replication of the reference update rule (full gradient incl.
reg computed, then applied only to the gated side/dims —
othersrc/modelMFLoc.cpp:124-159, modelMFFreq.cpp:22-39), and the
mf_loc zero-invariant (tail entities never leave their first
fac_dim/2 dims) is asserted bit-exactly after training.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matfac_tpu.config import Params
from matfac_tpu.data.synthetic import synthetic_data
from matfac_tpu.eval.metrics import Evaluator
from matfac_tpu.models.base import init_state
from matfac_tpu.models.longtail import (ModelDropoutSigmoidBias,
                                        ModelLocalityMF, ModelSideGatedMF)
from matfac_tpu.solvers.sgd import SGDSolver
from matfac_tpu.train.loop import train_model
from matfac_tpu.utils import freq


@pytest.fixture(scope="module")
def small():
    data, _, _ = synthetic_data(n_users=80, n_items=60, k=3,
                                density=0.3, seed=4, noise=0.05,
                                power_law=0.8, nonneg=True)
    iu, ii = freq.invalid_users_items(data.train_mat, data.n_users,
                                      data.n_items)
    uf, itf = freq.row_col_freq(data.train_mat)
    uf = np.resize(uf, data.n_users) if len(uf) == data.n_users else uf
    return data, iu, ii, uf, itf


def _loc_model(data, uf, itf, params):
    return ModelLocalityMF(params, data.n_users, data.n_items,
                           freq.head_items_from_freq(uf, 0.8),
                           freq.head_items_from_freq(itf, 0.8))


def test_mf_loc_side_mask_oracle(small):
    """One SGD epoch (single batch, no collision norm) must equal the
    numpy replication of the per-side gated update."""
    data, iu, ii, uf, itf = small
    params = Params(fac_dim=6, u_reg=0.01, i_reg=0.02, learn_rate=0.05,
                    seed=3, batch_size=1 << 20)
    model = _loc_model(data, uf, itf, params)
    solver = SGDSolver(model, params, data.train_mat, iu, ii,
                       collision_norm=False)
    assert solver.n_batches == 1
    state0 = model.transform_init_state(
        init_state(params, data.n_users, data.n_items))
    u0 = np.asarray(state0.u_fac, np.float64)
    i0 = np.asarray(state0.i_fac, np.float64)

    st = jax.tree_util.tree_map(jnp.copy, state0)
    st1 = solver.epoch(st, params.learn_rate, jax.random.PRNGKey(0))

    rows = np.asarray(solver.rows)
    cols = np.asarray(solver.cols)
    vals = np.asarray(solver.vals, np.float64)
    valid = np.asarray(solver.valid, np.float64)
    k = params.fac_dim
    ranks_u = np.asarray(model.rank_u)
    ranks_i = np.asarray(model.rank_i)
    mu = (np.arange(k)[None, :] < ranks_u[rows][:, None])
    mi = (np.arange(k)[None, :] < ranks_i[cols][:, None])

    pu, qi = u0[rows], i0[cols]
    pred = np.einsum("ek,ek->e", pu, qi)
    diff = vals - pred
    w = valid
    gu = (-2.0 * (w * diff)[:, None] * qi
          + 2.0 * params.u_reg * valid[:, None] * pu) * mu
    gi = (-2.0 * (w * diff)[:, None] * pu
          + 2.0 * params.i_reg * valid[:, None] * qi) * mi
    exp_u, exp_i = u0.copy(), i0.copy()
    np.add.at(exp_u, rows, -params.learn_rate * gu)
    np.add.at(exp_i, cols, -params.learn_rate * gi)

    np.testing.assert_allclose(np.asarray(st1.u_fac), exp_u,
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st1.i_fac), exp_i,
                               atol=2e-6, rtol=1e-5)


def test_mf_loc_zero_invariant_and_quality(small):
    """Tail entities' upper fac_dim/2 dims stay EXACTLY zero through
    training (zero init + per-side mask), and the model still learns."""
    data, iu, ii, uf, itf = small
    p = Params(fac_dim=6, u_reg=0.01, i_reg=0.01, learn_rate=0.05,
               max_iter=25, seed=1, disp_iter=1000, batch_size=256)
    rep, model, ev, _ = train_model(data, p, algo="mf_loc",
                                    mf_method="sgd",
                                    log_fn=lambda s: None)
    uF = np.asarray(rep.state.u_fac)
    iF = np.asarray(rep.state.i_fac)
    tail_u = np.asarray(model.rank_u) < p.fac_dim
    tail_i = np.asarray(model.rank_i) < p.fac_dim
    assert tail_u.any() and tail_i.any()
    half = p.fac_dim // 2
    assert np.all(uF[tail_u, half:] == 0.0)
    assert np.all(iF[tail_i, half:] == 0.0)
    # head entities DO use the upper dims
    assert np.any(uF[~tail_u, half:] != 0.0)
    # learned something
    init_val = ev.rmse(model.eval_view(
        init_state(p, data.n_users, data.n_items)), "val")
    assert rep.best_metric < init_val


def test_side_gate_freezes_one_side(small):
    """gate_u = none: one epoch leaves u_fac exactly unchanged while
    i_fac moves (updateModelInval's per-side skip)."""
    data, iu, ii, uf, itf = small
    p = Params(fac_dim=4, u_reg=0.01, i_reg=0.01, learn_rate=0.05,
               seed=2, batch_size=256)
    model = ModelSideGatedMF(p, data.n_users, data.n_items,
                             np.zeros(data.n_users, bool),
                             np.ones(data.n_items, bool))
    solver = SGDSolver(model, p, data.train_mat, iu, ii)
    s0 = init_state(p, data.n_users, data.n_items)
    u_before = np.asarray(s0.u_fac).copy()
    i_before = np.asarray(s0.i_fac).copy()
    s1 = solver.epoch(jax.tree_util.tree_map(jnp.copy, s0),
                      p.learn_rate, jax.random.PRNGKey(7))
    assert np.array_equal(np.asarray(s1.u_fac), u_before)
    assert not np.array_equal(np.asarray(s1.i_fac), i_before)


def test_mf_freq_curriculum(small):
    data, iu, ii, uf, itf = small
    p = Params(fac_dim=4, u_reg=0.01, i_reg=0.01, learn_rate=0.05,
               max_iter=4, seed=1, disp_iter=1000, batch_size=256)
    rep, model, ev, _ = train_model(data, p, algo="mf_freq",
                                    mf_method="auto",
                                    log_fn=lambda s: None)
    assert np.isfinite(rep.best_metric)
    init_val = ev.rmse(model.eval_view(
        init_state(p, data.n_users, data.n_items)), "val")
    assert rep.best_metric < init_val
    # five stages, each <= max_iter epochs, epoch ids strictly increasing
    epochs = [el.epoch for el in rep.history]
    assert epochs == sorted(epochs)
    assert epochs[-1] < 5 * p.max_iter
    # the final stage's model trains every valid entity
    assert np.all(np.asarray(model._gate_u)[~iu] == 1.0)


def test_tmf_bias_trains_and_objective(small):
    data, iu, ii, uf, itf = small
    user_freq, item_freq = freq.row_col_freq(data.train_mat)
    p = Params(fac_dim=4, u_reg=0.01, i_reg=0.01, learn_rate=0.05,
               max_iter=25, seed=1, rho_rms=1.0, alpha=0.0,
               disp_iter=1000, batch_size=256)
    rep, model, ev, _ = train_model(data, p, algo="tmf_bias",
                                    mf_method="sgd",
                                    log_fn=lambda s: None)
    assert isinstance(model, ModelDropoutSigmoidBias)
    # biases moved and enter the eval view with mu == 0
    # (othersrc/modelDropoutMFBias.cpp:3-23: dot + uBias + iBias, no mu)
    view = model.eval_view(rep.state)
    assert np.array_equal(np.asarray(view.u_bias),
                          np.asarray(rep.state.u_bias))
    assert float(view.mu) == 0.0
    s0 = init_state(p, data.n_users, data.n_items)
    assert not np.array_equal(np.asarray(rep.state.u_bias),
                              np.asarray(s0.u_bias))
    init_val = ev.rmse(model.eval_view(s0), "val")
    assert rep.best_metric < init_val
    # objective = SSE + factor reg + bias reg (modelDropoutMFBias.cpp:77)
    st = rep.state
    obj = ev.objective(view, st, use_factors=True, use_bias=True)
    obj_nf = ev.objective(view, st, use_factors=False, use_bias=False)
    vu, vi = ~iu, ~ii
    manual = (p.u_reg * float(np.sum(
                  np.asarray(st.u_fac)[vu] ** 2))
              + p.i_reg * float(np.sum(np.asarray(st.i_fac)[vi] ** 2))
              + p.u_reg * float(np.sum(np.asarray(st.u_bias)[vu] ** 2))
              + p.i_reg * float(np.sum(np.asarray(st.i_bias)[vi] ** 2)))
    assert obj - obj_nf == pytest.approx(manual, rel=1e-4)


def test_side_gated_guards(small):
    data, iu, ii, uf, itf = small
    p = Params(fac_dim=4, max_iter=2, disp_iter=1000)
    with pytest.raises(ValueError, match="per-side|coordinate"):
        train_model(data, p, algo="mf_loc", mf_method="als",
                    log_fn=lambda s: None)
    with pytest.raises(ValueError, match="per-side"):
        train_model(data, p, algo="mf_loc", mf_method="blocksgd",
                    log_fn=lambda s: None)
    with pytest.raises(ValueError, match="resume"):
        train_model(data, p, algo="mf_freq", mf_method="sgd",
                    resume=True, log_fn=lambda s: None)


# ---- othersrc ModelDropoutMF (soft three-tier adaptive rank) ---------

def test_adaptive_rank_map_quartiles():
    from matfac_tpu.models.longtail import adaptive_rank_map
    freq = np.array([100, 90, 80, 70, 60, 50, 40, 30, 20, 10, 5, 1])
    r = adaptive_rank_map(freq, 16)
    # descending-frequency quartiles -> 16, 8, 4, 2
    assert list(r) == [16, 16, 16, 8, 8, 8, 4, 4, 4, 2, 2, 2]
    # floor at 1
    r2 = adaptive_rank_map(freq, 4)
    assert list(r2) == [4, 4, 4, 2, 2, 2, 1, 1, 1, 1, 1, 1]


def test_dropoutmf_soft_eval_oracle(small):
    """The width-doubled eval view must reproduce the reference's
    three-tier estRating (othersrc/modelDropoutMF.cpp:4-20) exactly."""
    from matfac_tpu.models.longtail import ModelAdaptiveDropoutMF
    data, iu, ii, uf, itf = small
    user_freq, item_freq = freq.row_col_freq(data.train_mat)
    p = Params(fac_dim=16, seed=5, rho_rms=0.3)
    model = ModelAdaptiveDropoutMF(p, data.n_users, data.n_items,
                                   user_freq, item_freq)
    state = init_state(p, data.n_users, data.n_items)
    view = model.eval_view(state)
    assert view.u_fac.shape == (data.n_users, 2 * p.fac_dim)

    rng = np.random.default_rng(0)
    us = rng.integers(0, data.n_users, 64)
    its = rng.integers(0, data.n_items, 64)
    uF = np.asarray(state.u_fac, np.float64)
    iF = np.asarray(state.i_fac, np.float64)
    ru = np.asarray(model.rank_u)
    ri = np.asarray(model.rank_i)
    cand = model.cand
    got = np.einsum("ek,ek->e", np.asarray(view.u_fac, np.float64)[us],
                    np.asarray(view.i_fac, np.float64)[its])
    for e, (u, i) in enumerate(zip(us, its)):
        min_rank = min(ru[u], ri[i])
        rat = 0.0
        for k in range(cand):
            rat += uF[u, k] * iF[i, k]
        for k in range(cand, min_rank):
            rat += 0.5 * uF[u, k] * iF[i, k]
        for k in range(min_rank, p.fac_dim):
            rat += 0.15 * uF[u, k] * iF[i, k]
        assert got[e] == pytest.approx(rat, rel=1e-4, abs=1e-7)


def test_dropoutmf_update_rank_sampling(small):
    """mode semantics of the sampled update rank."""
    from matfac_tpu.models.longtail import ModelAdaptiveDropoutMF
    data, iu, ii, uf, itf = small
    user_freq, item_freq = freq.row_col_freq(data.train_mat)
    p = Params(fac_dim=16, seed=5, rho_rms=0.3)
    u_idx = jnp.asarray(np.random.default_rng(1).integers(
        0, data.n_users, 4096))
    i_idx = jnp.asarray(np.random.default_rng(2).integers(
        0, data.n_items, 4096))
    key = jax.random.PRNGKey(3)

    m = ModelAdaptiveDropoutMF(p, data.n_users, data.n_items,
                               user_freq, item_freq, mode="prob")
    mask = np.asarray(m.update_rank_mask(key, u_idx, i_idx))
    ranks = mask.sum(axis=1).astype(int)
    pair = np.minimum(np.asarray(m.rank_u)[u_idx],
                      np.asarray(m.rank_i)[i_idx])
    # every rank is either the pair rank or the lifted full rank
    assert np.all((ranks == pair) | (ranks == p.fac_dim))
    low = pair < p.fac_dim
    lift_frac = np.mean(ranks[low] == p.fac_dim)
    assert 0.2 < lift_frac < 0.4          # ~rho = 0.3

    m3 = ModelAdaptiveDropoutMF(p, data.n_users, data.n_items,
                                user_freq, item_freq,
                                mode="onlyordered")
    ranks3 = np.asarray(m3.update_rank_mask(key, u_idx, i_idx)
                        ).sum(axis=1).astype(int)
    assert set(np.unique(ranks3)) <= {m3.cand, p.fac_dim}
    frac_cap = np.mean(ranks3 == m3.cand)
    assert 0.4 < frac_cap < 0.6           # prob 0.5 cap

    m2 = ModelAdaptiveDropoutMF(p, data.n_users, data.n_items,
                                user_freq, item_freq, mode="ordered")
    ranks2 = np.asarray(m2.update_rank_mask(key, u_idx, i_idx)
                        ).sum(axis=1).astype(int)
    ok = ((ranks2 == m2.cand) | (ranks2 == pair)
          | (ranks2 == p.fac_dim)
          | (ranks2 == np.minimum(pair, m2.cand)))
    assert np.all(ok)


def test_dropoutmf_trains_and_guards(small):
    data, iu, ii, uf, itf = small
    p = Params(fac_dim=8, u_reg=0.01, i_reg=0.01, learn_rate=0.05,
               max_iter=25, seed=1, rho_rms=0.3, disp_iter=1000,
               batch_size=256)
    rep, model, ev, _ = train_model(data, p, algo="dropoutmf",
                                    mf_method="auto",
                                    log_fn=lambda s: None)
    assert np.isfinite(rep.best_metric)
    init_val = ev.rmse(model.eval_view(
        init_state(p, data.n_users, data.n_items)), "val")
    assert rep.best_metric < init_val
    # sampled ranks cannot stage into the block engines / coord family
    with pytest.raises(ValueError, match="sampled ranks|static"):
        train_model(data, p, algo="dropoutmf", mf_method="blocksgd",
                    log_fn=lambda s: None)
    with pytest.raises(ValueError, match="coordinate"):
        train_model(data, p, algo="dropoutmf_ordered", mf_method="als",
                    log_fn=lambda s: None)
