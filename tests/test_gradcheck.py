"""Finite-difference gradient checks (the gradCheck analog,
modelMFBPR.cpp:5-43; SURVEY §4 item 1 "update rules vs
closed-form/finite-difference").

The engines' update rules are hand-written gradients; these tests
differentiate the documented per-example losses NUMERICALLY (central
differences in float64) and pin the engine gradient functions against
them:

  * bpr_pair_terms — the pairwise loss used by BOTH BPRSolver scan
    bodies (plain + rank-masked hybrid),
  * block_sgd_kernel._batch_update — the weighted/masked pointwise
    loss shared by the one-hot engines (and by equivalence the dense
    engines, tests/test_dense_block.py).
"""

import numpy as np

import jax.numpy as jnp

from matfac_tpu.ops.block_sgd_kernel import _batch_update
from matfac_tpu.solvers.bpr import bpr_pair_terms


def _fd_grad(loss_fn, x, h=1e-5):
    """Central finite differences of scalar loss_fn at x [.., d]."""
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        idx = it.multi_index
        xp = x.copy()
        xm = x.copy()
        xp[idx] += h
        xm[idx] -= h
        g[idx] = (loss_fn(xp) - loss_fn(xm)) / (2 * h)
        it.iternext()
    return g


def _bpr_loss(pu, qp, qn, w, m, u_reg, i_reg):
    """The documented per-triple loss (solvers/bpr.bpr_pair_terms)."""
    pm = pu * m
    r = np.sum(pm * qp, axis=1) - np.sum(pm * qn, axis=1)
    data = np.logaddexp(0.0, -r)
    reg = (u_reg * np.sum(m * pu ** 2, axis=1)
           + i_reg * (np.sum(m * qp ** 2, axis=1)
                      + np.sum(m * qn ** 2, axis=1)))
    return float(np.sum(w * (data + reg)))


def _check_bpr(masked):
    rng = np.random.default_rng(0 if masked else 1)
    B, k = 5, 6
    pu = rng.normal(size=(B, k)) * 0.5
    qp = rng.normal(size=(B, k)) * 0.5
    qn = rng.normal(size=(B, k)) * 0.5
    w = np.array([1.0, 0.0, 1.0, 1.0, 1.0])   # one dropped pair
    if masked:
        lam = rng.integers(1, k + 1, B)
        m = (np.arange(k)[None, :] < lam[:, None]).astype(np.float64)
        mj = jnp.asarray(m.astype(np.float32))
    else:
        m = np.ones((B, k))
        mj = None
    u_reg, i_reg = 0.013, 0.021
    gu, gp, gn, r_uij, loss = bpr_pair_terms(
        jnp.asarray(pu.astype(np.float32)),
        jnp.asarray(qp.astype(np.float32)),
        jnp.asarray(qn.astype(np.float32)),
        jnp.asarray(w.astype(np.float32)), mj, u_reg, i_reg)
    # reported loss = data term only
    pm = pu * m
    r = np.sum(pm * qp, axis=1) - np.sum(pm * qn, axis=1)
    np.testing.assert_allclose(float(loss),
                               float(np.sum(w * np.logaddexp(0, -r))),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r_uij), r, rtol=1e-4,
                               atol=1e-6)
    L = lambda pu_, qp_, qn_: _bpr_loss(pu_, qp_, qn_, w, m, u_reg,
                                        i_reg)
    np.testing.assert_allclose(
        np.asarray(gu), _fd_grad(lambda x: L(x, qp, qn), pu),
        rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gp), _fd_grad(lambda x: L(pu, x, qn), qp),
        rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gn), _fd_grad(lambda x: L(pu, qp, x), qn),
        rtol=2e-3, atol=1e-5)


def test_bpr_gradcheck_plain():
    _check_bpr(masked=False)


def test_bpr_gradcheck_rank_masked():
    _check_bpr(masked=True)


def _sgd_loss(U, I, u, i, r, w, m, u_reg, i_reg):
    """Per-example weighted/masked pointwise loss whose gradient
    _batch_update applies (modelMF.cpp:83-105 per-occurrence reg;
    IFWMF weight modelInvPopMF.cpp:163-178 multiplies the DATA term
    only; TMF mask modelDropoutSigmoid.cpp:158-191 truncates both the
    prediction and the reg dims)."""
    pu = U[u]
    qi = I[i]
    pred = np.sum(pu * m * qi, axis=1)
    vmask = (w > 0).astype(np.float64)
    data = w * (r - pred) ** 2
    reg = vmask * (u_reg * np.sum(m * pu ** 2, axis=1)
                   + i_reg * np.sum(m * qi ** 2, axis=1))
    return float(np.sum(data + reg))


def test_sgd_batch_update_gradcheck():
    """(U0 - U1)/lr from _batch_update == FD gradient of the pointwise
    loss (unique entities per batch -> no collision aggregation)."""
    rng = np.random.default_rng(3)
    bu, bi, k, B = 8, 7, 5, 6
    u = rng.permutation(bu)[:B].astype(np.int32)
    i = rng.permutation(bi)[:B].astype(np.int32)
    r = rng.normal(size=B)
    w = np.array([1.0, 0.7, 0.0, 1.3, 1.0, 0.4])  # IFWMF-style weights
    lam = rng.integers(1, k + 1, B)
    m = (np.arange(k)[None, :] < lam[:, None]).astype(np.float64)
    U0 = rng.normal(size=(bu, k)) * 0.4
    I0 = rng.normal(size=(bi, k)) * 0.4
    u_reg, i_reg, lr = 0.017, 0.027, 1e-3
    U1, I1 = _batch_update(
        jnp.asarray(U0.astype(np.float32)),
        jnp.asarray(I0.astype(np.float32)),
        jnp.asarray(u), jnp.asarray(i),
        jnp.asarray(r.astype(np.float32)),
        jnp.asarray(w.astype(np.float32)), None, None,
        jnp.asarray(lam.astype(np.int32)), jnp.float32(lr), k, bu, bi,
        u_reg, i_reg, False, True, jnp.float32)
    gU = (U0 - np.asarray(U1, np.float64)) / lr
    gI = (I0 - np.asarray(I1, np.float64)) / lr
    np.testing.assert_allclose(
        gU, _fd_grad(lambda x: _sgd_loss(x, I0, u, i, r, w, m, u_reg,
                                         i_reg), U0),
        rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        gI, _fd_grad(lambda x: _sgd_loss(U0, x, u, i, r, w, m, u_reg,
                                         i_reg), I0),
        rtol=2e-3, atol=2e-4)
