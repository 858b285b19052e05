"""Mesh-sharded eval: HR/ARHR/topk/RMSE over the virtual 8-device mesh
must be score-identical to the single-device engines (SURVEY §7 "Eval
cost"; reference hot loop model.cpp:1158-1211). User blocks shard the
catalog scan, COO streams shard the SSE reductions; HR/ARHR credits are
integer-valued so equality is exact, RMSE is equal up to f32 summation
order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matfac_tpu.config import Params
from matfac_tpu.data.csr import RatingMatrix
from matfac_tpu.eval.metrics import Evaluator
from matfac_tpu.eval.ranking import CatalogScorer
from matfac_tpu.models.base import ModelMF, init_state
from matfac_tpu.parallel.mesh import make_mesh


class _Bundle:
    def __init__(self, train, test, val, n_users, n_items):
        self.train_mat, self.test_mat, self.val_mat = train, test, val
        self.n_users, self.n_items = n_users, n_items


def _setup(n_users=600, n_items=300, seed=3):
    train, test, val = _split(n_users, n_items, seed)
    inval_u = np.zeros(n_users, bool)
    inval_i = np.zeros(n_items, bool)
    # mark a few entities invalid so the filtering path is exercised
    inval_u[::97] = True
    inval_i[::83] = True
    params = Params(fac_dim=8, seed=seed)
    model = ModelMF(params, n_users, n_items)
    state = init_state(params, n_users, n_items)
    view = model.eval_view(state)
    return train, test, inval_u, inval_i, params, view


def _split(n_users, n_items, seed):
    rng = np.random.default_rng(seed)
    nnz = n_users * 12
    r = rng.integers(0, n_users, nnz)
    c = rng.integers(0, n_items, nnz)
    v = rng.uniform(1, 5, nnz).astype(np.float32)
    # dedupe (CSR add collapses dups otherwise)
    key = r * n_items + c
    _, idx = np.unique(key, return_index=True)
    r, c, v = r[idx], c[idx], v[idx]
    n = len(r)
    cut, cut2 = int(n * 0.8), int(n * 0.9)
    perm = rng.permutation(n)

    def mat(sl):
        return RatingMatrix.from_coo(r[sl], c[sl], v[sl],
                                     n_users, n_items)

    return (mat(perm[:cut]), mat(perm[cut:cut2]), mat(perm[cut2:]))


@pytest.fixture(scope="module")
def setup():
    return _setup()


def test_sharded_topk_matches_single(setup):
    train, test, iu, ii, params, view = setup
    mesh = make_mesh()
    kw = dict(user_block=64, item_block=128)
    sc0 = CatalogScorer(train, iu, ii, 600, 300, **kw)
    sc1 = CatalogScorer(train, iu, ii, 600, 300, mesh=mesh, **kw)
    s0, i0 = sc0.topk(view, 10)
    s1, i1 = sc1.topk(view, 10)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=0, atol=0)


def test_sharded_hr_arhr_match(setup):
    train, test, iu, ii, params, view = setup
    mesh = make_mesh()
    kw = dict(user_block=64, item_block=128)
    sc0 = CatalogScorer(train, iu, ii, 600, 300, **kw)
    sc1 = CatalogScorer(train, iu, ii, 600, 300, mesh=mesh, **kw)
    assert sc0.hit_rate(view, test, 10) == sc1.hit_rate(view, test, 10)
    # 1/(rank+1) credits are f32; shard partial sums reorder the
    # reduction, so ARHR agrees to rounding rather than bit-exactly
    assert abs(sc0.arhr(view, test, 50)
               - sc1.arhr(view, test, 50)) < 1e-6


def test_sharded_padded_row_fallback(setup):
    """The non-COO (padded-row) exclusion path must also shard: force
    it by making the COO skew guard reject."""
    train, test, iu, ii, params, view = setup
    mesh = make_mesh()
    kw = dict(user_block=64, item_block=128)
    sc0 = CatalogScorer(train, iu, ii, 600, 300, **kw)
    sc1 = CatalogScorer(train, iu, ii, 600, 300, mesh=mesh, **kw)
    sc0._use_coo = False
    sc1._use_coo = False
    s0, i0 = sc0.topk(view, 10)
    s1, i1 = sc1.topk(view, 10)
    np.testing.assert_array_equal(i0, i1)
    assert sc0.hit_rate(view, test, 10) == sc1.hit_rate(view, test, 10)


def test_sharded_rmse_objective_match(setup):
    train, test, iu, ii, params, view = setup
    mesh = make_mesh()
    data = _Bundle(train, test, None, 600, 300)
    ev0 = Evaluator(data, iu, ii, params)
    ev1 = Evaluator(data, iu, ii, params, mesh=mesh)
    for which in ("train", "test"):
        r0 = ev0.rmse(view, which)
        r1 = ev1.rmse(view, which)
        assert abs(r0 - r1) < 1e-6 * max(1.0, abs(r0))
    state = init_state(params, 600, 300)
    mview = ModelMF(params, 600, 300).eval_view(state)
    o0 = ev0.objective(mview, state)
    o1 = ev1.objective(mview, state)
    assert abs(o0 - o1) < 1e-5 * max(1.0, abs(o0))


def test_sharded_weighted_objective_match(setup):
    train, test, iu, ii, params, view = setup
    mesh = make_mesh()
    data = _Bundle(train, test, None, 600, 300)
    ev0 = Evaluator(data, iu, ii, params)
    ev1 = Evaluator(data, iu, ii, params, mesh=mesh)
    state = init_state(params, 600, 300)
    # per-entry weights derived from the staged rows (stays aligned
    # with each evaluator's own padding)
    w0 = 1.0 / (1.0 + ev0.train_coo.rows.astype(jnp.float32) % 7)
    w1 = 1.0 / (1.0 + ev1.train_coo.rows.astype(jnp.float32) % 7)
    o0 = ev0.objective(view, state, weights=w0)
    o1 = ev1.objective(view, state, weights=w1)
    assert abs(o0 - o1) < 1e-5 * max(1.0, abs(o0))


def test_sharded_2d_mesh(setup):
    """A 2-D (4, 2) training mesh shards eval over all 8 devices."""
    train, test, iu, ii, params, view = setup
    mesh = make_mesh((4, 2), ("u", "i"))
    kw = dict(user_block=64, item_block=128)
    sc0 = CatalogScorer(train, iu, ii, 600, 300, **kw)
    sc1 = CatalogScorer(train, iu, ii, 600, 300, mesh=mesh, **kw)
    assert sc0.hit_rate(view, test, 10) == sc1.hit_rate(view, test, 10)
    data = _Bundle(train, test, None, 600, 300)
    ev1 = Evaluator(data, iu, ii, params, mesh=mesh)
    ev0 = Evaluator(data, iu, ii, params)
    assert abs(ev0.rmse(view, "test") - ev1.rmse(view, "test")) < 1e-6
