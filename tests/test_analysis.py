"""Analysis-layer tests: SVD init, PPR, confidence curves, top-N recall,
model agreement, quartile reports, incremental-rank model."""

import numpy as np
import pytest

import jax.numpy as jnp

from matfac_tpu.analysis.compare import (jaccard_accuracy_correlation,
                                         model_agreement)
from matfac_tpu.analysis.confidence import (confidence_curve,
                                            ensemble_conf_scores,
                                            rmse_curve)
from matfac_tpu.analysis.topn import top_n_rec
from matfac_tpu.analysis.top_bucket import (fuse_scores,
                                            pred_samp_users_rmse,
                                            top_bucket_rmse_curve)
from matfac_tpu.config import Params
from matfac_tpu.data import io as mfio
from matfac_tpu.data.csr import RatingMatrix
from matfac_tpu.data.synthetic import low_rank_ratings, synthetic_data
from matfac_tpu.eval.metrics import Evaluator
from matfac_tpu.eval.quartile import quartile_report
from matfac_tpu.models.base import EvalView, ModelMF, init_state
from matfac_tpu.ops.ppr import PPREngine
from matfac_tpu.ops.svd_init import svd_init
from matfac_tpu.utils import freq


def make_view(uf, vf):
    n_u, n_i = uf.shape[0], vf.shape[0]
    return EvalView(jnp.asarray(uf), jnp.asarray(vf),
                    jnp.zeros(n_u), jnp.zeros(n_i), jnp.float32(0))


def test_svd_init_matches_dense_svd():
    """The randomized SVD must match numpy's exact SVD of the same
    (zero-filled) sparse matrix — which is what SVDLIBC factorizes
    (svdFrmsvdlib.cpp:69-134)."""
    mat, uf, vf = low_rank_ratings(80, 60, 3, density=0.9, seed=1,
                                   noise=0.0)
    rank = 5
    u, v, s = svd_init(mat, rank=rank, pure_svd=True, n_iter=8)
    dense = mat.to_dense()
    ue, se, vte = np.linalg.svd(dense, full_matrices=False)
    np.testing.assert_allclose(s, se[:rank], rtol=1e-3)
    # reconstruction parity at rank
    recon = u @ v.T
    recon_exact = ue[:, :rank] * se[:rank] @ vte[:rank]
    np.testing.assert_allclose(recon, recon_exact, atol=2e-2)
    # singular values descending
    assert (np.diff(s) <= 1e-4).all()


def test_svd_init_sparsity_mode():
    mat, _, _ = low_rank_ratings(40, 30, 3, density=0.5, seed=2)
    u, v, s = svd_init(mat, rank=4, sparsity_only=True)
    assert u.shape == (40, 4) and v.shape == (30, 4)
    assert np.isfinite(s).all()


def test_ppr_stationary_distribution():
    # ring graph: uniform stationary distribution for uniform restart
    n = 16
    rows = np.arange(n)
    cols = (rows + 1) % n
    g = RatingMatrix.from_coo(rows, cols, np.ones(n, np.float32), n, n)
    eng = PPREngine(g)
    pr = np.asarray(eng.global_pagerank(lamda=0.85))
    np.testing.assert_allclose(pr, pr[0], rtol=1e-3)
    np.testing.assert_allclose(pr.sum(), 1.0, rtol=1e-3)


def test_ppr_restart_locality():
    # two disjoint cliques: restart mass in clique A stays in clique A
    rows, cols = [], []
    for a in range(4):
        for b in range(4):
            if a != b:
                rows += [a, a + 4]
                cols += [b, b + 4]
    g = RatingMatrix.from_coo(np.array(rows), np.array(cols),
                              np.ones(len(rows), np.float32), 8, 8)
    eng = PPREngine(g)
    restart = np.zeros(8, np.float32)
    restart[0] = 1.0
    pr = np.asarray(eng.ppr(jnp.asarray(restart)))
    assert pr[:4].sum() > 0.99
    assert pr[4:].sum() < 0.01


def test_ensemble_conf_and_curves():
    rng = np.random.default_rng(0)
    n_u, n_i, k = 30, 20, 3
    base_u = rng.standard_normal((n_u, k)).astype(np.float32)
    base_v = rng.standard_normal((n_i, k)).astype(np.float32)
    views = [make_view(base_u + 0.01 * i * rng.standard_normal(
        (n_u, k)).astype(np.float32), base_v) for i in range(4)]
    rows = rng.integers(0, n_u, 200)
    cols = rng.integers(0, n_i, 200)
    scores = ensemble_conf_scores(views, rows, cols)
    assert scores.shape == (200,)
    assert (scores > 0).all()  # stds are nonzero here

    actual = rng.standard_normal(200)
    pred = actual + rng.standard_normal(200) * np.linspace(0.1, 2, 200)
    # use -noise magnitude as score: high score = low error
    sc = -np.linspace(0.1, 2, 200)
    curve = rmse_curve(sc, actual, pred, 4)
    assert (np.diff(curve) > 0).all()  # RMSE grows as confidence drops
    cc = confidence_curve(sc, actual, pred, 4, alpha=0.05)
    assert (np.diff(cc) > 0).all()


def test_top_n_rec_model_scorer():
    """Preference-structured data: each user's positives are their
    top-scoring items under known factors — the model scorer must then
    rank the held-out positive above sampled negatives."""
    from matfac_tpu.data.dataset import Data

    rng = np.random.default_rng(8)
    n_u, n_i, k, per_user = 50, 60, 3, 10
    uf = rng.standard_normal((n_u, k)).astype(np.float32)
    vf = rng.standard_normal((n_i, k)).astype(np.float32)
    scores = uf @ vf.T
    rows_tr, cols_tr, rows_te, cols_te = [], [], [], []
    for u in range(n_u):
        top = np.argsort(-scores[u])[:per_user]
        rows_te.append(u)
        cols_te.append(top[rng.integers(0, per_user)])
        for it in top:
            if it != cols_te[-1]:
                rows_tr.append(u)
                cols_tr.append(it)
    tr = RatingMatrix.from_coo(np.array(rows_tr), np.array(cols_tr),
                               np.ones(len(rows_tr), np.float32), n_u, n_i)
    te = RatingMatrix.from_coo(np.array(rows_te), np.array(cols_te),
                               np.ones(n_u, np.float32), n_u, n_i)
    iu, ii = freq.invalid_users_items(tr, n_u, n_i)
    gt = make_view(uf, vf)
    rep = top_n_rec(gt, tr, te, iu, ii, n=10, n_samp_users=40,
                    n_negatives=30, seed=1)
    rand = make_view(
        np.asarray(init_state(Params(fac_dim=3), n_u, n_i).u_fac),
        np.asarray(init_state(Params(fac_dim=3), n_u, n_i,
                              seed=9).i_fac))
    rep_rand = top_n_rec(rand, tr, te, iu, ii, n=10, n_samp_users=40,
                         n_negatives=30, seed=1)
    assert rep.recall["model"] > 0.9
    assert rep.recall["model"] > rep_rand.recall["model"] + 0.3
    assert rep.n_head_items + rep.n_tail_items == rep.n_test_items


def test_model_agreement_and_jaccard():
    data, uf, vf = synthetic_data(n_users=50, n_items=40, k=3,
                                  density=0.3, seed=4, noise=0.05)
    iu, ii = freq.invalid_users_items(data.train_mat, data.n_users,
                                      data.n_items)
    rng = np.random.default_rng(0)
    views = [make_view(uf + 0.05 * rng.standard_normal(uf.shape
                                                       ).astype(np.float32),
                       vf) for _ in range(3)]
    ag = model_agreement(views, data.test_mat, iu, ii)
    assert ag["rmse_per_model"].shape == (3, data.n_items)
    assert (ag["pred_var"] >= 0).all()
    jac = mfio.item_jaccard_sim(data.train_mat, top_k=5)
    corr = jaccard_accuracy_correlation(ag, jac)
    assert -1.0 <= corr <= 1.0


def test_top_bucket_curves():
    data, uf, vf = synthetic_data(n_users=40, n_items=30, k=3,
                                  density=0.4, seed=5, noise=0.02)
    iu, ii = freq.invalid_users_items(data.train_mat, data.n_users,
                                      data.n_items)
    orig = make_view(uf, vf)
    noisy = make_view(uf + 0.1, vf)
    items = np.arange(30)
    curve = top_bucket_rmse_curve(orig, noisy, 0, items,
                                  np.random.default_rng(0).random(30), 5)
    assert curve.shape == (5,)
    fused = fuse_scores([np.ones(30), np.arange(30, dtype=float)], "avg")
    assert fused.shape == (30,)
    curves = pred_samp_users_rmse(
        orig, noisy, data.train_mat, iu, ii,
        {"freq": lambda u, it: data.train_mat.col_degrees()[it].astype(
            float)},
        n_users=10, n_buckets=5)
    assert "freq" in curves and curves["freq"].shape == (5,)


def test_quartile_report_runs():
    data, _, _ = synthetic_data(n_users=60, n_items=40, k=3,
                                density=0.3, seed=3, power_law=0.8)
    params = Params(fac_dim=3)
    iu, ii = freq.invalid_users_items(data.train_mat, data.n_users,
                                      data.n_items)
    ev = Evaluator(data, iu, ii, params)
    model = ModelMF(params, data.n_users, data.n_items)
    state = init_state(params, data.n_users, data.n_items)
    rep = quartile_report(model.eval_view(state), data, ev, iu, ii)
    assert "Test RMSE by quartile" in rep
    assert "Users Part" in rep


def test_incremental_rank_training():
    from matfac_tpu.data.dataset import Data
    from matfac_tpu.data.io import split_train_test_val
    from matfac_tpu.models.increment import train_increment

    mat, _, _ = low_rank_ratings(60, 50, 4, density=0.5, seed=6,
                                 noise=0.05, nonneg=True)
    tr, te, va = split_train_test_val(mat, 0.15, 0.15, seed=2)
    # probe = val matrix in graph_mat slot (reference uses graphMat)
    data = Data(train_mat=tr, test_mat=te, val_mat=va, graph_mat=va)
    params = Params(fac_dim=12, u_reg=0.01, i_reg=0.01, learn_rate=0.005,
                    seed=1, batch_size=128)
    iu, ii = freq.invalid_users_items(tr, data.n_users, data.n_items)
    rep, model = train_increment(data, params, iu, ii, max_iter=40,
                                 log_fn=lambda s: None)
    # ranks grew beyond the initial 1 for at least some entities
    assert rep.rank_u.max() > 1 or rep.rank_i.max() > 1
    assert rep.rank_u.max() <= params.fac_dim
    # model eval view truncates by rank
    view = model.eval_view(rep.state)
    assert np.isfinite(np.asarray(view.u_fac)).all()


def test_pair_score_providers():
    from matfac_tpu.analysis.confidence import (freq_pair_scores,
                                                gpr_pair_scores,
                                                optimal_pair_scores,
                                                ppr_pair_scores,
                                                score_bucket_rmses)
    from matfac_tpu.data import io as mfio

    data, uf, vf = synthetic_data(n_users=40, n_items=30, k=3,
                                  density=0.4, seed=9, noise=0.05)
    graph = mfio.item_cosine_sim(data.train_mat, top_k=5)
    eng = PPREngine(graph)
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 40, 50)
    cols = rng.integers(0, 30, 50)
    orig = make_view(uf, vf)
    full = make_view(uf + 0.2 * rng.standard_normal(uf.shape
                                                    ).astype(np.float32),
                     vf)
    gpr = gpr_pair_scores(eng, cols)
    assert gpr.shape == (50,) and (gpr >= 0).all()
    ppr = ppr_pair_scores(eng, data.train_mat, rows, cols)
    assert ppr.shape == (50,)
    fr = freq_pair_scores(data.train_mat.col_degrees(), cols)
    assert (fr >= 0).all()
    op = optimal_pair_scores(orig, full, rows, cols)
    # oracle ordering yields monotonically nondecreasing bucket RMSEs
    curve = score_bucket_rmses(orig, full, rows, cols, op, n_buckets=5)
    assert (np.diff(curve) >= -1e-6).all()


def test_distributed_helpers():
    from matfac_tpu.parallel.distributed import (host_local_ratings,
                                                 host_user_range)
    data, _, _ = synthetic_data(n_users=50, n_items=30, k=3, density=0.3,
                                seed=1)
    total = 0
    for s in range(4):
        lo, hi = host_user_range(50, 4, s)
        r, c, v = host_local_ratings(data.train_mat, 50, 4, s)
        assert ((r >= lo) & (r < hi)).all()
        total += len(r)
    assert total == data.train_mat.nnz


def test_io_variants_and_spot_rec(tmp_path):
    from matfac_tpu.analysis.topn import spot_rec
    from matfac_tpu.data.io import (read_csr, tail_test_mat,
                                    write_csr_with_model_values)

    data, uf, vf = synthetic_data(n_users=30, n_items=25, k=3,
                                  density=0.4, seed=2, nonneg=True)
    p = str(tmp_path / "pred.csr")
    write_csr_with_model_values(data.train_mat, uf, vf, p)
    back = read_csr(p)
    r, c, _ = data.train_mat.to_coo()
    np.testing.assert_allclose(
        back.to_dense()[r, c],
        np.einsum("ek,ek->e", uf[r], vf[c]), rtol=1e-3, atol=1e-3)

    head = freq.head_items(data.train_mat, 0.5)
    tail = tail_test_mat(data.test_mat, head, max_ratings=10)
    assert tail.nnz <= 10
    assert not head[tail.to_coo()[1]].any()

    iu, ii = freq.invalid_users_items(data.train_mat, data.n_users,
                                      data.n_items)
    reps = spot_rec({"gt": make_view(uf, vf)}, data.train_mat,
                    data.test_mat, iu, ii, n_values=(1, 5),
                    n_samp_users=10, n_negatives=15)
    assert set(reps) == {"gt@1", "gt@5"}
    assert reps["gt@5"].recall["model"] >= reps["gt@1"].recall["model"]


def test_analysis_drivers():
    from matfac_tpu.analysis.drivers import (compare_ppr_gpr,
                                             freq_rmse_sweep,
                                             sample_top_n_analysis)
    from matfac_tpu.ops.svd_init import svd_init

    data, uf, vf = synthetic_data(n_users=50, n_items=40, k=3,
                                  density=0.35, seed=6, noise=0.05,
                                  power_law=0.7, nonneg=True)
    params = Params(fac_dim=3)
    iu, ii = freq.invalid_users_items(data.train_mat, data.n_users,
                                      data.n_items)
    ev = Evaluator(data, iu, ii, params)
    orig = make_view(uf, vf)
    full = make_view(uf + 0.1, vf)
    sweep = freq_rmse_sweep(full, ev, data)
    assert set(sweep) == {0.1, 0.25, 0.5, 0.75, 1.0}
    counts = [sweep[p][0] for p in sorted(sweep)]
    assert counts == sorted(counts)  # monotone coverage

    su, sv, _ = svd_init(data.train_mat, 3)
    svd_view = make_view(su, sv)
    graph = mfio.item_cosine_sim(data.train_mat, top_k=5)
    eng = PPREngine(graph)
    rep = sample_top_n_analysis(full, orig, ev, data, iu, ii,
                                svd_view=svd_view, ppr_engine=eng,
                                n_users=8, n_buckets=4)
    assert set(rep["bucket_curves"]) == {"freq", "svd", "ppr"}

    ov = compare_ppr_gpr(eng, data.train_mat, users=[0, 1, 2], top_m=10)
    assert 0.0 <= ov["mean_overlap"] <= 1.0


def test_quartile_ranking_report():
    from matfac_tpu.data.synthetic import leave_one_out_data
    from matfac_tpu.eval.quartile import quartile_ranking_report
    from matfac_tpu.eval.ranking import CatalogScorer

    data = leave_one_out_data(n_users=40, n_items=30, per_user=8, seed=9)
    # give test rows 2 entries so NDCG has support: merge val into test
    import matfac_tpu.data.csr as csr
    r1, c1, v1 = data.test_mat.to_coo()
    r2, c2, v2 = data.val_mat.to_coo()
    test2 = csr.RatingMatrix.from_coo(
        np.concatenate([r1, r2]), np.concatenate([c1, c2]),
        np.concatenate([v1, v2]), data.n_users, data.n_items)
    data.test_mat = test2
    p = Params(fac_dim=4, seed=2)
    iu, ii = freq.invalid_users_items(data.train_mat, data.n_users,
                                      data.n_items)
    ev = Evaluator(data, iu, ii, p)
    model = ModelMF(p, data.n_users, data.n_items)
    view = model.eval_view(init_state(p, data.n_users, data.n_items))
    sc = CatalogScorer(data.train_mat, iu, ii, data.n_users,
                       data.n_items, user_block=8, item_block=16)
    rep = quartile_ranking_report(view, data, sc, iu, ii, evaluator=ev)
    assert "Test HR@10 by user quartile" in rep
    assert "Test ARHR by user quartile" in rep
    assert "Test NDCG@10 by user quartile" in rep


def test_sample_missing_pairs():
    from matfac_tpu.analysis.confidence import sample_missing_pairs

    data, _, _ = synthetic_data(n_users=40, n_items=30, k=3,
                                density=0.4, seed=2)
    iu, ii = freq.invalid_users_items(data.train_mat, data.n_users,
                                      data.n_items)
    rows, cols = sample_missing_pairs(data.train_mat, iu, ii, 200,
                                      seed=3)
    assert len(rows) == 200
    for u, c in zip(rows[:50], cols[:50]):
        assert not iu[u] and not ii[c]
        assert c not in set(data.train_mat.row(int(u))[0])


def test_ordering_overlap_family():
    """orderingOverlap / compOrderingOverlap* (topBucketComp.cpp:
    1339-1501) against hand-computed small rankings."""
    from matfac_tpu.analysis.top_bucket import (
        comp_diff_pc, comp_ordering_overlap, comp_ordering_overlap2,
        comp_ordering_overlap_bscores, ordering_diff, ordering_overlap)

    ids_a = np.array([5, 3, 9, 1, 7])
    ids_b = np.array([3, 8, 5, 2, 9])
    sc_b = np.array([.5, .4, .3, .2, .1])

    # top-3 of A = {5,3,9}; top-3 of B in order = [3,8,5]
    ov_i, ov_s = ordering_overlap(ids_a, ids_b, sc_b, 3)
    np.testing.assert_array_equal(ov_i, [3, 5])
    np.testing.assert_allclose(ov_s, [.5, .3])
    df_i, _ = ordering_diff(ids_a, ids_b, sc_b, 3)
    np.testing.assert_array_equal(df_i, [8])

    assert comp_ordering_overlap(ids_a, ids_b, 3) == pytest.approx(2 / 3)
    assert comp_ordering_overlap2(ids_a, ids_b, 3) == pytest.approx(2 / 3)
    # B shorter than size_a: denominator differs between the variants
    assert comp_ordering_overlap(ids_a, ids_b[:2], 3) == pytest.approx(1 / 3)
    assert comp_ordering_overlap2(ids_a, ids_b[:2], 3) == pytest.approx(1 / 2)

    # BScores preserves the reference's -1-seeded accumulators
    ov, out = comp_ordering_overlap_bscores(ids_a, ids_b, sc_b, 3)
    assert ov == pytest.approx((0.5 + 0.3 - 1.0) / 2)
    assert out == pytest.approx((0.4 - 1.0) / 1)

    da, db = comp_diff_pc(ids_a, ids_b)
    assert da == pytest.approx(2 / 5)
    assert db == pytest.approx(2 / 5)

    assert comp_ordering_overlap(np.array([]), ids_b, 3) == 0.0
    assert comp_ordering_overlap_bscores(np.array([]), ids_b, sc_b,
                                         3) == (-1.0, -1.0)


def test_batch_score_pools_matches_predict_pairs():
    from matfac_tpu.analysis.batch import score_pools
    from matfac_tpu.eval.metrics import predict_pairs

    rng = np.random.default_rng(0)
    U, I, K, P, C = 30, 40, 4, 17, 9
    view = EvalView(jnp.asarray(rng.normal(size=(U, K)).astype(np.float32)),
                    jnp.asarray(rng.normal(size=(I, K)).astype(np.float32)),
                    jnp.asarray(rng.normal(size=U).astype(np.float32)),
                    jnp.asarray(rng.normal(size=I).astype(np.float32)),
                    jnp.float32(0.3))
    users = rng.integers(0, U, P)
    pools = rng.integers(0, I, (P, C))
    got = score_pools(view, users, pools, pair_block=8)
    want = np.asarray(predict_pairs(
        view, jnp.asarray(np.repeat(users, C).astype(np.int32)),
        jnp.asarray(pools.reshape(-1).astype(np.int32)))).reshape(P, C)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_batch_sample_unrated_pools_validity():
    from matfac_tpu.analysis.batch import sample_unrated_pools

    mat, _, _ = low_rank_ratings(40, 30, 3, density=0.3, seed=2)
    valid = np.ones(30, bool)
    valid[5] = False
    rng = np.random.default_rng(1)
    users = np.array([0, 3, 7, 7])
    tis = np.array([1, 2, 3, 4])
    pools = sample_unrated_pools(mat, valid, users, tis, 50, rng)
    assert pools.shape == (4, 51)
    np.testing.assert_array_equal(pools[:, 0], tis)
    for p in range(4):
        u = int(users[p])
        rated = set(mat.row(u)[0])
        for it in pools[p, 1:]:
            assert valid[it] and it != tis[p] and int(it) not in rated


def test_conf_compat_named_surface():
    """The named confCompute analogs (analysis.conf_compat) agree with
    the generic machinery and with each other on a small grid."""
    from matfac_tpu.analysis import conf_compat as cc
    from matfac_tpu.ops.svd_init import svd_init

    mat, uf, vf = low_rank_ratings(50, 40, 3, density=0.3, seed=7,
                                   noise=0.05, nonneg=True)
    iu, ii = freq.invalid_users_items(mat, 50, 40)

    def view_of(u, v, scale=1.0):
        return EvalView(jnp.asarray(u * scale), jnp.asarray(v),
                        jnp.zeros(50), jnp.zeros(40), jnp.float32(0))

    orig = view_of(uf, vf)
    full = view_of(uf + 0.1 * np.random.default_rng(0).normal(
        size=uf.shape), vf)
    views = [view_of(uf, vf, s) for s in (0.9, 1.0, 1.1)]
    eng = PPREngine(mfio.item_cosine_sim(mat, top_k=10))
    item_freq = mat.col_degrees().astype(np.float64)

    pairs = cc.get_test_pairs(mat, iu, ii, 200, seed=3)
    assert len(pairs[0]) == 200

    # observed / missing / pair-list curve families all run and return
    # n_buckets finite-or-nan curves
    r1, c1 = cc.compute_mod_conf(mat, views, iu, ii, orig, full, 5)
    assert len(r1) == 5 and len(c1) == 5
    r2, _ = cc.compute_gpr_conf(mat, eng, iu, ii, 0.85, orig, full, 5)
    r3, _ = cc.compute_missing_mod_conf(mat, views, iu, ii, orig, full,
                                        5, n_pairs=500)
    assert np.isfinite(r2).all() and np.isfinite(r3).all()

    opt = cc.gen_opt_conf_rmse_curve(pairs, orig, full, 5)
    itm = cc.gen_item_conf_rmse_curve(pairs, orig, full, item_freq, 5)
    usr = cc.gen_user_conf_rmse_curve(
        pairs, orig, full, mat.row_degrees().astype(np.float64), 5)
    gpr = cc.gen_gpr_conf_rmse_curve(pairs, orig, full, eng)
    mdl = cc.gen_model_conf_rmse_curve(pairs, orig, full, views, 5)
    # oracle ordering is (weakly) increasing-error by construction
    assert opt[0] <= opt[-1] + 1e-9
    for cur in (itm, usr, mdl):
        assert len(cur) == 5 and np.isfinite(cur).all()
    assert len(gpr) == 10

    # per-user-sorted families
    b1 = cc.conf_bucket_rmses(orig, full, views, 50, 40, 4, iu, ii)
    b2 = cc.gpr_bucket_rmses(orig, full, eng, 50, 40, n_buckets=4,
                             invalid_users=iu, invalid_items=ii)
    b3 = cc.ppr_bucket_rmses(orig, full, eng, mat, 50, 40, n_buckets=4,
                             invalid_users=iu, invalid_items=ii,
                             n_samp_users=10)
    b4 = cc.conf_opt_bucket_rmses(orig, full, 50, 40, 4, iu, ii)
    b5 = cc.item_freq_bucket_rmses(orig, full, item_freq, 50, 40, 4,
                                   iu, ii)
    for b in (b1, b2, b3, b4, b5):
        assert np.isfinite(b).all()
    # oracle per-user buckets are monotone nondecreasing
    assert (np.diff(b4) >= -1e-6).all()


def test_top_n_rec_handles_test_only_items():
    """Test splits may carry item ids beyond train_mat.ncols
    (dataset.py sets n_items to the max across splits) — train-sized
    tables must be padded, not indexed raw (review r3 crash)."""
    from matfac_tpu.analysis.topn import top_n_rec
    from matfac_tpu.models.base import EvalView

    rng = np.random.default_rng(0)
    n_users, n_train_items, n_all = 30, 20, 25
    r = np.repeat(np.arange(n_users), 5)
    c = rng.integers(0, n_train_items, len(r))
    train = RatingMatrix.from_coo(r, c, np.ones(len(r), np.float32),
                                  n_users, n_train_items)
    # every test item id >= n_train_items
    test = RatingMatrix.from_coo(
        np.arange(n_users), rng.integers(n_train_items, n_all, n_users),
        np.ones(n_users, np.float32), n_users, n_all)
    view = EvalView(jnp.asarray(rng.normal(size=(n_users, 4)),
                                jnp.float32),
                    jnp.asarray(rng.normal(size=(n_all, 4)),
                                jnp.float32),
                    jnp.zeros(n_users), jnp.zeros(n_all),
                    jnp.float32(0))
    rep = top_n_rec(view, train, test, np.zeros(n_users, bool),
                    np.zeros(n_all, bool), n=5, n_samp_users=30,
                    n_negatives=10, seed=3)
    assert rep.n_test_items == n_users
    # test-only items have zero train mass -> all tail
    assert rep.n_head_items == 0


def test_sample_unrated_pools_distinct_negatives():
    """The reference draws DISTINCT negatives (unordered_set,
    longTail.cpp:373-408); pools must not contain repeats, and
    exhausted tiny catalogs must not hang (review r3)."""
    from matfac_tpu.analysis.batch import sample_unrated_pools

    rng = np.random.default_rng(1)
    n_users, n_items = 10, 200
    r = np.repeat(np.arange(n_users), 3)
    c = rng.integers(0, n_items, len(r))
    train = RatingMatrix.from_coo(r, c, np.ones(len(r), np.float32),
                                  n_users, n_items)
    valid = np.ones(n_items, bool)
    users = np.arange(10)
    tis = rng.integers(0, n_items, 10)
    pools = sample_unrated_pools(train, valid, users, tis, 50, rng)
    for p in range(10):
        negs = pools[p, 1:]
        assert len(np.unique(negs)) == len(negs), "duplicate negative"
        assert not np.isin(negs, train.row(int(users[p]))[0]).any()
    # exhausted case: more negatives requested than distinct items
    pools2 = sample_unrated_pools(train, valid[:20].copy(),
                                  users[:2], tis[:2] % 20, 50,
                                  np.random.default_rng(2))
    assert pools2.shape == (2, 51)   # padded by cycling, no hang


def test_sample_missing_pairs_unsorted_rows():
    """CSR rows are not guaranteed column-sorted; membership rejection
    must not rely on sortedness (review r3: observed entries leaked
    into the 'missing' sample)."""
    from matfac_tpu.analysis.confidence import sample_missing_pairs

    # row 0 deliberately unsorted: items [9, 2, 5]
    indptr = np.array([0, 3, 4])
    indices = np.array([9, 2, 5, 1])
    vals = np.ones(4, np.float32)
    mat = RatingMatrix(indptr, indices, vals, ncols=10)
    rows, cols = sample_missing_pairs(mat, np.zeros(2, bool),
                                      np.zeros(10, bool), 12, seed=0)
    observed = {(0, 9), (0, 2), (0, 5), (1, 1)}
    for u, i in zip(rows, cols):
        assert (int(u), int(i)) not in observed, (u, i)
