"""Tooling + profiler + sharded-checkpoint tests."""

import numpy as np
import pytest

from matfac_tpu import tools
from matfac_tpu.data.synthetic import low_rank_ratings


def test_convert_scipy_npz(tmp_path):
    import scipy.sparse as sp
    mat, _, _ = low_rank_ratings(20, 15, 3, density=0.3, seed=0)
    m = sp.csr_matrix(mat.to_dense())
    npz = str(tmp_path / "m.npz")
    sp.save_npz(npz, m)
    out = str(tmp_path / "m.csr")
    back = tools.convert_scipy_npz(npz, out)
    np.testing.assert_allclose(back.to_dense(), mat.to_dense(),
                               rtol=1e-5)
    from matfac_tpu.data.io import read_csr
    np.testing.assert_allclose(read_csr(out).to_dense(), mat.to_dense(),
                               rtol=1e-4, atol=1e-4)


def test_snap_graph(tmp_path):
    mat, _, _ = low_rank_ratings(10, 10, 2, density=0.3, seed=1)
    p = str(tmp_path / "g.snap")
    tools.to_snap_graph(mat, p)
    lines = open(p).read().splitlines()
    assert lines[0].startswith("# Nodes:")
    assert len(lines) - 1 == 2 * mat.nnz


def test_log_parsing_and_averaging(tmp_path):
    log1 = ("epoch 0: obj 1.0e+03 val_rmse 2.5 lr 0.1 3ms\n"
            "epoch 1: obj 5.0e+02 val_rmse 1.5 lr 0.1 3ms\n")
    log2 = "epoch 0: obj 9.0e+02 val_rmse 2.1 lr 0.1 3ms\n"
    p1, p2 = str(tmp_path / "a.log"), str(tmp_path / "b.log")
    open(p1, "w").write(log1)
    open(p2, "w").write(log2)
    recs = tools.parse_training_logs(log1)
    assert recs[1]["val_rmse"] == 1.5
    avg = tools.average_log_values([p1, p2])
    assert avg == pytest.approx((1.5 + 2.1) / 2)
    hr = tools.parse_training_logs("epoch 3: HR 0.45 best 0.5\n")
    assert hr[0]["hr"] == 0.45


def test_gen_sweep_jobs(tmp_path):
    cmds = tools.gen_sweep_jobs(
        "python -m matfac_tpu.cli --trainmat t.csr",
        {"facdim": [5, 10], "learnrate": [0.001, 0.01, 0.1]},
        out_dir=str(tmp_path), prefix="j")
    assert len(cmds) == 6
    assert (tmp_path / "j_5.sh").exists()
    assert "--facdim 5" in cmds[0] and "--learnrate 0.001" in cmds[0]


def test_throughput_meter():
    from matfac_tpu.train.profiler import ThroughputMeter
    m = ThroughputMeter(nnz=1000, n_chips=2)
    import time
    for _ in range(3):
        with m:
            time.sleep(0.005)
    assert m.ratings_per_sec > 0
    assert m.ratings_per_sec_per_chip == pytest.approx(
        m.ratings_per_sec / 2)
    assert "epochs" in m.summary()


def test_sharded_checkpoint_roundtrip(tmp_path):
    import jax
    from matfac_tpu.config import Params
    from matfac_tpu.models.base import init_state
    from matfac_tpu.parallel.mesh import make_mesh, shard_state
    from matfac_tpu.train import checkpoint as ck

    p = Params(fac_dim=4)
    mesh = make_mesh((8,), ("u",))
    state = shard_state(init_state(p, 64, 32), mesh, "u", "u")
    ck.save_sharded(str(tmp_path / "ck"), state, epoch=np.int64(7))
    blank = shard_state(init_state(p, 64, 32, seed=9), mesh, "u", "u")
    back, extra = ck.restore_sharded(str(tmp_path / "ck"), blank)
    np.testing.assert_allclose(np.asarray(back.u_fac),
                               np.asarray(state.u_fac))
    assert back.u_fac.sharding.spec == state.u_fac.sharding.spec
    assert extra["epoch"] == 7


def test_compute_conf_bucket_rmse():
    """Vectorized computeConfBuckRMSEFrmModels vs a literal python
    transcription of the reference script's loops."""
    from matfac_tpu.tools import compute_conf_bucket_rmse

    rng = np.random.default_rng(3)
    U, I, K, M, NB = 12, 20, 3, 4, 4
    u_facs = [rng.normal(size=(U, K)) for _ in range(M)]
    i_facs = [rng.normal(size=(I, K)) for _ in range(M)]
    u_fac, i_fac = rng.normal(size=(U, K)), rng.normal(size=(I, K))
    orig_u, orig_i = rng.normal(size=(U, K)), rng.normal(size=(I, K))
    got = compute_conf_bucket_rmse(u_facs, i_facs, u_fac, i_fac,
                                   orig_u, orig_i, NB)

    # reference transcription (computeConf.py:66-102)
    per = I // NB
    sq = np.zeros(NB)
    ct = np.zeros(NB)
    for u in range(U):
        scores = []
        for it in range(I):
            preds = [np.dot(uf[u], vf[it])
                     for uf, vf in zip(u_facs, i_facs)]
            std = np.std(preds)
            scores.append((1.0 / std if std != 0 else -1.0, it))
        scores.sort(reverse=True)
        for b in range(NB):
            s, e = b * per, (b + 1) * per
            if b == NB - 1 or e > I:
                e = I
            for i in range(s, e):
                it = scores[i][1]
                d = np.dot(u_fac[u], i_fac[it]) - np.dot(orig_u[u],
                                                         orig_i[it])
                sq[b] += d * d
                ct[b] += 1
    want = np.sqrt(sq / ct)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_quartile_rmse_from_predictions():
    from matfac_tpu.tools import quartile_rmse_from_predictions

    rows = [(0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0), (9, 9, 0.0)]
    u_part = {0: 0, 1: 1}
    i_part = {0: 0, 1: 0}
    val = {(0, 0): 1.5, (0, 1): 2.0, (1, 0): 2.0}
    out = quartile_rmse_from_predictions(
        rows, u_part, i_part, lambda u, i: val[(u, i)])
    assert out["missing"] == 1
    assert out["all_rmse"] == pytest.approx(
        np.sqrt((0.25 + 0.0 + 1.0) / 3))
    assert out["user_part_rmse"][0] == pytest.approx(
        np.sqrt((0.25 + 0.0) / 2))
    assert out["user_part_rmse"][1] == pytest.approx(1.0)


def test_overlap_rep_factor_and_pairwise():
    from matfac_tpu.tools import overlap_rep_factor, pairwise_overlap_stats

    s1, s2 = {1, 2, 3, 4}, {3, 4, 5, 6}
    r = overlap_rep_factor(s1, s2, 100)
    assert r["overlap"] == 2
    assert r["expected"] == pytest.approx(16 / 100)
    assert r["rep_factor"] == pytest.approx(2 / 0.16)
    assert 0.0 <= r["prob"] <= 1.0
    st = pairwise_overlap_stats([s1, s2, {1, 3, 5}], 100)
    assert 0.0 < st["mean_pairwise_pc"] < 1.0
    assert st["all_intersection"] == len(s1 & s2 & {1, 3, 5})


def test_write_filtered_min_rating(tmp_path):
    from matfac_tpu.data.csr import RatingMatrix
    from matfac_tpu.data.io import read_csr
    from matfac_tpu.tools import write_filtered_min_rating

    indptr = np.array([0, 2, 4])
    cols = np.array([0, 1, 1, 2])
    vals = np.array([5.0, 3.0, 4.0, 5.0], np.float32)
    mat = RatingMatrix(indptr, cols, vals, 3)
    p = str(tmp_path / "f.csr")
    kept = write_filtered_min_rating(mat, p, min_rating=4.0,
                                     head_items={2})
    assert kept == 2   # (0,0,5) and (1,1,4); item 2 is head, 3.0 < 4
    out = read_csr(p, ncols=3)
    assert out.nnz == 2
    np.testing.assert_array_equal(out.indices, [0, 1])


def test_log_munger_family(tmp_path):
    from matfac_tpu.tools import (mean_of_stream, average_columns,
                                  cumulative_sum, column_diff,
                                  average_metric_files,
                                  average_tagged_freq_lines,
                                  average_freq_var_lines)

    assert mean_of_stream([1.0, 2.0, 3.0]) == 2.0
    np.testing.assert_allclose(average_columns(["1 2", "", "3 4"]),
                               [2.0, 3.0])
    np.testing.assert_allclose(cumulative_sum([1, 2, 3]), [1, 3, 6])
    assert column_diff(["5 2 1"], 0, 2) == [4.0]

    p1 = tmp_path / "a.txt"
    p1.write_text("hr: 0.5,0.6,nan\nk1: 1.0 k2: 3.0\n")
    p2 = tmp_path / "b.txt"
    p2.write_text("hr: 0.7,0.8,0.9\nk1: 2.0 k2: 5.0\n")
    avg = average_metric_files([str(p1), str(p2)])
    np.testing.assert_allclose(avg["hr"], [0.6, 0.7, 0.45])
    np.testing.assert_allclose(avg["k1"], [1.5])

    p3 = tmp_path / "f.txt"
    p3.write_text("FiltPc 10 2 0.5 4 0.25\nFiltPc 20 6 0.1 2 0.7\n")
    tg = average_tagged_freq_lines([str(p3)], "FiltPc")
    np.testing.assert_allclose(tg[10], [2, 0.5, 4, 0.25])

    p4 = tmp_path / "v.txt"
    p4.write_text("FreqVar 0.5 x 100 1 0.2 3 0.4 0.9\n")
    fv = average_freq_var_lines([str(p4)])
    np.testing.assert_allclose(fv["0.5_100"], [1, 0.2, 3, 0.4, 0.9])


def test_prediction_abs_diff(tmp_path):
    from matfac_tpu.tools import prediction_abs_diff

    pc = tmp_path / "pred.csv"
    pc.write_text("0,1,3.5\n2,4,1.0\n")
    tt = tmp_path / "test.txt"
    tt.write_text("0 1 4.0\n2 4 0.5\n")
    out = prediction_abs_diff(str(pc), str(tt),
                              str(tmp_path / "diff.txt"))
    assert out == [("0", "1", 0.5), ("2", "4", 0.5)]


def test_extract_dense_items_and_bpr_triplets(tmp_path):
    from matfac_tpu.data.csr import RatingMatrix
    from matfac_tpu.tools import extract_dense_items, write_bpr_triplets

    r = np.array([0, 0, 1, 2, 2, 2])
    c = np.array([0, 1, 0, 0, 2, 2 % 3])
    v = np.array([1.0, 2.0, 1.0, 3.0, 1.0, 1.0])
    m = RatingMatrix.from_coo(r, c, v, 3, 3)
    d = extract_dense_items(m, min_ratings=2)  # keep items w/ >2 ratings
    rr, cc, _ = d.to_coo()
    assert set(cc) == {0}   # only item 0 has 3 > 2 ratings
    assert d.nrows == 3

    n = write_bpr_triplets(m, str(tmp_path / "t.txt"), pos_value=1.0)
    assert n == 4
    lines = (tmp_path / "t.txt").read_text().strip().split("\n")
    assert len(lines) == 4 and lines[0].endswith(" 1")


def test_ppr_item_buckets_rmse():
    from matfac_tpu.tools import ppr_item_buckets_rmse

    rng = np.random.default_rng(0)
    ou, oi = rng.normal(size=(50, 4)), rng.normal(size=(30, 4))
    uf, vf = ou + 0.1, oi.copy()
    order = np.arange(30)
    rmses, buckets = ppr_item_buckets_rmse(order, uf, vf, ou, oi, 3)
    assert rmses.shape == (30,)
    assert len(buckets) == 3
    # oracle for item 0
    d = ou @ oi[0] - uf @ vf[0]
    np.testing.assert_allclose(rmses[0], np.sqrt(np.mean(d * d)),
                               rtol=1e-9)


def test_analyze_output_files(tmp_path):
    from matfac_tpu.tools import analyze_output_files

    p1 = tmp_path / "r1.txt"
    p1.write_text("junk\nRE Train RMSE: 0.5\nRE Val RMSE: 0.7\n")
    p2 = tmp_path / "r2.txt"
    p2.write_text("RE Train RMSE: 0.7\nRE Val RMSE: 0.9\n")
    out = analyze_output_files([str(p1), str(p2)])
    np.testing.assert_allclose(out["train_rmse"], 0.6)
    np.testing.assert_allclose(out["val_rmse"], 0.8)


def test_plot_prob_rmse_pdf(tmp_path):
    """plotProbRMSE.py parity: parses the stats/curve file formats and
    writes one PDF page per user ordered by rating count."""
    from matfac_tpu.tools import (plot_prob_rmse_pdf, read_user_curves,
                                  read_user_stats)

    (tmp_path / "stats.txt").write_text(
        "1 30 120 4.5 7\n0 10 80 2.5 3\n")
    (tmp_path / "rmse.txt").write_text(
        "1 0.9 0.8 0.7\n0 1.1 1.0 0.9\n")
    (tmp_path / "probs.txt").write_text(
        "1 0.1 0.01 0.001\n0 0.2 0.02 0.002\n")
    stats = read_user_stats(str(tmp_path / "stats.txt"))
    rmse = read_user_curves(str(tmp_path / "rmse.txt"))
    probs = read_user_curves(str(tmp_path / "probs.txt"), log10=True)
    assert stats[1] == (30, 120, 4.5, 7)
    np.testing.assert_allclose(probs[0], np.log10([0.2, 0.02, 0.002]))
    out = str(tmp_path / "out.pdf")
    n = plot_prob_rmse_pdf(rmse, probs, stats, out)
    assert n == 2
    raw = open(out, "rb").read()
    assert raw[:5] == b"%PDF-" and len(raw) > 1000
