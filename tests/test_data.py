"""Data-layer tests: CSR container, GKlib text IO, splits, batching."""

import numpy as np
import pytest

from matfac_tpu.data import io as mfio
from matfac_tpu.data.batching import (CooBatches, bucketed_rows, coo_batches,
                                      user_item_block_partition)
from matfac_tpu.data.csr import RatingMatrix
from matfac_tpu.data.dataset import Data
from matfac_tpu.data.synthetic import (gen_latent_factors, leave_one_out_data,
                                       low_rank_ratings, synthetic_data)
from matfac_tpu.utils import freq


def small_mat():
    dense = np.array([
        [5, 0, 3, 0],
        [0, 0, 0, 0],
        [4, 1, 0, 2],
        [0, 0, 2, 0],
    ], dtype=np.float32)
    return RatingMatrix.from_dense(dense), dense


def test_csr_roundtrip():
    mat, dense = small_mat()
    assert mat.shape == (4, 4)
    assert mat.nnz == 6
    np.testing.assert_allclose(mat.to_dense(), dense)
    cols, vals = mat.row(2)
    np.testing.assert_array_equal(cols, [0, 1, 3])
    np.testing.assert_allclose(vals, [4, 1, 2])


def test_csc_and_transpose():
    mat, dense = small_mat()
    t = mat.transpose()
    np.testing.assert_allclose(t.to_dense(), dense.T)
    colptr, rowind, colval = mat.csc()
    assert colptr[-1] == mat.nnz


def test_degrees_and_sorted():
    mat, _ = small_mat()
    np.testing.assert_array_equal(mat.row_degrees(), [2, 0, 3, 1])
    np.testing.assert_array_equal(mat.col_degrees(), [2, 1, 2, 1])
    assert mat.is_sorted()
    # break sortedness
    bad = RatingMatrix(mat.indptr, mat.indices[::-1].copy(),
                       mat.values, mat.ncols)
    assert not bad.is_sorted()


def test_pad_rows():
    mat, _ = small_mat()
    cols, vals, mask = mat.pad_rows()
    assert cols.shape == (4, 3)
    assert mask.sum() == mat.nnz
    np.testing.assert_allclose(vals[2], [4, 1, 2])


def test_text_io_roundtrip(tmp_path):
    mat, _ = small_mat()
    p = str(tmp_path / "m.csr")
    mfio.write_csr(mat, p)
    back = mfio.read_csr(p)
    assert back.nrows == mat.nrows
    np.testing.assert_allclose(back.to_dense(), mat.to_dense())


def test_factor_mat_io(tmp_path):
    m = np.random.default_rng(0).standard_normal((5, 3)).astype(np.float32)
    p = str(tmp_path / "fac.mat")
    mfio.write_factor_mat(m, p)
    back = mfio.read_factor_mat(p, 5, 3)
    np.testing.assert_allclose(back, m, rtol=1e-5)


def test_split_preserves_entries():
    mat, _, _ = low_rank_ratings(50, 40, 3, 0.3, seed=0)
    tr, te, va = mfio.split_train_test_val(mat, 0.1, 0.1, seed=1)
    assert tr.nnz + te.nnz + va.nnz == mat.nnz
    assert tr.shape == te.shape == va.shape == mat.shape
    total = tr.to_dense() + te.to_dense() + va.to_dense()
    np.testing.assert_allclose(total, mat.to_dense(), rtol=1e-5)


def test_triplets_roundtrip(tmp_path):
    mat, _ = small_mat()
    p = str(tmp_path / "trip.txt")
    mfio.write_triplets(mat, p)
    back = mfio.read_triplets(p, mat.nrows, mat.ncols)
    np.testing.assert_allclose(back.to_dense(), mat.to_dense())


def test_binarize():
    mat, _ = small_mat()
    b = mfio.binarize(mat, 3.0)
    assert b.nnz == 3  # entries >= 3: the 5, 3, 4
    dense = b.to_dense()
    assert set(np.unique(dense)) <= {0.0, 1.0}


def test_invalid_users_items():
    mat, _ = small_mat()
    u_bad, i_bad = freq.invalid_users_items(mat, 5, 4)
    np.testing.assert_array_equal(u_bad, [False, True, False, False, True])
    assert not i_bad.any()


def test_quartiles_and_percentiles():
    f = np.array([1, 5, 2, 9, 7, 3, 0, 4.0])
    valid = f > 0
    q = freq.quartile_assignments(f, valid)
    assert q[6] == -1
    assert q[np.argmax(f)] == 3
    assert q[np.argmin(f[valid])] in (0,)
    pc = freq.percentile_rank_map(f, valid)
    assert pc[6] == 0
    assert pc[3] == 1.0


def test_head_items():
    mat, _, _ = low_rank_ratings(80, 60, 3, 0.2, seed=2, power_law=1.0)
    mask = freq.head_items(mat, 0.5)
    deg = mat.col_degrees()
    assert deg[mask].sum() >= 0.5 * deg.sum()
    # head should be much smaller than half the catalog under power law
    assert mask.sum() < 0.5 * mat.ncols


def test_coo_batches_padding():
    mat, _ = small_mat()
    u_bad, i_bad = freq.invalid_users_items(mat, 4, 4)
    b = coo_batches(mat, batch_size=4, invalid_users=u_bad,
                    invalid_items=i_bad)
    assert b.n_total % 4 == 0
    assert b.nnz == mat.nnz
    assert b.valid.sum() == mat.nnz


def test_bucketed_rows():
    mat, _, _ = low_rank_ratings(60, 50, 3, 0.2, seed=3, power_law=0.8)
    buckets = bucketed_rows(mat, min_cap=4)
    deg = mat.row_degrees()
    covered = np.concatenate(
        [b.row_ids[b.mask.sum(1) > 0] for b in buckets])
    assert sorted(covered) == sorted(np.nonzero(deg > 0)[0])
    for b in buckets:
        # each real row's mask count equals its degree
        real = b.mask.sum(1) > 0
        np.testing.assert_array_equal(b.mask[real].sum(1),
                                      deg[b.row_ids[real]])


def test_block_partition_cover():
    ub, ib = user_item_block_partition(100, 70, 4, seed=0)
    assert set(ub) == set(range(4))
    assert set(ib) == set(range(4))
    counts = np.bincount(ub)
    assert counts.max() - counts.min() <= 1


def test_data_bundle():
    data, u, i = synthetic_data(n_users=40, n_items=30, k=3)
    assert data.n_users == 40
    assert data.n_items == 30
    assert data.train_nnz == data.train_mat.nnz


def test_leave_one_out():
    data = leave_one_out_data(n_users=20, n_items=15, per_user=6)
    assert (data.test_mat.row_degrees() == 1).all()
    assert (data.val_mat.row_degrees() == 1).all()
    assert (data.train_mat.row_degrees() == 4).all()


def test_gen_latent_factors_orthonormal():
    f = gen_latent_factors(50, 5, scale=2.0, seed=0)
    gram = (f / 2.0).T @ (f / 2.0)
    np.testing.assert_allclose(gram, np.eye(5), atol=1e-5)


def test_item_sim_graphs():
    mat, _, _ = low_rank_ratings(40, 25, 3, 0.3, seed=4)
    cos = mfio.item_cosine_sim(mat, top_k=5)
    jac = mfio.item_jaccard_sim(mat, top_k=5)
    assert cos.shape == (25, 25)
    assert jac.shape == (25, 25)
    assert (jac.values <= 1.0 + 1e-6).all()
    # no self loops
    r, c, _ = cos.to_coo()
    assert not (r == c).any()


def test_stats_and_equality():
    from matfac_tpu.data.csr import mats_equal
    mat, _ = small_mat()
    st = mat.stats()
    assert st["nnz"] == 6 and st["zero_rows"] == 1
    assert mats_equal(mat, mat.copy())
    other = RatingMatrix(mat.indptr, mat.indices,
                         mat.values + 1.0, mat.ncols)
    assert not mats_equal(mat, other)
    assert mats_equal(mat, other, check_values=False)


def test_movielens_parsers(tmp_path):
    from matfac_tpu.data.movielens import load_movielens, load_ratings_file

    p = str(tmp_path / "ratings.dat")
    open(p, "w").write("1::10::5::978300760\n1::20::3::1\n2::10::4::1\n"
                       "3::30::2::1\n")
    u, i, r = load_ratings_file(p)
    np.testing.assert_array_equal(u, [0, 0, 1, 2])  # dense remapped
    np.testing.assert_array_equal(i, [0, 1, 0, 2])
    data = load_movielens(p, test_pc=0.0, val_pc=0.0, seed=0)
    assert data.train_mat.nnz == 4

    p2 = str(tmp_path / "u.data")
    open(p2, "w").write("5\t7\t4\t1\n9\t7\t2\t1\n")
    u2, i2, r2 = load_ratings_file(p2)
    np.testing.assert_array_equal(u2, [0, 1])
    np.testing.assert_array_equal(i2, [0, 0])

    p3 = str(tmp_path / "ratings.csv")
    open(p3, "w").write("userId,movieId,rating,ts\n3,4,4.5,1\n7,9,1.0,1\n")
    u3, i3, r3 = load_ratings_file(p3)
    np.testing.assert_allclose(r3, [4.5, 1.0])


def test_gen_stats_with_ignore_set():
    """genStats parity (util.cpp:319-411): per-entity counts, the
    after-ignore variants, and the min/max entity tallies — checked
    against a hand-counted tiny matrix."""
    from matfac_tpu.data.csr import RatingMatrix
    from matfac_tpu.utils.freq import format_gen_stats, gen_stats

    rows = np.array([0, 0, 0, 1, 2, 2])
    cols = np.array([0, 1, 2, 1, 0, 2])
    vals = np.ones(6, np.float32)
    mat = RatingMatrix.from_coo(rows, cols, vals, 3, 3)
    s = gen_stats(mat)
    assert s["nnz"] == 6 and s["ig_nnz"] == 0
    assert (s["min_user_ratings"], s["max_user_ratings"]) == (1, 3)
    assert (s["min_item_ratings"], s["max_item_ratings"]) == (2, 2)
    assert s["n_users_with_min"] == 1     # user 1
    assert s["n_items_with_max"] == 3     # every item has 2

    # ignore (0,1) and (2,0): user 0 -> 2, user 2 -> 1, item 0 -> 1,
    # item 1 -> 1
    s2 = gen_stats(mat, ignore_pairs=([0, 2], [1, 0]))
    assert s2["ig_nnz"] == 2
    assert s2["min_user_ratings"] == 1          # pre-ignore unchanged
    assert s2["min_user_ratings_after_ig"] == 1
    assert s2["max_user_ratings_after_ig"] == 2
    assert s2["n_users_with_max"] == 1          # user 0
    assert s2["max_item_ratings_after_ig"] == 2  # item 2
    assert s2["n_items_with_max"] == 1
    txt = format_gen_stats(s2, op_prefix="t")
    assert "NNZ: 6" in txt and "after ig" in txt and "opPrefix: t" in txt


def test_latin_square_schedule_and_block_partition():
    """DSGD schedule helpers (sgdUpdateBlockSeq util.cpp:1077-1107 /
    trainSGDPar partition modelMF.cpp:229-265): every round pairs each
    row block with a distinct col block, and the shuffled partition is
    balanced."""
    from matfac_tpu.data.batching import (latin_square_schedule,
                                          user_item_block_partition)

    rng = np.random.default_rng(0)
    for n in (1, 4, 7):
        perm = latin_square_schedule(n, rng)
        assert sorted(perm.tolist()) == list(range(n))
    ub, ib = user_item_block_partition(103, 57, 8, seed=2)
    assert set(ub) == set(range(8)) and set(ib) == set(range(8))
    cnts = np.bincount(ub, minlength=8)
    assert cnts.max() - cnts.min() <= 1
