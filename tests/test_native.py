"""Native C++ helper tests (skipped if the library isn't built)."""

import numpy as np
import pytest

from matfac_tpu.data import io as mfio
from matfac_tpu.data.synthetic import low_rank_ratings
from matfac_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_native_parser_matches_python(tmp_path):
    mat, _, _ = low_rank_ratings(60, 45, 3, density=0.3, seed=0)
    p = str(tmp_path / "m.csr")
    mfio.write_csr(mat, p)
    parsed = native.parse_csr_text(p, True)
    assert parsed is not None
    indptr, cols, vals = parsed
    np.testing.assert_array_equal(indptr, mat.indptr)
    np.testing.assert_array_equal(cols, mat.indices)
    # file carries %g (6 sig digits); parsed values must match the file,
    # i.e. the original within print precision
    np.testing.assert_allclose(vals, mat.values, rtol=1e-5, atol=1e-5)


def test_native_parser_empty_rows_and_no_trailing_newline(tmp_path):
    p = str(tmp_path / "e.csr")
    with open(p, "w") as f:
        f.write("0 5 2 3\n\n1 1.5")   # empty middle row, no trailing \n
    indptr, cols, vals = native.parse_csr_text(p, True)
    np.testing.assert_array_equal(indptr, [0, 2, 2, 3])
    np.testing.assert_array_equal(cols, [0, 2, 1])
    np.testing.assert_allclose(vals, [5, 3, 1.5])


def test_native_parser_novalues(tmp_path):
    p = str(tmp_path / "b.csr")
    with open(p, "w") as f:
        f.write("0 2 5\n1\n")
    indptr, cols, vals = native.parse_csr_text(p, False)
    np.testing.assert_array_equal(indptr, [0, 3, 4])
    np.testing.assert_array_equal(cols, [0, 2, 5, 1])
    np.testing.assert_allclose(vals, 1.0)


def test_native_cosine_topk_matches_numpy():
    mat, _, _ = low_rank_ratings(50, 30, 3, density=0.4, seed=2,
                                 nonneg=True)
    colptr, rowind, colval = mat.csc()
    out = native.item_cosine_topk(colptr, rowind, colval,
                                  mat.indptr, mat.indices, mat.values,
                                  mat.ncols, mat.nrows, top_k=5)
    assert out is not None
    cols, vals = out
    dense = mat.to_dense()
    norms = np.linalg.norm(dense, axis=0)
    norms[norms == 0] = 1.0
    sim = (dense.T @ dense) / np.outer(norms, norms)
    np.fill_diagonal(sim, -np.inf)
    for i in range(mat.ncols):
        expect = np.sort(sim[i])[::-1][:5]
        got = vals[i]
        # compare score multisets (ties may order differently)
        np.testing.assert_allclose(np.sort(got)[::-1],
                                   np.maximum(expect, 0) * (expect > -np.inf)
                                   if False else expect,
                                   atol=1e-5)


def test_native_parser_rejects_malformed_token(tmp_path):
    """A non-numeric token must fail cleanly (numpy fallback), not loop
    forever / overrun the nnz-sized buffers (round-2 advisor fix)."""
    p = str(tmp_path / "bad.csr")
    with open(p, "w") as f:
        f.write("0 2.0 x 3.0\n1 1.0\n")
    assert native.parse_csr_text(p, True) is None


def test_native_parser_rejects_trailing_garbage_value(tmp_path):
    p = str(tmp_path / "bad2.csr")
    with open(p, "w") as f:
        f.write("0 2.0 1 zz\n")
    assert native.parse_csr_text(p, True) is None
