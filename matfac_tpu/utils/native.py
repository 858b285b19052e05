"""ctypes bindings for the native C++ host-side helpers.

The reference's data-loading / graph-building hot paths are C (GKlib) —
here the equivalents live in ``native/matfac_native.cpp`` compiled to
``libmatfac_native.so`` (OpenMP text-CSR parser, similarity-graph
builder). Everything has a pure-numpy fallback, so the native library is
an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _try_build(native_dir: str) -> None:
    """Best-effort `make` of the native lib on first use (skipped with
    MATFAC_NO_NATIVE_BUILD=1). Failures are silent — numpy fallback."""
    if os.environ.get("MATFAC_NO_NATIVE_BUILD") == "1":
        return
    import subprocess
    try:
        subprocess.run(["make", "-C", native_dir], capture_output=True,
                       timeout=120, check=False)
    except Exception:
        pass


def _find_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    native_dir = os.path.join(here, "native")
    if (not os.path.exists(os.path.join(native_dir,
                                        "libmatfac_native.so"))
            and os.path.exists(os.path.join(native_dir,
                                            "matfac_native.cpp"))):
        _try_build(native_dir)
    candidates = [
        os.path.join(native_dir, "libmatfac_native.so"),
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "libmatfac_native.so"),
    ]
    for c in candidates:
        if os.path.exists(c):
            try:
                lib = ctypes.CDLL(c)
                lib.mfio_parse_csr_count.restype = ctypes.c_longlong
                lib.mfio_parse_csr_count.argtypes = [
                    ctypes.c_char_p, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_longlong)]
                lib.mfio_parse_csr_fill.restype = ctypes.c_int
                lib.mfio_parse_csr_fill.argtypes = [
                    ctypes.c_char_p, ctypes.c_int,
                    ctypes.c_longlong, ctypes.c_longlong,
                    np.ctypeslib.ndpointer(np.int64),
                    np.ctypeslib.ndpointer(np.int32),
                    np.ctypeslib.ndpointer(np.float32)]
                _LIB = lib
                return _LIB
            except OSError:
                continue
    return None


def parse_csr_text(path: str, with_values: bool
                   ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Fast GKlib-text CSR parse via the native lib; None → caller falls
    back to the numpy path."""
    lib = _find_lib()
    if lib is None or not os.path.exists(path):
        return None
    nrows = ctypes.c_longlong(0)
    nnz = lib.mfio_parse_csr_count(path.encode(), int(with_values),
                                   ctypes.byref(nrows))
    if nnz < 0:
        return None
    indptr = np.zeros(nrows.value + 1, dtype=np.int64)
    cols = np.zeros(nnz, dtype=np.int32)
    vals = np.ones(nnz, dtype=np.float32)
    rc = lib.mfio_parse_csr_fill(path.encode(), int(with_values),
                                 nrows.value, nnz, indptr, cols, vals)
    if rc != 0:
        return None
    return indptr, cols, vals


def available() -> bool:
    return _find_lib() is not None


def item_cosine_topk(colptr, rowind, colval, rowptr, colind, rowval,
                     n_items: int, n_users: int, top_k: int):
    """Two-hop item-item cosine top-k via the native lib; None if the
    library is unavailable."""
    lib = _find_lib()
    if lib is None:
        return None
    if not hasattr(lib, "_cosine_ready"):
        lib.mfio_item_cosine_topk2.restype = ctypes.c_int
        lib.mfio_item_cosine_topk2.argtypes = [
            ctypes.c_longlong, ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float32),
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float32)]
        lib._cosine_ready = True
    out_cols = np.full(n_items * top_k, -1, np.int32)
    out_vals = np.zeros(n_items * top_k, np.float32)
    rc = lib.mfio_item_cosine_topk2(
        n_items, n_users, np.ascontiguousarray(colptr, np.int64),
        np.ascontiguousarray(rowind, np.int32),
        np.ascontiguousarray(colval, np.float32),
        np.ascontiguousarray(rowptr, np.int64),
        np.ascontiguousarray(colind, np.int32),
        np.ascontiguousarray(rowval, np.float32),
        top_k, out_cols, out_vals)
    if rc != 0:
        return None
    return out_cols.reshape(n_items, top_k), out_vals.reshape(n_items,
                                                              top_k)
