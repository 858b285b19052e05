"""ALS — batched normal-equation solves on the MXU.

TPU-native analog of ModelMF::trainALS (modelMF.cpp:709-928): per user
u, accumulate the Gram YTY = sum_i q_i q_i^T and b = sum_i r_ui q_i over
the rated items with rating > 0 (the reference's explicit rating>0 gate,
modelMF.cpp:820/:862), add reg to the diagonal, solve the k x k system;
then symmetrically for items over the column view.

The reference loops scalar Gram accumulation per row under OpenMP; here
rows are grouped into power-of-two degree buckets (data.batching) and
each bucket runs one einsum Gram + one batched Cholesky solve — dense
[nb, cap, k] x [nb, cap, k] -> [nb, k, k] contractions that tile onto
the MXU, O(log max_deg) compiled shapes total.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from matfac_tpu.config import Params
from matfac_tpu.data.batching import RowBucket, bucketed_rows
from matfac_tpu.models.base import MFState


@functools.partial(jax.jit, static_argnames=("reg",), donate_argnums=(0,))
def _solve_bucket(target_fac: jax.Array, source_fac: jax.Array,
                  row_ids: jax.Array, cols: jax.Array, vals: jax.Array,
                  mask: jax.Array, reg: float) -> jax.Array:
    """Solve rows `row_ids` of target_fac from their padded rated lists.

    cols/vals/mask: [nb, cap]; source_fac: [n_src, k].
    """
    k = target_fac.shape[1]
    q = source_fac[cols]                                  # [nb, cap, k]
    w = (mask * (vals > 0)).astype(q.dtype)               # rating>0 gate
    qm = q * w[:, :, None]
    # Gram: sum_c w * q q^T  (w is 0/1 so one-sided masking suffices)
    yty = jnp.einsum("bck,bcl->bkl", qm, q,
                     preferred_element_type=jnp.float32)
    b = jnp.einsum("bc,bck->bk", vals * w, q,
                   preferred_element_type=jnp.float32)
    yty = yty + reg * jnp.eye(k, dtype=yty.dtype)[None]
    chol = jax.lax.linalg.cholesky(yty)
    sol = jax.lax.linalg.triangular_solve(
        chol, b[..., None], left_side=True, lower=True)
    sol = jax.lax.linalg.triangular_solve(
        chol, sol, left_side=True, lower=True, transpose_a=True)
    sol = sol[..., 0].astype(target_fac.dtype)
    # dummy padded rows (mask all-zero) would clobber row 0 — route their
    # writes out of range so the scatter drops them
    real = (jnp.sum(mask, axis=1) > 0)
    safe_ids = jnp.where(real, row_ids, target_fac.shape[0])
    return target_fac.at[safe_ids].set(sol, mode="drop")


class ALSSolver:
    """Owns the bucketed row/column layouts and runs one ALS sweep per
    epoch (user pass then item pass, like modelMF.cpp:795-880)."""

    def __init__(self, model, params: Params, train_mat,
                 invalid_users: np.ndarray, invalid_items: np.ndarray,
                 **_):
        self.model = model
        self.params = params
        self.u_buckets: List[RowBucket] = bucketed_rows(
            train_mat, invalid=invalid_users)
        self.i_buckets: List[RowBucket] = bucketed_rows(
            train_mat.transpose(), invalid=invalid_items)
        self._stage = [
            [(jnp.asarray(b.row_ids), jnp.asarray(b.cols),
              jnp.asarray(b.vals), jnp.asarray(b.mask)) for b in bs]
            for bs in (self.u_buckets, self.i_buckets)]

    def epoch(self, state: MFState, lr: float, key) -> MFState:
        del lr, key  # ALS has no step size / randomness
        u_fac, i_fac = state.u_fac, state.i_fac
        for ids, cols, vals, mask in self._stage[0]:
            u_fac = _solve_bucket(u_fac, i_fac, ids, cols, vals, mask,
                                  float(self.params.u_reg))
        for ids, cols, vals, mask in self._stage[1]:
            i_fac = _solve_bucket(i_fac, u_fac, ids, cols, vals, mask,
                                  float(self.params.i_reg))
        return state._replace(u_fac=u_fac, i_fac=i_fac)
