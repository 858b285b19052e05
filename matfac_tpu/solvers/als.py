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


@functools.partial(jax.jit, static_argnames=("reg", "d"),
                   donate_argnums=(0,))
def _subspace_solve_bucket(target_fac, source_fac, row_ids, cols, vals,
                           mask, blocks, reg: float, d: int):
    """One iALS++-style sweep over a bucket: for each coordinate block S
    (|S| = d), solve the d x d normal equations for the block holding
    all other coordinates fixed (subspace optimization — iALS++,
    arXiv:2110.14044; explicit-feedback form). Residuals are maintained
    incrementally so a full sweep costs O(|R_u| k d + k d^2) instead of
    ALS's O(|R_u| k^2 + k^3).

    blocks: [n_blocks, d] int32 coordinate indices (a shuffled partition
    of range(k)).
    """
    q = source_fac[cols]                                  # [nb, cap, k]
    w = (mask * (vals > 0)).astype(q.dtype)               # rating>0 gate
    p0 = target_fac[row_ids]                              # [nb, k]
    pred = jnp.einsum("bk,bck->bc", p0, q,
                      preferred_element_type=jnp.float32)

    def block_step(carry, S):
        p, pred = carry
        qS = jnp.take(q, S, axis=2)                       # [nb, cap, d]
        qSw = qS * w[:, :, None]
        H = jnp.einsum("bcd,bce->bde", qSw, qS,
                       preferred_element_type=jnp.float32) \
            + reg * jnp.eye(d, dtype=jnp.float32)[None]
        e = (vals - pred) * w
        g = jnp.einsum("bc,bcd->bd", e, qS,
                       preferred_element_type=jnp.float32) \
            - reg * jnp.take(p, S, axis=1)
        chol = jax.lax.linalg.cholesky(H)
        delta = jax.lax.linalg.triangular_solve(
            chol, g[..., None], left_side=True, lower=True)
        delta = jax.lax.linalg.triangular_solve(
            chol, delta, left_side=True, lower=True,
            transpose_a=True)[..., 0]
        p = p.at[:, S].add(delta.astype(p.dtype))
        pred = pred + jnp.einsum("bd,bcd->bc", delta, qS,
                                 preferred_element_type=jnp.float32)
        return (p, pred), None

    (p, _), _ = jax.lax.scan(block_step, (p0, pred), blocks)
    real = (jnp.sum(mask, axis=1) > 0)
    safe_ids = jnp.where(real, row_ids, target_fac.shape[0])
    return target_fac.at[safe_ids].set(p, mode="drop")


class SubspaceALSSolver(ALSSolver):
    """iALS++-style block-coordinate ALS: same bucketed layout, but each
    sweep solves k/d subspace systems of size d instead of one k x k
    system — the scaling win for large fac_dim (PAPERS.md iALS++)."""

    def __init__(self, model, params: Params, train_mat,
                 invalid_users, invalid_items, block_dim: int = 16, **_):
        super().__init__(model, params, train_mat, invalid_users,
                         invalid_items)
        k = params.fac_dim
        self.d = min(block_dim, k)
        if k % self.d != 0:
            # pad the block list by wrapping (coords may repeat across
            # blocks within a sweep; harmless for coordinate descent)
            n_blocks = -(-k // self.d)
            idx = np.resize(np.arange(k), n_blocks * self.d)
        else:
            idx = np.arange(k)
        self._block_idx = idx.reshape(-1, self.d).astype(np.int32)

    def epoch(self, state: MFState, lr: float, key) -> MFState:
        del lr
        if key is not None:
            perm = np.asarray(jax.random.permutation(
                key, self._block_idx.shape[0]))
        else:
            perm = np.arange(self._block_idx.shape[0])
        blocks = jnp.asarray(self._block_idx[perm])
        u_fac, i_fac = state.u_fac, state.i_fac
        for ids, cols, vals, mask in self._stage[0]:
            u_fac = _subspace_solve_bucket(
                u_fac, i_fac, ids, cols, vals, mask, blocks,
                float(self.params.u_reg), self.d)
        for ids, cols, vals, mask in self._stage[1]:
            i_fac = _subspace_solve_bucket(
                i_fac, u_fac, ids, cols, vals, mask, blocks,
                float(self.params.i_reg), self.d)
        return state._replace(u_fac=u_fac, i_fac=i_fac)
