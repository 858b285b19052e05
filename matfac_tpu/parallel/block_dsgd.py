"""Block-DSGD: the one-hot MXU engine nested inside mesh-sharded DSGD.

parallel/dsgd.py shards factor tables over a 1-D mesh and rotates item
blocks by `lax.ppermute` (Gemulla DSGD; modelMF.cpp:154-350), but its
per-shard inner update is the scatter engine — per-index-bound at
~38M ratings/s/shard (PERF.md). This solver keeps the identical outer
structure (same rounds, same rotation, same disjointness) and replaces
each shard-round's inner sweep with the single-chip block engine's
DIAG schedule (ops/block_sgd_kernel.block_sweep_diag): the
(shard-users x item-block) cell is sub-blocked into (sub_bu x sub_bi)
cells, and each inner round batches SI axis-disjoint sub-cells into
one vmapped one-hot matmul group — per-shard throughput ≈ the
single-chip block engine instead of the scatter engine.

Layout:
  * users keep their CONTIGUOUS shard assignment (same ownership as
    DSGDShardedSolver) but are frequency-balanced WITHIN each shard
    block across its sub-blocks (rank r in the shard ->
    sub-block r % SU, slot r // SU) so power-law mass spreads evenly;
  * items are snake-balanced ACROSS shard blocks (parallel/dsgd.py
    balance_items) and interleaved within each block the same way;
  * streams are staged per (shard, round) in the row-schedule layout
    block_sweep_rows expects ([SU, SI*S]), sharded [N, N, SU, SI*S]
    over the mesh axis so each shard holds only its own rounds.

Semantics: identical update math to BlockSGDSolver (sum of
within-batch gradients with optional collision normalization); the
outer rotation is identical to DSGDShardedSolver. Per-epoch randomness
= per-round random sub-row order / sub-cell order / batch offsets,
derived on-device from the epoch key (multi-host safe).

Limitations: staging is single-process (the scatter DSGD remains the
multi-host-staged path); Poisson-sampled ranks route to DSGD/SGD
(static-rank staging — see BlockSGDSolver guard).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from matfac_tpu.config import Params
from matfac_tpu.models.base import MFState
from matfac_tpu.ops.block_sgd_kernel import block_sweep_diag


def _cdiv(a, b):
    return -(-a // b)


def _interleave_local(rank: np.ndarray, n_sub: int, sub: int
                      ) -> np.ndarray:
    """rank within a block (0 = most frequent) -> local id that
    round-robins frequency over the n_sub sub-blocks."""
    return (rank % n_sub) * sub + rank // n_sub


class BlockDSGDSolver:
    def __init__(self, model, params: Params, train_mat,
                 invalid_users: np.ndarray, invalid_items: np.ndarray,
                 mesh: Mesh, axis: str = "u", sub_bu: int = 384,
                 sub_bi: int = 384, batch_size: int = 1024,
                 collision_norm: Optional[bool] = None,
                 mm_bf16: bool = True, pad_k: int = 0):
        if model.use_bias or not model.use_factors:
            raise ValueError("BlockDSGDSolver is factor-only")
        if jax.process_count() > 1:
            raise ValueError(
                "BlockDSGDSolver stages single-process (every process "
                "would build a conflicting 'global' stream); use "
                "DSGDShardedSolver, which stages per-process via "
                "make_array_from_process_local_data")
        if hasattr(model, "pair_lambda"):
            raise ValueError(
                "block engines stage static per-pair ranks; "
                f"{model.name} needs Poisson-sampled ranks — use "
                "DSGDShardedSolver")
        self.model = model
        self.params = params
        self.mesh = mesh
        self.axis = axis
        self.mm_bf16 = mm_bf16
        self.pad_k = max(int(pad_k), 0)
        if self.pad_k and self.pad_k < model.k:
            raise ValueError("pad_k must be >= fac_dim")
        self.collision_norm = (params.sgd_collision_norm
                               if collision_norm is None
                               else collision_norm)
        N = mesh.shape[axis]
        self.n_shards = N
        n_users, n_items = model.n_users, model.n_items
        # shard block sizes, rounded so sub-blocks tile exactly
        self.bu = _cdiv(_cdiv(n_users, N), sub_bu) * sub_bu
        self.bi = _cdiv(_cdiv(n_items, N), sub_bi) * sub_bi
        self.SU = self.bu // sub_bu
        self.SI = self.bi // sub_bi
        self.sub_bu, self.sub_bi = sub_bu, sub_bi
        self.n_users_pad = self.bu * N
        self.n_items_pad = self.bi * N

        r, c, v = train_mat.to_coo()
        keep = ~invalid_users[r] & ~invalid_items[c]
        r, c, v = r[keep], c[keep], v[keep]
        self.nnz = len(r)
        u_freq = np.bincount(r, minlength=n_users)
        i_freq = np.bincount(c, minlength=n_items)

        # ---- user permutation: contiguous shard ownership (old id //
        # ceil(n_users/N) like DSGD), frequency-interleaved locally ----
        own = np.minimum(np.arange(n_users) // _cdiv(n_users, N), N - 1)
        u_perm = np.empty(n_users, np.int64)
        for sh in range(N):
            ids = np.nonzero(own == sh)[0]
            rank = np.empty(len(ids), np.int64)
            rank[np.argsort(-u_freq[ids], kind="stable")] = \
                np.arange(len(ids))
            u_perm[ids] = sh * self.bu + _interleave_local(
                rank, self.SU, sub_bu)
        self.u_perm = u_perm

        # ---- item permutation: snake across shard blocks +
        # frequency interleave within each block ----
        order = np.argsort(-i_freq, kind="stable")
        blk = np.arange(n_items) % N
        pos = np.arange(n_items) // N
        snake_blk = np.where(pos % 2 == 1, N - 1 - blk, blk)
        i_perm = np.empty(n_items, np.int64)
        i_perm[order] = snake_blk * self.bi + _interleave_local(
            pos, self.SI, sub_bi)
        self.i_perm = i_perm

        self.u_perm_dev = jnp.asarray(u_perm.astype(np.int32))
        self.i_perm_dev = jnp.asarray(i_perm.astype(np.int32))
        u_inv = np.zeros(self.n_users_pad, np.int64)
        u_inv[u_perm] = np.arange(n_users)
        i_inv = np.zeros(self.n_items_pad, np.int64)
        i_inv[i_perm] = np.arange(n_items)
        self.u_perm_inv_dev = jnp.asarray(u_inv.astype(np.int32))
        self.i_perm_inv_dev = jnp.asarray(i_inv.astype(np.int32))

        # model hooks BEFORE relabeling
        w = np.asarray(model.example_weight(
            jnp.asarray(r.astype(np.int32)),
            jnp.asarray(c.astype(np.int32)))).astype(np.float32)
        if hasattr(model, "pair_rank"):
            lam = np.asarray(model.pair_rank(
                jnp.asarray(r.astype(np.int32)),
                jnp.asarray(c.astype(np.int32)))).astype(np.int32)
            self.use_mask = True
        else:
            lam = np.full(len(r), model.k, np.int32)
            self.use_mask = False

        r2 = u_perm[r]
        c2 = i_perm[c]
        sh = r2 // self.bu
        ib = c2 // self.bi
        t = (ib - sh) % N
        su = (r2 % self.bu) // sub_bu
        si = (c2 % self.bi) // sub_bi
        cell = ((sh * N + t) * self.SU + su) * self.SI + si
        n_cells = N * N * self.SU * self.SI
        counts = np.bincount(cell, minlength=n_cells)
        S = max(int(counts.max()), 1)
        S = _cdiv(S, batch_size) * batch_size
        self.S = S
        self.bs = min(batch_size, S)
        self.pad_frac = n_cells * S / max(self.nnz, 1)

        u_loc = np.zeros((n_cells, S), np.int32)
        i_loc = np.zeros((n_cells, S), np.int32)
        vals = np.zeros((n_cells, S), np.float32)
        wts = np.zeros((n_cells, S), np.float32)
        lams = np.ones((n_cells, S), np.int32)
        # vectorized random order within cells (one lexsort, not a
        # python loop over n_cells — N^2*SU*SI cells at scale)
        rng = np.random.default_rng(params.seed * 31337 + 7)
        order = np.lexsort((rng.random(len(r2)), cell))
        r2, c2, v, w, lam = (r2[order], c2[order], v[order], w[order],
                             lam[order])
        cell = cell[order]
        pos = np.arange(len(r2)) - np.searchsorted(cell, cell, "left")
        u_loc[cell, pos] = (r2 % sub_bu).astype(np.int32)
        i_loc[cell, pos] = (c2 % sub_bi).astype(np.int32)
        vals[cell, pos] = v
        wts[cell, pos] = w
        lams[cell, pos] = lam

        if self.collision_norm:
            from matfac_tpu.solvers.block_sgd import (
                stage_batch_collision_counts)
            cnu = stage_batch_collision_counts(wts, u_loc, self.bs,
                                               sub_bu)
            cni = stage_batch_collision_counts(wts, i_loc, self.bs,
                                               sub_bi)
        else:
            cnu = cni = wts

        # cell-major [N, N, SU*SI + 1, S] (dummy all-invalid last row
        # per shard-round, addressed by the diag schedule's pad lanes),
        # sharded over the mesh axis
        nc_sr = self.SU * self.SI
        sharding = NamedSharding(mesh, P(axis, None, None, None))

        def put(a, fill):
            a = a.reshape(N, N, nc_sr, S)
            a = np.concatenate(
                [a, np.full((N, N, 1, S), fill, a.dtype)], axis=2)
            return jax.device_put(jnp.asarray(a), sharding)

        self.u_loc = put(u_loc, 0)
        self.i_loc = put(i_loc, 0)
        self.vals = put(vals, 0)
        self.wts = put(wts, 0)
        self.lams = put(lams, 1)
        self.cnu = put(cnu, 1.0) if self.collision_norm else self.wts
        self.cni = put(cni, 1.0) if self.collision_norm else self.wts
        self._epoch = self._build_epoch()
        self._resident = None
        self._last_u_view = None
        self._last_i_view = None

    # ------------------------------------------------------------------
    def _build_epoch(self):
        N = self.n_shards
        SU, SI, S, bs = self.SU, self.SI, self.S, self.bs
        sub_bu, sub_bi = self.sub_bu, self.sub_bi
        n_steps = S // bs
        u_reg = float(self.params.u_reg)
        i_reg = float(self.params.i_reg)
        axis = self.axis
        mesh = self.mesh
        k_dim = self.pad_k or self.model.k
        kw = dict(bs=bs, bu=sub_bu, bi=sub_bi, NI=SI, u_reg=u_reg,
                  i_reg=i_reg, collision_norm=self.collision_norm,
                  use_mask=self.use_mask, mm_bf16=self.mm_bf16)
        from matfac_tpu.ops.block_sgd_kernel import device_diag_schedule

        def diag_schedule(key):
            return device_diag_schedule(key, SU, SI, n_steps)

        def shard_epoch(u_fac, i_fac, u_loc, i_loc, vals, wts, cnu,
                        cni, lams, lr, key):
            streams = [x[0] for x in (u_loc, i_loc, vals, wts, cnu,
                                      cni, lams)]   # [N, SU*SI+1, S]
            me = jax.lax.axis_index(axis)
            # shard-local 3-D table views (+ dummy user sub-block)
            u3 = jnp.concatenate(
                [u_fac.reshape(SU, sub_bu, k_dim),
                 jnp.zeros((1, sub_bu, k_dim), jnp.float32)], axis=0)

            def round_body(t, carry):
                u3, i_blk, key = carry
                key, ks = jax.random.split(key)
                ub_idx, ib_idx, boff = diag_schedule(
                    jax.random.fold_in(ks, me))
                st = [jax.lax.dynamic_index_in_dim(x, t, 0, False)
                      for x in streams]
                i3 = i_blk.reshape(SI, sub_bi, k_dim)
                u3, i3 = block_sweep_diag(
                    u3, i3, ub_idx, ib_idx, boff, lr,
                    st[0], st[1], st[2], st[3], st[4], st[5], st[6],
                    **kw)
                i_blk = i3.reshape(SI * sub_bi, k_dim)
                i_blk = jax.lax.ppermute(
                    i_blk, axis, [(j, (j - 1) % N) for j in range(N)])
                return (u3, i_blk, key)

            u3, i_fac, key = jax.lax.fori_loop(
                0, N, round_body, (u3, i_fac, key))
            u_fac = u3[:SU].reshape(SU * sub_bu, k_dim)
            return u_fac, i_fac

        fac_spec = P(axis, None)
        dat_spec = P(axis, None, None, None)
        mapped = jax.shard_map(
            shard_epoch, mesh=mesh,
            in_specs=(fac_spec, fac_spec) + (dat_spec,) * 7 + (P(), P()),
            out_specs=(fac_spec, fac_spec),
            check_vma=False)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def epoch(u_fac, i_fac, u_loc, i_loc, vals, wts, cnu, cni,
                  lams, lr, key):
            return mapped(u_fac, i_fac, u_loc, i_loc, vals, wts, cnu,
                          cni, lams, lr, key)

        return epoch

    # ------------------------------------------------------------------
    def _stage_factors(self, state: MFState):
        u = state.u_fac[self.u_perm_inv_dev].astype(jnp.float32)
        i = state.i_fac[self.i_perm_inv_dev].astype(jnp.float32)
        if self.pad_k > u.shape[1]:
            pad = self.pad_k - u.shape[1]
            u = jnp.pad(u, ((0, 0), (0, pad)))
            i = jnp.pad(i, ((0, 0), (0, pad)))
        sh = NamedSharding(self.mesh, P(self.axis, None))
        return jax.device_put(u, sh), jax.device_put(i, sh)

    def epoch(self, state: MFState, lr: float, key) -> MFState:
        if (self._resident is not None
                and state.u_fac is self._last_u_view
                and state.i_fac is self._last_i_view):
            u_fac, i_fac = self._resident
        else:
            u_fac, i_fac = self._stage_factors(state)
        u_fac, i_fac = self._epoch(
            u_fac, i_fac, self.u_loc, self.i_loc, self.vals, self.wts,
            self.cnu, self.cni, self.lams, jnp.float32(lr), key)
        self._resident = (u_fac, i_fac)
        u_view = u_fac[self.u_perm_dev][:, : self.model.k]
        i_view = i_fac[self.i_perm_dev][:, : self.model.k]
        self._last_u_view, self._last_i_view = u_view, i_view
        return state._replace(
            u_fac=u_view.astype(state.u_fac.dtype),
            i_fac=i_view.astype(state.i_fac.dtype))
