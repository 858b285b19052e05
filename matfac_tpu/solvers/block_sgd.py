"""Cell-blocked SGD solver — host staging for ops/block_sgd_kernel.

Single-chip engine with the same update semantics as SGDSolver (per
modelMF.cpp:83-105 + optional collision normalization) but restructured
into (user-block x item-block) cells so the Pallas kernel can hold both
factor blocks in VMEM and run the per-batch gathers/scatters as one-hot
MXU matmuls (see ops/block_sgd_kernel.py for the roofline argument).

Users and items are RELABELED (round-robin over descending train
frequency, snake order) so the power-law mass spreads evenly over
blocks — this bounds the padded cell size S (cells are padded to the
max cell population). The relabeling permutations are applied to the
factor tables on entry and undone on exit; tables stay resident in the
relabeled/padded layout across epochs (same pattern as
parallel/dsgd.py).

Supports plain MF, IFWMF weights and deterministic TMF rank masks
(static per pair, staged with the stream). Poisson-sampled ranks and
bias models route to SGDSolver instead.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from matfac_tpu.config import Params
from matfac_tpu.models.base import MFState
from matfac_tpu.ops.block_sgd_kernel import (block_sgd_epoch,
                                             block_sgd_epoch_xla)


def _cdiv(a, b):
    return -(-a // b)


def _balance_perm(freq: np.ndarray, n: int, n_blocks: int,
                  block: int) -> np.ndarray:
    """old id -> new id; round-robin blocks over descending frequency,
    snake order (parallel/dsgd.py balance_items)."""
    order = np.argsort(-freq, kind="stable")
    perm = np.empty(n, np.int64)
    pos_in_block = np.arange(n) // n_blocks
    blk = np.arange(n) % n_blocks
    snake = np.where(pos_in_block % 2 == 1, n_blocks - 1 - blk, blk)
    perm[order] = snake * block + pos_in_block
    return perm


class BlockSGDSolver:
    def __init__(self, model, params: Params, train_mat,
                 invalid_users: np.ndarray, invalid_items: np.ndarray,
                 batch_size: int = 256, bu: int = 1024, bi: int = 1024,
                 collision_norm: Optional[bool] = None,
                 mm_bf16: bool = True, interpret: bool = False,
                 engine: str = "xla"):
        """``engine``: "xla" (default — pure-XLA one-hot MXU epoch,
        works on every backend) or "pallas" (VMEM-resident tables;
        currently crashes the axon remote Mosaic compile at any scale,
        kept for when the toolchain recovers + interpret-mode parity
        tests)."""
        if model.use_bias or not model.use_factors:
            raise ValueError("BlockSGDSolver is factor-only")
        if getattr(model, "name", "") == "tmf_dropout":
            raise ValueError("Poisson-sampled ranks need SGDSolver")
        self.model = model
        self.params = params
        self.interpret = interpret
        self.engine = engine
        self.mm_bf16 = mm_bf16
        self.collision_norm = (params.sgd_collision_norm
                               if collision_norm is None
                               else collision_norm)
        n_users, n_items = model.n_users, model.n_items
        k = model.k
        self.bu, self.bi = bu, bi
        self.NU = _cdiv(n_users, bu)
        self.NI = _cdiv(n_items, bi)
        self.n_users_pad = self.NU * bu
        self.n_items_pad = self.NI * bi

        # VMEM ceiling (pallas engine only): the whole padded item
        # table lives on-chip. The XLA engine keeps tables in HBM and
        # has no such limit.
        vmem_need = self.n_items_pad * k * 4
        if engine == "pallas" and vmem_need > 11 * 1024 * 1024:
            raise ValueError(
                f"item table {vmem_need/2**20:.1f} MiB exceeds the VMEM "
                "budget of the block kernel; use engine='xla'")

        r, c, v = train_mat.to_coo()
        keep = ~invalid_users[r] & ~invalid_items[c]
        r, c, v = r[keep], c[keep], v[keep]
        self.nnz = len(r)

        # frequency-balanced relabeling of BOTH axes
        u_freq = np.bincount(r, minlength=n_users)
        i_freq = np.bincount(c, minlength=n_items)
        self.u_perm = _balance_perm(u_freq, n_users, self.NU, bu)
        self.i_perm = _balance_perm(i_freq, n_items, self.NI, bi)
        self.u_perm_dev = jnp.asarray(self.u_perm.astype(np.int32))
        self.i_perm_dev = jnp.asarray(self.i_perm.astype(np.int32))
        # inverse over the PADDED label space (perm image is a
        # non-contiguous subset of [0, n_pad)); rows outside the image
        # are dead padding and read row 0 harmlessly
        u_inv = np.zeros(self.n_users_pad, np.int64)
        u_inv[self.u_perm] = np.arange(n_users)
        i_inv = np.zeros(self.n_items_pad, np.int64)
        i_inv[self.i_perm] = np.arange(n_items)
        self.u_perm_inv_dev = jnp.asarray(u_inv.astype(np.int32))
        self.i_perm_inv_dev = jnp.asarray(i_inv.astype(np.int32))

        # model hooks BEFORE relabeling (freq tables are in old ids)
        w = np.asarray(model.example_weight(
            jnp.asarray(r.astype(np.int32)),
            jnp.asarray(c.astype(np.int32)))).astype(np.float32)
        if hasattr(model, "pair_rank"):
            lam = np.asarray(model.pair_rank(
                jnp.asarray(r.astype(np.int32)),
                jnp.asarray(c.astype(np.int32)))).astype(np.int32)
            self.use_mask = True
        else:
            lam = np.full(len(r), k, np.int32)
            self.use_mask = False

        r = self.u_perm[r]
        c = self.i_perm[c]
        ub = r // bu
        ib = c // bi
        cell = ub * self.NI + ib
        n_cells = self.NU * self.NI
        counts = np.bincount(cell, minlength=n_cells)
        S = max(int(counts.max()), 1)
        S = _cdiv(S, batch_size) * batch_size
        self.S = S
        self.bs = min(batch_size, S)
        self.pad_frac = n_cells * S / max(self.nnz, 1)

        # [NU, NI*S]: each user-block row's cells contiguous, ib order
        u_loc = np.zeros((n_cells, S), np.int32)
        i_loc = np.zeros((n_cells, S), np.int32)
        vals = np.zeros((n_cells, S), np.float32)
        wts = np.zeros((n_cells, S), np.float32)
        lams = np.ones((n_cells, S), np.int32)
        order = np.argsort(cell, kind="stable")
        r, c, v, w, lam = r[order], c[order], v[order], w[order], lam[order]
        cell = cell[order]
        pos = np.arange(len(r)) - np.searchsorted(cell, cell, "left")
        u_loc[cell, pos] = (r % bu).astype(np.int32)
        i_loc[cell, pos] = (c % bi).astype(np.int32)
        vals[cell, pos] = v
        wts[cell, pos] = w
        lams[cell, pos] = lam
        # static per-cell shuffle (stream is row-sorted; see solvers/sgd)
        for cc in np.nonzero(counts > 1)[0]:
            rng = np.random.default_rng(params.seed * 999983 + int(cc))
            p = rng.permutation(int(counts[cc]))
            for arr in (u_loc, i_loc, vals, wts, lams):
                arr[cc, : len(p)] = arr[cc, : len(p)][p]

        shape = (self.NU, self.NI * S)
        self.u_loc = jnp.asarray(u_loc.reshape(shape))
        self.i_loc = jnp.asarray(i_loc.reshape(shape))
        self.vals = jnp.asarray(vals.reshape(shape))
        self.wts = jnp.asarray(wts.reshape(shape))
        self.lams = jnp.asarray(lams.reshape(shape))
        self._sched_rng = np.random.default_rng(params.seed + 41)
        self._resident = None
        self._last_u_view = None
        self._last_i_view = None

    # ------------------------------------------------------------------
    def _build_schedule(self):
        """Per-epoch randomness: random user-row order, random cell
        order within each row, random batch offset within each cell."""
        rng = self._sched_rng
        row_of = rng.permutation(self.NU).astype(np.int32)
        ib_seq = np.stack([rng.permutation(self.NI)
                           for _ in range(self.NU)]).astype(np.int32)
        boff = rng.integers(0, max(self.S // self.bs, 1),
                            size=(self.NU, self.NI)).astype(np.int32)
        return (jnp.asarray(row_of), jnp.asarray(ib_seq),
                jnp.asarray(boff))

    def _stage_factors(self, state: MFState):
        # staged[new_id] = logical[inv[new_id]] over the padded space
        u = state.u_fac[self.u_perm_inv_dev]
        i = state.i_fac[self.i_perm_inv_dev]
        return u.astype(jnp.float32), i.astype(jnp.float32)

    def epoch(self, state: MFState, lr: float, key) -> MFState:
        del key  # randomness comes from the host schedule rng
        if (self._resident is not None
                and state.u_fac is self._last_u_view
                and state.i_fac is self._last_i_view):
            u_tab, i_tab = self._resident
        else:
            u_tab, i_tab = self._stage_factors(state)
        row_of, ib_seq, boff = self._build_schedule()
        common = dict(
            bs=self.bs, bu=self.bu, bi=self.bi, NI=self.NI,
            u_reg=float(self.params.u_reg),
            i_reg=float(self.params.i_reg),
            collision_norm=self.collision_norm,
            use_mask=self.use_mask, mm_bf16=self.mm_bf16)
        if self.engine == "xla":
            u_tab, i_tab = block_sgd_epoch_xla(
                u_tab, i_tab, row_of, ib_seq, boff, jnp.float32(lr),
                self.u_loc, self.i_loc, self.vals, self.wts,
                self.lams, **common)
        else:
            u_tab, i_tab = block_sgd_epoch(
                u_tab, i_tab, row_of, ib_seq, boff, jnp.float32(lr),
                self.u_loc, self.i_loc, self.vals, self.wts,
                self.lams, interpret=self.interpret, **common)
        self._resident = (u_tab, i_tab)
        # logical[old] = staged[perm[old]] (perm values span the padded
        # space, so gather BEFORE any truncation)
        u_view = u_tab[self.u_perm_dev]
        i_view = i_tab[self.i_perm_dev]
        self._last_u_view, self._last_i_view = u_view, i_view
        return state._replace(u_fac=u_view.astype(state.u_fac.dtype),
                              i_fac=i_view.astype(state.i_fac.dtype))
