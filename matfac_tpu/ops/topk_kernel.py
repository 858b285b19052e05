"""Pallas TPU kernel: fused full-catalog top-N scoring.

The eval hot path (SURVEY.md §7 "sharded top-k scoring kernel"):
HR@N / ARHR score every unrated item for every user
(model.cpp:1182-1193 walks a heap per user). The XLA path
(eval/ranking.py) does matmul -> mask -> concat -> top_k with
intermediate [BU, IB] score tiles round-tripping through HBM; this
kernel fuses score + rated-item exclusion + running top-N entirely in
VMEM per (user-block x item-block) tile:

  * scores = u_blk @ i_blk^T on the MXU,
  * exclusion by comparing tile column ids against each user's padded
    rated-in-tile list (Cmax broadcast-compare passes, VPU),
  * N iterative masked-max extractions produce the tile's top-N,
  * merged with the running top-N carried in the output ref.

Grid = (item blocks); one pallas_call per user block. The rated-in-tile
lists are staged host-side (data/batching-style padding).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38   # python float: jnp scalars become captured consts in pallas


def _topn_from_tile(scores, col_base, n):
    """Top-n of a [BU, IB] tile -> (vals [BU, n], ids [BU, n]) by
    iterative masked max-extraction (n passes on the VPU)."""
    BU, IB = scores.shape
    col_ids = col_base + jax.lax.broadcasted_iota(jnp.int32, (BU, IB), 1)
    vals = []
    ids = []
    s = scores
    big = jnp.int32(2 ** 30)
    for _ in range(n):
        m = jnp.max(s, axis=1, keepdims=True)              # [BU, 1]
        # tie-break by smallest column id (ids are unique per tile, so
        # exactly one position is picked; no cumsum — unsupported in
        # Mosaic lowering)
        idx = jnp.min(jnp.where(s == m, col_ids, big), axis=1,
                      keepdims=True)
        pick = col_ids == idx
        vals.append(m)
        ids.append(jnp.where(idx == big, -1, idx))
        s = jnp.where(pick, NEG_INF, s)
    return jnp.concatenate(vals, axis=1), jnp.concatenate(ids, axis=1)


def _merge_sorted(v1, i1, v2, i2, n):
    """Merge two per-row desc-sorted top-n lists -> top-n of the union.
    Implemented as 2n-way concat + n extraction passes (small n)."""
    v = jnp.concatenate([v1, v2], axis=1)
    i = jnp.concatenate([i1, i2], axis=1)
    # position ids break value ties uniquely (item ids are unique across
    # the union except -1 pads, which only carry NEG_INF values)
    BU, W = v.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (BU, W), 1)
    big = jnp.int32(2 ** 30)
    outs_v, outs_i = [], []
    for _ in range(n):
        m = jnp.max(v, axis=1, keepdims=True)
        p_idx = jnp.min(jnp.where(v == m, pos, big), axis=1,
                        keepdims=True)
        pick = pos == p_idx
        idx = jnp.max(jnp.where(pick, i, -1), axis=1, keepdims=True)
        outs_v.append(m)
        outs_i.append(idx)
        v = jnp.where(pick, NEG_INF, v)
    return jnp.concatenate(outs_v, axis=1), \
        jnp.concatenate(outs_i, axis=1)


def _make_kernel(n: int, c_max: int, item_block: int):
    def kernel(u_ref, i_ref, ibias_ref, inval_ref, rated_ref,
               out_v_ref, out_i_ref):
        t = pl.program_id(0)
        col_base = t * item_block

        @pl.when(t == 0)
        def _():
            out_v_ref[:, :] = jnp.full_like(out_v_ref, NEG_INF)
            out_i_ref[:, :] = jnp.full_like(out_i_ref, -1)

        scores = jnp.dot(u_ref[:, :], i_ref[:, :].T,
                         preferred_element_type=jnp.float32)
        scores = scores + ibias_ref[:, :]          # [1, IB] broadcast
        scores = jnp.where(inval_ref[:, :] > 0, NEG_INF, scores)
        BU, IB = scores.shape
        col_ids = col_base + jax.lax.broadcasted_iota(
            jnp.int32, (BU, IB), 1)
        # exclusion: rated_ref [1, BU, c_max] holds this tile's rated
        # GLOBAL column ids (-1 padded)
        for c in range(c_max):
            rc = rated_ref[0, :, c][:, None]
            scores = jnp.where(col_ids == rc, NEG_INF, scores)
        tv, ti = _topn_from_tile(scores, col_base, n)
        mv, mi = _merge_sorted(out_v_ref[:, :], out_i_ref[:, :], tv, ti,
                               n)
        out_v_ref[:, :] = mv
        out_i_ref[:, :] = mi

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n", "item_block", "c_max",
                                    "interpret"))
def topk_tiles(u_blk: jax.Array, i_fac: jax.Array, i_bias: jax.Array,
               invalid: jax.Array, rated_tiles: jax.Array, n: int,
               item_block: int, c_max: int, interpret: bool = False
               ) -> Tuple[jax.Array, jax.Array]:
    """Top-n unrated items for a block of users.

    u_blk: [BU, k]; i_fac: [I_pad, k] (I_pad % item_block == 0);
    i_bias: [I_pad]; invalid: [I_pad] float (1 = excluded);
    rated_tiles: [n_tiles, BU, c_max] int32 global col ids (-1 pad).
    Returns (scores [BU, n], ids [BU, n]) descending.
    """
    BU, k = u_blk.shape
    I_pad = i_fac.shape[0]
    n_tiles = I_pad // item_block
    kernel = _make_kernel(n, c_max, item_block)
    grid = (n_tiles,)
    out_v, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BU, k), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((item_block, k), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, item_block), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, item_block), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BU, c_max), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BU, n), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BU, n), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BU, n), jnp.float32),
            jax.ShapeDtypeStruct((BU, n), jnp.int32),
        ],
        interpret=interpret,
    )(u_blk, i_fac, i_bias.reshape(1, -1), invalid.reshape(1, -1),
      rated_tiles)
    return out_v, out_i


class PallasCatalogScorer:
    """Drop-in alternative backend for eval.ranking.CatalogScorer's
    topk, using the fused kernel. Falls back to interpret mode off-TPU
    (tests) — the XLA scorer remains the default."""

    def __init__(self, train_mat, invalid_users, invalid_items,
                 n_users: int, n_items: int, user_block: int = 512,
                 item_block: int = 2048, interpret: Optional[bool] = None):
        self.n_users = n_users
        self.n_items = n_items
        self.user_block = user_block
        self.item_block = min(item_block, _round_up(n_items, 128))
        self.I_pad = _round_up(n_items, self.item_block)
        self.n_tiles = self.I_pad // self.item_block
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        inval = np.ones(self.I_pad, np.float32)
        inval[:n_items] = invalid_items[:n_items].astype(np.float32)
        self.invalid = jnp.asarray(inval)
        self.invalid_users = invalid_users

        # rated-in-tile lists [n_user_blocks][n_tiles, BU, c_max] —
        # vectorized staging (O(nnz), no Python per-entry loops)
        self.n_users_pad = _round_up(n_users, user_block)
        r, c, _ = train_mat.to_coo()
        tile = c // self.item_block
        ublk = r // user_block
        ulocal = r % user_block
        # slot of each entry within its (user, tile) group: entries are
        # row-major sorted, and within a row tiles are nondecreasing
        grp = (r.astype(np.int64) * self.n_tiles + tile)
        order = np.argsort(grp, kind="stable")
        grp_s = grp[order]
        slot = np.arange(len(grp_s)) - np.searchsorted(grp_s, grp_s,
                                                       side="left")
        c_max = int(slot.max()) + 1 if len(slot) else 1
        self.c_max = _round_up(max(c_max, 1), 8)
        n_blocks = self.n_users_pad // user_block
        stage = np.full((n_blocks, self.n_tiles, user_block, self.c_max),
                        -1, np.int32)
        stage[ublk[order], tile[order], ulocal[order], slot] = c[order]
        self.rated_tiles = [jnp.asarray(stage[b])
                            for b in range(n_blocks)]

    def topk(self, view, n: int):
        i_fac = view.i_fac
        i_bias = view.i_bias
        pad = self.I_pad - i_fac.shape[0]
        if pad:
            i_fac = jnp.pad(i_fac, ((0, pad), (0, 0)))
            i_bias = jnp.pad(i_bias, (0, pad))
        out_s, out_i = [], []
        B = self.user_block
        for b, s in enumerate(range(0, self.n_users_pad, B)):
            uids = np.arange(s, s + B)
            uids = np.clip(uids, 0, view.u_fac.shape[0] - 1)
            # u_bias is constant per row -> ranking-invariant, omitted
            u_blk = view.u_fac[jnp.asarray(uids)]
            bv, bi = topk_tiles(u_blk, i_fac, i_bias, self.invalid,
                                self.rated_tiles[b], n, self.item_block,
                                self.c_max, interpret=self.interpret)
            out_s.append(np.asarray(bv))
            out_i.append(np.asarray(bi))
        return (np.concatenate(out_s)[: self.n_users],
                np.concatenate(out_i)[: self.n_users])


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m
