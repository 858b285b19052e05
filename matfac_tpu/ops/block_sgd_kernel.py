"""Pallas TPU kernel: cell-blocked SGD epoch via one-hot MXU matmuls.

The measured wall for the XLA SGD engine is per-row gather/scatter issue
rate (~25 ns/row; PERF.md), not HBM bandwidth — epoch time is nearly
independent of k. This kernel removes row-indexed HBM ops entirely:

  * users/items are partitioned into blocks (bu/bi rows); ratings are
    staged into (user-block x item-block) cells (solvers/block_sgd.py),
    the single-chip analog of the DSGD grid (modelMF.cpp:154-350).
  * the epoch is ONE pallas_call with grid = NU user-block rows. The
    ENTIRE item table is a VMEM-persistent output buffer (initialized
    from HBM at step 0, written back once at the end — constant index
    map, so no cross-step aliasing is needed); each step loads its user
    block, sweeps that row's cells in a prefetched random order, and
    every minibatch does

        oh_u = onehot(u)  [b, bu]        (VPU compare vs iota)
        p    = oh_u @ U                  (MXU)
        ...gradient math...              (VPU)
        U   += oh_u.T @ gu               (MXU)

    so gathers/scatters become dense matmuls — per rating
    ~4k(bu+bi) FLOP, which at bf16 MXU rates clears the gather
    engine's ceiling by an order of magnitude.
  * per-example weights (IFWMF) and deterministic rank masks (TMF) ride
    the staged stream; collision normalization (mean of same-entity
    gradients within a batch) rides the stream too — batch CONTENTS are
    static (fixed slices; only batch order is random), so the per-element
    within-batch counts are host-precomputed (solvers/block_sgd.py). The
    first implementation counted on-device with four extra thin matmuls,
    which re-read each one-hot twice: dropping them cut the one-hot HBM
    passes from ~5 to ~3 per side.

VMEM constraint: the padded item table (NI*bi x k f32) plus one stream
row must fit in ~12 MB — holds for 20k items at k<=128; the solver
refuses larger shapes (use SGDSolver/DSGD there).

Status (late round 2, scripts/tpu_pallas_bisect.py / _scale.py): the
remote Mosaic toolchain compiles this kernel up to bu=512/bs=1024 at
the 100k x 20k shape (bigger configs VMEM-oversubscribe and crash the
AOT helper with HTTP 500). Measured 150 ms / 66M ratings/s there —
SLOWER than the XLA diag engine (92 ms / 107M), because the VMEM
budget caps the one-hot block sizes. engine="xla" is the default on
merit (PERF.md "One-hot MXU block engine").
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _batch_update(U, I, u, i, r, w, cn_u, cn_i, lam, lr, k, bu, bi,
                  u_reg, i_reg, collision_norm, use_mask, mm_dtype):
    """One minibatch of one-hot-matmul SGD on factor blocks U [bu,k],
    I [bi,k]. Shared by the Pallas kernel (on VMEM-loaded blocks) and
    the XLA engine (on dynamic-sliced blocks) — identical math, so the
    two engines agree bitwise at f32. cn_u/cn_i [b] are the
    host-precomputed max(within-batch valid count of this element's
    entity, 1) divisors (None unless collision_norm)."""
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (u.shape[0], bu), 1)
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (i.shape[0], bi), 1)
    oh_u = (u[:, None] == iota_u).astype(mm_dtype)
    oh_i = (i[:, None] == iota_i).astype(mm_dtype)
    pu = jnp.dot(oh_u, U.astype(mm_dtype),
                 preferred_element_type=jnp.float32)
    qi = jnp.dot(oh_i, I.astype(mm_dtype),
                 preferred_element_type=jnp.float32)
    if use_mask:
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (u.shape[0], k), 1)
        m = (iota_k < lam[:, None]).astype(jnp.float32)
        pred = jnp.sum(pu * m * qi, axis=1)
    else:
        m = None
        pred = jnp.sum(pu * qi, axis=1)
    coeff = w * (r - pred)
    vmask = (w > 0).astype(jnp.float32)
    gu = -2.0 * coeff[:, None] * qi + 2.0 * u_reg * vmask[:, None] * pu
    gi = -2.0 * coeff[:, None] * pu + 2.0 * i_reg * vmask[:, None] * qi
    if use_mask:
        gu = gu * m
        gi = gi * m
    if collision_norm:
        gu = gu / cn_u[:, None]
        gi = gi / cn_i[:, None]
    U = U + jnp.dot(oh_u.T, (-lr * gu).astype(mm_dtype),
                    preferred_element_type=jnp.float32).astype(U.dtype)
    I = I + jnp.dot(oh_i.T, (-lr * gi).astype(mm_dtype),
                    preferred_element_type=jnp.float32).astype(I.dtype)
    return U, I


def _make_kernel(bs: int, n_steps: int, k: int, bu: int, bi: int,
                 NI: int, S: int, u_reg: float, i_reg: float,
                 collision_norm: bool, use_mask: bool, mm_dtype):
    def kernel(row_of_ref, ib_seq_ref, boff_ref, lr_ref,
               u_loc_ref, i_loc_ref, vals_ref, wts_ref, cnu_ref,
               cni_ref, lam_ref, u_tab_in, i_tab_in, u_out, i_out):
        t = pl.program_id(0)
        # the item table persists in the output buffer across all steps
        @pl.when(t == 0)
        def _():
            i_out[:, :] = i_tab_in[:, :]

        u_out[:, :] = u_tab_in[:, :]
        lr = lr_ref[0]

        def one_cell(j, U):
            ib = ib_seq_ref[t, j]
            boff = boff_ref[t, j]
            base = ib * S
            I = i_out[pl.ds(ib * bi, bi), :]

            def step(s, carry):
                U, I = carry
                start = base + ((s + boff) % n_steps) * bs
                sl = pl.ds(start, bs)
                lam = lam_ref[0, 0, sl] if use_mask else None
                cnu = cnu_ref[0, 0, sl] if collision_norm else None
                cni = cni_ref[0, 0, sl] if collision_norm else None
                return _batch_update(
                    U, I, u_loc_ref[0, 0, sl], i_loc_ref[0, 0, sl],
                    vals_ref[0, 0, sl], wts_ref[0, 0, sl], cnu, cni,
                    lam, lr, k, bu, bi, u_reg, i_reg, collision_norm,
                    use_mask, mm_dtype)

            U, I = jax.lax.fori_loop(0, n_steps, step, (U, I))
            i_out[pl.ds(ib * bi, bi), :] = I
            return U

        U = jax.lax.fori_loop(0, NI, one_cell, u_out[:, :])
        u_out[:, :] = U

    return kernel


@functools.partial(
    jax.jit, donate_argnums=(0, 1),
    static_argnames=("bs", "bu", "bi", "NI", "u_reg", "i_reg",
                     "collision_norm", "use_mask", "mm_bf16",
                     "interpret"))
def block_sgd_epoch(u_tab: jax.Array, i_tab: jax.Array,
                    row_of: jax.Array, ib_seq: jax.Array,
                    boff: jax.Array, lr,
                    u_loc: jax.Array, i_loc: jax.Array, vals: jax.Array,
                    wts: jax.Array, cnu: jax.Array, cni: jax.Array,
                    lam: jax.Array,
                    bs: int, bu: int, bi: int, NI: int,
                    u_reg: float, i_reg: float, collision_norm: bool,
                    use_mask: bool, mm_bf16: bool = True,
                    interpret: bool = False
                    ) -> Tuple[jax.Array, jax.Array]:
    """One full SGD epoch over all cells.

    u_tab [NU*bu, k], i_tab [NI*bi, k] (f32, padded). Stream arrays
    [NU, NI*S] hold each user-block row's cells contiguously in
    ib-ascending order. row_of [NU] = random row order; ib_seq/boff
    [NU, NI] = per-row random cell order and batch offsets.
    """
    NU, row_len = u_loc.shape
    S = row_len // NI
    assert S % bs == 0
    k = u_tab.shape[1]
    mm_dtype = jnp.bfloat16 if mm_bf16 else jnp.float32
    kernel = _make_kernel(bs, S // bs, k, bu, bi, NI, S, u_reg, i_reg,
                          collision_norm, use_mask, mm_dtype)
    n_items_pad = i_tab.shape[0]
    # stream arrays ride as [NU, 1, row_len] so the last-two block dims
    # (1, row_len) EQUAL the array dims — Mosaic requires last-two block
    # dims divisible by (8, 128) or exactly equal (observed lowering
    # error with 2-D (1, row_len) blocks over a [NU, row_len] array)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,   # row_of, ib_seq, boff, lr
        grid=(NU,),
        in_specs=[
            pl.BlockSpec((1, 1, row_len), lambda t, ro, ibs, bo, lr:
                         (ro[t], 0, 0)),
            pl.BlockSpec((1, 1, row_len), lambda t, ro, ibs, bo, lr:
                         (ro[t], 0, 0)),
            pl.BlockSpec((1, 1, row_len), lambda t, ro, ibs, bo, lr:
                         (ro[t], 0, 0)),
            pl.BlockSpec((1, 1, row_len), lambda t, ro, ibs, bo, lr:
                         (ro[t], 0, 0)),
            pl.BlockSpec((1, 1, row_len), lambda t, ro, ibs, bo, lr:
                         (ro[t], 0, 0)),
            pl.BlockSpec((1, 1, row_len), lambda t, ro, ibs, bo, lr:
                         (ro[t], 0, 0)),
            pl.BlockSpec((1, 1, row_len), lambda t, ro, ibs, bo, lr:
                         (ro[t], 0, 0)),
            pl.BlockSpec((bu, k), lambda t, ro, ibs, bo, lr:
                         (ro[t], 0)),
            pl.BlockSpec((n_items_pad, k), lambda t, ro, ibs, bo, lr:
                         (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bu, k), lambda t, ro, ibs, bo, lr:
                         (ro[t], 0)),
            pl.BlockSpec((n_items_pad, k), lambda t, ro, ibs, bo, lr:
                         (0, 0)),
        ],
    )
    lr_arr = jnp.asarray(lr, jnp.float32).reshape(1)
    s3 = (NU, 1, row_len)
    u_out, i_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(u_tab.shape, u_tab.dtype),
                   jax.ShapeDtypeStruct(i_tab.shape, i_tab.dtype)],
        interpret=interpret,
    )(row_of, ib_seq, boff, lr_arr,
      u_loc.reshape(s3), i_loc.reshape(s3), vals.reshape(s3),
      wts.reshape(s3), cnu.reshape(s3), cni.reshape(s3),
      lam.reshape(s3), u_tab, i_tab)
    return u_out, i_out


def block_sweep_diag(u_tab3: jax.Array, i_tab3: jax.Array,
                     ub_idx: jax.Array, ib_idx: jax.Array,
                     boff: jax.Array, lr,
                     u_loc: jax.Array, i_loc: jax.Array,
                     vals: jax.Array, wts: jax.Array,
                     cnu: jax.Array, cni: jax.Array,
                     lam: jax.Array,
                     bs: int, bu: int, bi: int, NI: int,
                     u_reg: float, i_reg: float,
                     collision_norm: bool, use_mask: bool,
                     mm_bf16: bool = True,
                     ib_identity: bool = False
                     ) -> Tuple[jax.Array, jax.Array]:
    """Diagonal-batched one-hot MXU SGD epoch (Gemulla DSGD schedule on
    one chip — the single-chip analog of parallel/dsgd.py, cf.
    modelMF.cpp:154-350 / util.cpp:1077-1107).

    Each of the R rounds processes G = NI cells that are disjoint in
    BOTH axes (user block j paired with item block (j+d) % NI), so the
    G cell updates are exactly independent and run as ONE batched
    one-hot matmul group [G, bs, b*] @ [G, b*, k]. Versus the
    row-sequential engine this shortens the sequential chain by G× and
    keeps the MXU efficient at small block sizes, where per-rating FLOP
    (∝ 4k(bu+bi)) is proportionally lower — measured fastest around
    bu=bi=256 (PERF.md).

    u_tab3 [NU+1, bu, k] / i_tab3 [NI, bi, k]: factor blocks; row NU of
    u_tab3 is a dummy block addressed by padding lanes (their stream
    row is all-invalid so the write-back is a no-op value).
    ub_idx/ib_idx/boff [R, G]: per-round user-block / item-block /
    batch-offset per lane. Streams [n_cells+1, S]; the last row is the
    all-invalid dummy cell.
    """
    R, G = ub_idx.shape
    n_cells_pad, S = u_loc.shape
    n_steps = S // bs
    k = u_tab3.shape[2]
    NU = u_tab3.shape[0] - 1
    mm_dtype = jnp.bfloat16 if mm_bf16 else jnp.float32
    lr_f = jnp.asarray(lr, jnp.float32)

    def one(U, I, su, si, sv, sw, scu, sci, slm):
        return _batch_update(
            U, I, su, si, sv, sw,
            scu if collision_norm else None,
            sci if collision_norm else None,
            slm if use_mask else None,
            lr_f, k, bu, bi, u_reg, i_reg, collision_norm, use_mask,
            mm_dtype)

    vstep = jax.vmap(one)

    def slice_one(row, start):
        return jax.lax.dynamic_slice(row, (start,), (bs,))

    vslice = jax.vmap(slice_one)

    lanes_c = jnp.arange(G, dtype=jnp.int32)

    def round_body(t, tabs):
        u3, i3 = tabs
        ub = ub_idx[t]
        bo = boff[t]
        U = u3[ub]
        if ib_identity:
            # item lane l owns item block l for the whole epoch (the
            # diagonal rotation is carried by the ROTATED ub_idx — a
            # pure lane relabeling, device_diag_schedule): the i-table
            # never moves through gather/scatter, halving the
            # per-round table traffic
            ib = lanes_c
            I = i3
        else:
            ib = ib_idx[t]
            I = i3[ib]
        # dummy lanes (ub == NU) address the all-invalid dummy cell
        cell = jnp.minimum(ub * NI + ib, n_cells_pad - 1)
        rows = [x[cell] for x in (u_loc, i_loc, vals, wts, cnu, cni,
                                  lam)]

        def step(s, UI):
            U, I = UI
            starts = ((s + bo) % n_steps) * bs
            sliced = [vslice(x, starts) for x in rows]
            return vstep(U, I, *sliced)

        U, I = jax.lax.fori_loop(0, n_steps, step, (U, I))
        u3 = u3.at[ub].set(U)
        i3 = I if ib_identity else i3.at[ib].set(I)
        return (u3, i3)

    return jax.lax.fori_loop(0, R, round_body, (u_tab3, i_tab3))


def device_diag_schedule(key: jax.Array, NU: int, G: int, n_steps: int
                         ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """On-device diag schedule (DSGD rounds, util.cpp:1077-1107
    semantics with rotation instead of a random Latin square — README
    deviation #3): random groups of G user blocks (pad lanes -> dummy NU),
    randomly-ordered rotated diagonals per group, random batch
    offsets. Generating this on the device saves three per-epoch
    host->device transfers — measured ~10 ms/epoch over the tunnel
    (block-DSGD N=1 vs single-chip blocksgd, PERF.md)."""
    k1, k2, k3 = jax.random.split(key, 3)
    n_groups = -(-NU // G)
    total = n_groups * G
    ub_all = jnp.concatenate(
        [jnp.arange(NU, dtype=jnp.int32),
         jnp.full((total - NU,), NU, jnp.int32)])
    ub_all = jax.random.permutation(k1, ub_all).reshape(n_groups, G)
    dperm = jax.vmap(lambda kk: jax.random.permutation(kk, G))(
        jax.random.split(k2, n_groups)).astype(jnp.int32)
    lanes = jnp.arange(G, dtype=jnp.int32)
    # The rotation is applied to the USER side: lane l keeps item
    # block l for the whole epoch and round d pairs it with user block
    # ub_all[g, (l - d) % G] — a pure lane relabeling of the classic
    # (u_l, i_(l+d)%G) diagonal (same cell set per round; lanes are
    # independent), which lets block_sweep_diag(ib_identity=True) skip
    # the per-round i-table gather/scatter entirely.
    ub_rep = jnp.repeat(ub_all, G, axis=0)              # [R, G]
    src = (lanes[None, :] - dperm.reshape(-1, 1)) % G   # [R, G]
    ub_idx = jnp.take_along_axis(ub_rep, src, axis=1)
    ib_idx = jnp.broadcast_to(lanes, ub_idx.shape)      # identity lanes
    boff = jax.random.randint(k3, (n_groups * G, G), 0,
                              max(n_steps, 1)).astype(jnp.int32)
    return ub_idx, ib_idx, boff


@functools.partial(
    jax.jit, donate_argnums=(0, 1),
    static_argnames=("bs", "bu", "bi", "NI", "u_reg", "i_reg",
                     "collision_norm", "use_mask", "mm_bf16"))
def block_sgd_epoch_diag_keyed(u_tab3: jax.Array, i_tab3: jax.Array,
                               key: jax.Array, lr,
                               u_loc: jax.Array, i_loc: jax.Array,
                               vals: jax.Array, wts: jax.Array,
                               cnu: jax.Array, cni: jax.Array,
                               lam: jax.Array,
                               bs: int, bu: int, bi: int, NI: int,
                               u_reg: float, i_reg: float,
                               collision_norm: bool, use_mask: bool,
                               mm_bf16: bool = True
                               ) -> Tuple[jax.Array, jax.Array]:
    """block_sgd_epoch_diag with the schedule generated ON-DEVICE from
    a PRNG key (no per-epoch schedule h2d transfers)."""
    NU = u_tab3.shape[0] - 1
    S = u_loc.shape[1]
    ub_idx, ib_idx, boff = device_diag_schedule(key, NU, NI, S // bs)
    return block_sweep_diag(
        u_tab3, i_tab3, ub_idx, ib_idx, boff, lr, u_loc, i_loc, vals,
        wts, cnu, cni, lam, bs, bu, bi, NI, u_reg, i_reg,
        collision_norm, use_mask, mm_bf16, ib_identity=True)


def block_sweep_rows(u_tab: jax.Array, i_tab: jax.Array,
                     row_of: jax.Array, ib_seq: jax.Array,
                     boff: jax.Array, lr,
                     u_loc: jax.Array, i_loc: jax.Array,
                     vals: jax.Array, wts: jax.Array,
                     cnu: jax.Array, cni: jax.Array, lam: jax.Array,
                     bs: int, bu: int, bi: int, NI: int,
                     u_reg: float, i_reg: float,
                     collision_norm: bool, use_mask: bool,
                     mm_bf16: bool = True
                     ) -> Tuple[jax.Array, jax.Array]:
    """Row-schedule one-hot sweep over u_tab [NU*bu, k] /
    i_tab [NI*bi, k] with streams [NU, NI*S] — the traceable core
    shared by the jitted single-chip epoch (block_sgd_epoch_xla) and
    the per-shard-round sweep of parallel/block_dsgd.py."""
    NU, row_len = u_loc.shape
    S = row_len // NI
    n_steps = S // bs
    k = u_tab.shape[1]
    mm_dtype = jnp.bfloat16 if mm_bf16 else jnp.float32
    lr_f = jnp.asarray(lr, jnp.float32)

    def row_body(t, tabs):
        u_tab, i_tab = tabs
        ro = row_of[t]
        U = jax.lax.dynamic_slice(u_tab, (ro * bu, 0), (bu, k))
        row = [jax.lax.dynamic_slice(x, (ro, 0), (1, row_len))[0]
               for x in (u_loc, i_loc, vals, wts, cnu, cni, lam)]
        su_, si_, sv_, sw_, scu_, sci_, sl_ = row

        def cell_body(j, carry):
            U, i_tab = carry
            ib = ib_seq[t, j]
            bo = boff[t, j]
            I = jax.lax.dynamic_slice(i_tab, (ib * bi, 0), (bi, k))
            base = ib * S

            def step(s, UI):
                U, I = UI
                start = base + ((s + bo) % n_steps) * bs

                def sl(x):
                    return jax.lax.dynamic_slice(x, (start,), (bs,))

                lam_b = sl(sl_) if use_mask else None
                cnu_b = sl(scu_) if collision_norm else None
                cni_b = sl(sci_) if collision_norm else None
                return _batch_update(
                    U, I, sl(su_), sl(si_), sl(sv_), sl(sw_), cnu_b,
                    cni_b, lam_b, lr_f, k, bu, bi, u_reg, i_reg,
                    collision_norm, use_mask, mm_dtype)

            U, I = jax.lax.fori_loop(0, n_steps, step, (U, I))
            i_tab = jax.lax.dynamic_update_slice(i_tab, I, (ib * bi, 0))
            return (U, i_tab)

        U, i_tab = jax.lax.fori_loop(0, NI, cell_body, (U, i_tab))
        u_tab = jax.lax.dynamic_update_slice(u_tab, U, (ro * bu, 0))
        return (u_tab, i_tab)

    return jax.lax.fori_loop(0, NU, row_body, (u_tab, i_tab))


@functools.partial(
    jax.jit, donate_argnums=(0, 1),
    static_argnames=("bs", "bu", "bi", "NI", "u_reg", "i_reg",
                     "collision_norm", "use_mask", "mm_bf16"))
def block_sgd_epoch_xla(u_tab: jax.Array, i_tab: jax.Array,
                        row_of: jax.Array, ib_seq: jax.Array,
                        boff: jax.Array, lr,
                        u_loc: jax.Array, i_loc: jax.Array,
                        vals: jax.Array, wts: jax.Array,
                        cnu: jax.Array, cni: jax.Array, lam: jax.Array,
                        bs: int, bu: int, bi: int, NI: int,
                        u_reg: float, i_reg: float,
                        collision_norm: bool, use_mask: bool,
                        mm_bf16: bool = True
                        ) -> Tuple[jax.Array, jax.Array]:
    """Pure-XLA twin of block_sgd_epoch: same schedule, same
    _batch_update math (bitwise-equal at f32), factor blocks moved by
    dynamic_slice/update instead of Pallas VMEM residency (the Pallas
    kernel's compile envelope caps it below this engine — PERF.md);
    pays only HBM block round-trips per cell (~bi*k*8B — negligible
    vs the matmul work)."""
    return block_sweep_rows(
        u_tab, i_tab, row_of, ib_seq, boff, lr, u_loc, i_loc, vals,
        wts, cnu, cni, lam, bs, bu, bi, NI, u_reg, i_reg,
        collision_norm, use_mask, mm_bf16)
