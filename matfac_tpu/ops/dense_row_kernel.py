"""Pallas TPU kernel: row-stripe dense SGD with panel-resident residuals.

The XLA row-stripe engine (ops/dense_block_kernel.dense_sweep_rows,
242M ratings/s at the full bench shape) is HBM-traffic-bound: per
stripe it materializes the [bu, ni_pad] f32 prediction P and the
residual E in HBM (~16 GB/epoch of intermediates at the full shape —
~2.5x the irreducible R+W read). This kernel tiles each stripe into
item PANELS and keeps P/E alive only inside VMEM:

  grid = (NU rounds, NP panels); per (t, j):
      U   = u stripe ro[t]              (VMEM block, [bu, k])
      I_j = i_tab[j*p : (j+1)*p]        (VMEM-resident whole table)
      R_j / W_j                         (pipelined HBM->VMEM panels)
      P = U @ I_j^T; E = W*(R-P)        (MXU + VPU, dies in VMEM)
      item update: I_j -= lr * norm(-2 E^T U + 2 i_reg cnt_i I_j)
      user accumulation: acc += E @ I_j (old I_j); cnt_u += rowsum(W)
      at j = NP-1: U' = U - lr * norm(-2 acc + 2 u_reg cnt_u U)

Update math == dense_block_kernel.cell_dense_update on the full stripe
(modelMF.cpp:83-105 per-occurrence reg, collision normalization =
within-batch same-entity mean): the item update uses the OLD U, the
user update the OLD I (acc accumulates E @ I_j before I_j is written),
exactly like the one-shot formulation. Parity is pinned in
tests/test_pallas_dense_rows.py (interpret mode).

Traffic/epoch = R + W once (~6.3 GB at full) + i-table writes; the
expected wall is max(that, the 3 matmuls' MXU time). VMEM budget at
bu=2560, panel=128, k=64: i-table 5.2 MB + P 1.3 + panels ~2 + stripes
~2 ≈ 11 MB — inside the envelope the round-2 bisect mapped (the Mosaic
AOT helper dies, not errors, above ~12-13 MB; ops/block_sgd_kernel.py
docstring). The solver gates on the i-table fit and falls back to the
XLA row engine.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(NP: int, panel: int, bu: int, k: int, u_reg: float,
                 i_reg: float, collision_norm: bool, mm_dtype):
    def kernel(row_of_ref, lr_ref, u_in, r_in, w_in, i_in,
               u_out, i_out, acc_ref, cnt_ref):
        t = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((t == 0) & (j == 0))
        def _():
            # the item table lives in the output buffer for the whole
            # epoch (constant index map — no cross-step aliasing)
            i_out[:, :] = i_in[:, :]

        @pl.when(j == 0)
        def _():
            acc_ref[:, :] = jnp.zeros_like(acc_ref)
            cnt_ref[:, :] = jnp.zeros_like(cnt_ref)

        lr = lr_ref[0]
        U = u_in[0]                                   # [bu, k] (old)
        I = i_out[pl.ds(j * panel, panel), :]         # [panel, k] (old)
        Wf = w_in[0].astype(jnp.float32)              # [bu, panel]
        P = jnp.dot(U.astype(mm_dtype), I.astype(mm_dtype).T,
                    preferred_element_type=jnp.float32)
        E = Wf * (r_in[0].astype(jnp.float32) - P)
        Em = E.astype(mm_dtype)

        # counts use the VALIDITY mask, not the weights (IFWMF weights
        # scale only the data term; reg + collision divisors count
        # occurrences — cell_dense_update's vm = W > 0)
        vm = (Wf > 0).astype(jnp.float32)

        # item update (old U)
        cnt_i = jnp.sum(vm, axis=0, keepdims=True).T  # [panel, 1]
        gi = (-2.0 * jnp.dot(Em.T, U.astype(mm_dtype),
                             preferred_element_type=jnp.float32)
              + (2.0 * i_reg) * cnt_i * I)
        if collision_norm:
            gi = gi / jnp.maximum(cnt_i, 1.0)
        i_out[pl.ds(j * panel, panel), :] = I - lr * gi

        # user-side accumulation (old I — read above before the write)
        acc_ref[:, :] += jnp.dot(Em, I.astype(mm_dtype),
                                 preferred_element_type=jnp.float32)
        cnt_ref[:, :] += jnp.sum(vm, axis=1, keepdims=True)

        @pl.when(j == NP - 1)
        def _():
            cnt_u = cnt_ref[:, :]
            gu = (-2.0 * acc_ref[:, :] + (2.0 * u_reg) * cnt_u * U)
            if collision_norm:
                gu = gu / jnp.maximum(cnt_u, 1.0)
            u_out[0] = U - lr * gu

    return kernel


@functools.partial(
    jax.jit, donate_argnums=(0, 1),
    static_argnames=("panel", "u_reg", "i_reg", "collision_norm",
                     "mm_bf16", "interpret"))
def dense_rows_epoch_pallas(u_tab3: jax.Array, i_tab: jax.Array,
                            row_of: jax.Array, lr,
                            R_rows: jax.Array, W_rows: jax.Array,
                            panel: int, u_reg: float, i_reg: float,
                            collision_norm: bool, mm_bf16: bool = True,
                            interpret: bool = False
                            ) -> Tuple[jax.Array, jax.Array]:
    """One row-stripe dense epoch with VMEM-panel residuals.

    u_tab3 [NU, bu, k] f32 (no dummy row — the kernel grid visits every
    stripe exactly once), i_tab [ni_pad, k] f32, R_rows/W_rows
    [>=NU, bu, ni_pad] (extra dummy rows are simply never addressed),
    row_of [NU] a permutation of range(NU).
    """
    NU, bu, k = u_tab3.shape
    ni_pad = i_tab.shape[0]
    assert ni_pad % panel == 0
    NP = ni_pad // panel
    mm_dtype = jnp.bfloat16 if mm_bf16 else jnp.float32
    kernel = _make_kernel(NP, panel, bu, k, u_reg, i_reg,
                          collision_norm, mm_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # row_of, lr
        grid=(NU, NP),
        in_specs=[
            pl.BlockSpec((1, bu, k), lambda t, j, ro, lr: (ro[t], 0, 0)),
            pl.BlockSpec((1, bu, panel),
                         lambda t, j, ro, lr: (ro[t], 0, j)),
            pl.BlockSpec((1, bu, panel),
                         lambda t, j, ro, lr: (ro[t], 0, j)),
            pl.BlockSpec((ni_pad, k), lambda t, j, ro, lr: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bu, k), lambda t, j, ro, lr: (ro[t], 0, 0)),
            pl.BlockSpec((ni_pad, k), lambda t, j, ro, lr: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bu, k), jnp.float32),    # user grad accumulator
            pltpu.VMEM((bu, 1), jnp.float32),    # user valid counts
        ],
    )
    lr_arr = jnp.asarray(lr, jnp.float32).reshape(1)
    u_out, i_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(u_tab3.shape, u_tab3.dtype),
                   jax.ShapeDtypeStruct(i_tab.shape, i_tab.dtype)],
        interpret=interpret,
    )(row_of, lr_arr, u_tab3, R_rows, W_rows, i_tab)
    return u_out, i_out


# ----------------------------------------------------------------------
# Round 5: bf16-resident i-table + int8 rating-code panels
# ----------------------------------------------------------------------

def _make_codes_kernel(NP: int, panel: int, bu: int, k: int,
                       r_scale: float, u_reg: float, i_reg: float,
                       collision_norm: bool):
    def kernel(row_of_ref, lr_ref, u_in, r_in, i_in,
               u_out, i_out, acc_ref, cnt_ref):
        t = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((t == 0) & (j == 0))
        def _():
            i_out[:, :] = i_in[:, :]

        @pl.when(j == 0)
        def _():
            acc_ref[:, :] = jnp.zeros_like(acc_ref)
            cnt_ref[:, :] = jnp.zeros_like(cnt_ref)

        lr = lr_ref[0]
        U = u_in[0]                                   # [bu, k] f32
        I = i_out[pl.ds(j * panel, panel), :]         # [panel, k] bf16
        code = r_in[0, 0]                             # [bu, panel] int8
        vm = (code != 0).astype(jnp.float32)
        Rf = code.astype(jnp.float32) * r_scale
        Ub = U.astype(jnp.bfloat16)
        # all contractions via dot_general dimension numbers — an
        # explicit .T materializes a VPU transpose under Mosaic
        # (measured 2x on the panel axis), while the MXU contracts
        # either operand axis natively
        P = jax.lax.dot_general(
            Ub, I, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [bu, panel]
        E = vm * (Rf - P)
        Em = E.astype(jnp.bfloat16)

        # item update (old U); f32 arithmetic, bf16 store
        cnt_i = jnp.sum(vm, axis=0)[:, None]          # [panel, 1]
        If = I.astype(jnp.float32)
        gi = (-2.0 * jax.lax.dot_general(
                  Em, Ub, (((0,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32)  # [panel, k]
              + (2.0 * i_reg) * cnt_i * If)
        if collision_norm:
            gi = gi / jnp.maximum(cnt_i, 1.0)
        i_out[pl.ds(j * panel, panel), :] = (
            If - lr * gi).astype(jnp.bfloat16)

        # user-side accumulation (old I)
        acc_ref[:, :] += jax.lax.dot_general(
            Em, I, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [bu, k]
        cnt_ref[:, :] += jnp.sum(vm, axis=1, keepdims=True)

        @pl.when(j == NP - 1)
        def _():
            cnt_u = cnt_ref[:, :]
            gu = (-2.0 * acc_ref[:, :] + (2.0 * u_reg) * cnt_u * U)
            if collision_norm:
                gu = gu / jnp.maximum(cnt_u, 1.0)
            u_out[0] = U - lr * gu

    return kernel


@functools.partial(
    jax.jit, donate_argnums=(0, 1),
    static_argnames=("panel", "r_scale", "u_reg", "i_reg",
                     "collision_norm", "interpret"))
def dense_rows_codes_pallas(u_tab3: jax.Array, i_tab_bf16: jax.Array,
                            row_of: jax.Array, lr,
                            R_rows: jax.Array, panel: int,
                            r_scale: float, u_reg: float, i_reg: float,
                            collision_norm: bool,
                            interpret: bool = False
                            ) -> Tuple[jax.Array, jax.Array]:
    """Row-stripe dense epoch, VMEM-panel residuals, with the item
    table RESIDENT IN bf16 and ratings as int8 CODE panels — the
    round-5 geometry that fits the 16 MB scoped-VMEM envelope where
    the f32+weights variant could not (PERF.md "Row-dense SGD
    engine"): i-table in+out 2 x 2.6 MB (bf16, vs 2 x 5.2 f32), u
    stripes 4 x 0.66, ONE int8 code panel stream 2 x 0.33 (validity
    derives from code != 0 — no W input at all), acc/cnt 0.67.

    Update math = cell_dense_update on the stripe with two documented
    precision deviations: (a) item rows STORE bf16 between updates
    (the arithmetic is f32; each of the NU per-epoch stores rounds to
    8 mantissa bits), and (b) prediction reads the bf16 row directly
    (the XLA engine casts an f32 row to bf16 — same matmul precision,
    different accumulated table state). u rows stay f32 end-to-end.

    u_tab3 [NU, bu, k] f32; i_tab_bf16 [ni_pad, k] bf16;
    R_panels [NU, NP, bu, panel] int8 codes in PANEL-MAJOR layout
    (rating = code * r_scale): slicing panels out of a row-major
    [bu, ni_pad] tile makes every HBM->VMEM panel fetch 2560 strided
    128 B bursts — measured 51 of the 53 ms epoch (~40 GB/s effective,
    5% of HBM). Panel-major blocks are contiguous; the solver
    transposes the staged grid once at init.
    """
    NU, bu, k = u_tab3.shape
    ni_pad = i_tab_bf16.shape[0]
    assert ni_pad % panel == 0
    assert i_tab_bf16.dtype == jnp.bfloat16
    NP = ni_pad // panel
    assert R_rows.shape[:2] == (NU, NP), R_rows.shape
    kernel = _make_codes_kernel(NP, panel, bu, k, float(r_scale),
                                u_reg, i_reg, collision_norm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # row_of, lr
        grid=(NU, NP),
        in_specs=[
            pl.BlockSpec((1, bu, k), lambda t, j, ro, lr: (ro[t], 0, 0)),
            pl.BlockSpec((1, 1, bu, panel),
                         lambda t, j, ro, lr: (ro[t], j, 0, 0)),
            pl.BlockSpec((ni_pad, k), lambda t, j, ro, lr: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bu, k), lambda t, j, ro, lr: (ro[t], 0, 0)),
            pl.BlockSpec((ni_pad, k), lambda t, j, ro, lr: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bu, k), jnp.float32),    # user grad accumulator
            pltpu.VMEM((bu, 1), jnp.float32),    # user valid counts
        ],
    )
    lr_arr = jnp.asarray(lr, jnp.float32).reshape(1)
    u_out, i_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(u_tab3.shape, u_tab3.dtype),
                   jax.ShapeDtypeStruct(i_tab_bf16.shape,
                                        jnp.bfloat16)],
        interpret=interpret,
    )(row_of, lr_arr, u_tab3, R_rows, i_tab_bf16)
    return u_out, i_out


@functools.partial(
    jax.jit, donate_argnums=(0, 1),
    static_argnames=("panel", "r_scale", "u_reg", "i_reg",
                     "collision_norm", "interpret"))
def dense_rows_codes_epoch_keyed(u_tab3: jax.Array,
                                 i_tab_bf16: jax.Array,
                                 key: jax.Array, lr,
                                 R_rows: jax.Array, panel: int,
                                 r_scale: float, u_reg: float,
                                 i_reg: float, collision_norm: bool,
                                 interpret: bool = False
                                 ) -> Tuple[jax.Array, jax.Array]:
    """dense_rows_codes_pallas with the stripe order generated inside
    ONE jitted program (device_diag_schedule(G=1), the same key
    semantics as the XLA rows engine). Folding the schedule + kernel
    into a single dispatch matters on the tunnel device: the eager
    schedule/slice plumbing around the raw pallas_call measured
    20-40 ms of a 19 ms kernel epoch."""
    from matfac_tpu.ops.block_sgd_kernel import device_diag_schedule
    NU = u_tab3.shape[0]
    ub_idx, _, _ = device_diag_schedule(key, NU, 1, 1)
    return dense_rows_codes_pallas(
        u_tab3, i_tab_bf16, ub_idx[:, 0], lr, R_rows, panel=panel,
        r_scale=r_scale, u_reg=u_reg, i_reg=i_reg,
        collision_norm=collision_norm, interpret=interpret)
