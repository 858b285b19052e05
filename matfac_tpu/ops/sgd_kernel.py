"""Pallas TPU kernel: fused DSGD cell update (EXPERIMENTAL).

The SGD hot loop's HBM traffic problem (PERF.md): the XLA path re-reads
and re-writes factor rows from HBM every minibatch. In the DSGD layout
(parallel/dsgd.py) each round touches one (user-block x item-block)
cell whose two factor blocks fit in VMEM (e.g. 1024x64 + 4096x64 f32 =
1.3 MB), so a kernel can keep BOTH blocks resident for the cell's
ENTIRE stream and touch HBM only for the rating stream itself:

    traffic/rating:  XLA ≈ 16k bytes   fused ≈ 16 bytes (stream only)

The kernel carries the factor blocks as loop values and uses value-level
gather (`jnp.take`) / scatter (`.at[].add`) per minibatch — supported in
interpret mode everywhere. VALIDATED ON HARDWARE (late round 2, after
the Mosaic toolchain recovered): Mosaic REJECTS this gather form at
trace time ("Shape mismatch in input, indices and output" from its
gather lowering rules) — row-gathers by dynamic index vectors do not
lower to TPU inside kernels. That confirms the one-hot matmul
reformulation (ops/block_sgd_kernel.py) as the TPU-native path rather
than a workaround; this kernel stays interpret-only for parity tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(bs: int, n_steps: int, k: int, u_reg: float,
                 i_reg: float):
    def kernel(lr_ref, u_loc_ref, i_loc_ref, vals_ref, wts_ref,
               u_in_ref, i_in_ref, u_out_ref, i_out_ref):
        lr = lr_ref[0, 0]
        U0 = u_in_ref[:, :]
        I0 = i_in_ref[:, :]

        def step(s, carry):
            U, I = carry
            sl = pl.ds(s * bs, bs)
            u = u_loc_ref[sl]
            i = i_loc_ref[sl]
            r = vals_ref[sl]
            w = wts_ref[sl]
            pu = jnp.take(U, u, axis=0)
            qi = jnp.take(I, i, axis=0)
            pred = jnp.sum(pu * qi, axis=1)
            coeff = w * (r - pred)
            vmask = (w > 0).astype(U.dtype)
            gu = -2.0 * coeff[:, None] * qi \
                + 2.0 * u_reg * vmask[:, None] * pu
            gi = -2.0 * coeff[:, None] * pu \
                + 2.0 * i_reg * vmask[:, None] * qi
            U = U.at[u].add(-lr * gu)
            I = I.at[i].add(-lr * gi)
            return (U, I)

        U, I = jax.lax.fori_loop(0, n_steps, step, (U0, I0))
        u_out_ref[:, :] = U
        i_out_ref[:, :] = I

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("bs", "u_reg", "i_reg", "interpret"))
def fused_cell_update(u_blk: jax.Array, i_blk: jax.Array,
                      u_loc: jax.Array, i_loc: jax.Array,
                      vals: jax.Array, wts: jax.Array, lr,
                      bs: int, u_reg: float, i_reg: float,
                      interpret: bool = False
                      ) -> Tuple[jax.Array, jax.Array]:
    """Apply one DSGD cell's whole stream to its two factor blocks.

    u_blk [BU, k], i_blk [BI, k]; stream arrays [S] with S % bs == 0;
    padding entries carry wts == 0.
    """
    S = u_loc.shape[0]
    assert S % bs == 0
    k = u_blk.shape[1]
    kernel = _make_kernel(bs, S // bs, k, u_reg, i_reg)
    lr_arr = jnp.asarray(lr, jnp.float32).reshape(1, 1)
    u_out, i_out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(u_blk.shape, u_blk.dtype),
            jax.ShapeDtypeStruct(i_blk.shape, i_blk.dtype),
        ],
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(lr_arr, u_loc, i_loc, vals, wts, u_blk, i_blk)
    return u_out, i_out
