"""Bisect WHICH Pallas construct crashes the axon remote Mosaic
compile helper (HTTP 500, subprocess exit 1 — seen for the block-SGD
kernel and the interpret-validated fused kernels).

Stages add one construct at a time:
  1 add-one elementwise, no grid
  2 grid + BlockSpec tiling (matmul)
  3 one-hot matmul batch update (the _batch_update math), single call
  4 + PrefetchScalarGridSpec scalar-prefetch indexing
  5 + fori_loop over cells with pl.ds dynamic VMEM output slicing
  6 the real ops.block_sgd_kernel.block_sgd_epoch at a tiny shape

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_pallas_bisect.py > /tmp/tpu_pallas.log 2>&1 &
"""

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("devices:", jax.devices(), flush=True)

    def stage(name, fn):
        t0 = time.time()
        try:
            out = fn()
            out = jax.tree_util.tree_leaves(out)[0]
            _ = float(jnp.sum(out[..., :1]))
            print(f"{name}: OK ({time.time()-t0:.1f}s)", flush=True)
            return True
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:200]
            print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
            return False

    # ---- 1: elementwise, no grid ----
    def k1(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] + 1.0

    x = jnp.ones((128, 128), jnp.float32)
    stage("1 elementwise", lambda: pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32))(x))

    # ---- 2: grid + BlockSpec matmul ----
    def k2(a_ref, b_ref, o_ref):
        o_ref[:, :] = jnp.dot(a_ref[:, :], b_ref[:, :],
                              preferred_element_type=jnp.float32)

    a = jnp.ones((256, 256), jnp.float32)
    b = jnp.ones((256, 256), jnp.float32)
    stage("2 grid matmul", lambda: pl.pallas_call(
        k2,
        grid=(2,),
        in_specs=[pl.BlockSpec((128, 256), lambda i: (i, 0)),
                  pl.BlockSpec((256, 256), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((128, 256), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32))(a, b))

    # ---- 3: one-hot batch update, single call ----
    bs, bu, k = 256, 256, 64

    def k3(u_ref, g_ref, tab_ref, o_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (bs, bu), 1)
        oh = (u_ref[0, :][:, None] == iota).astype(jnp.bfloat16)
        upd = jnp.dot(oh.T, g_ref[:, :].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        o_ref[:, :] = tab_ref[:, :] + upd

    u = jnp.zeros((1, bs), jnp.int32)
    g = jnp.ones((bs, k), jnp.float32)
    tab = jnp.zeros((bu, k), jnp.float32)
    stage("3 one-hot update", lambda: pl.pallas_call(
        k3, out_shape=jax.ShapeDtypeStruct((bu, k), jnp.float32))(
        u, g, tab))

    # ---- 4: scalar prefetch ----
    def k4(sel_ref, x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] * 2.0

    xb = jnp.ones((4, 128, 128), jnp.float32)
    sel = jnp.asarray([2, 0, 3, 1], jnp.int32)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(4,),
        in_specs=[pl.BlockSpec((1, 128, 128), lambda t, s: (s[t], 0, 0))],
        out_specs=pl.BlockSpec((1, 128, 128), lambda t, s: (s[t], 0, 0)),
    )
    stage("4 scalar prefetch", lambda: pl.pallas_call(
        k4, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((4, 128, 128), jnp.float32))(
        sel, xb))

    # ---- 5: fori_loop + dynamic VMEM output slicing ----
    NI, bi = 4, 128

    def k5(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :]

        def body(j, carry):
            blk = o_ref[pl.ds(j * bi, bi), :]
            o_ref[pl.ds(j * bi, bi), :] = blk + 1.0
            return carry

        jax.lax.fori_loop(0, NI, body, 0)

    x5 = jnp.zeros((NI * bi, 128), jnp.float32)
    stage("5 fori + pl.ds VMEM", lambda: pl.pallas_call(
        k5, out_shape=jax.ShapeDtypeStruct((NI * bi, 128),
                                           jnp.float32))(x5))

    # ---- 6: the real block kernel, tiny shape ----
    def run_real():
        from matfac_tpu.config import Params
        from matfac_tpu.data.synthetic import low_rank_ratings
        from matfac_tpu.models.base import ModelMF, init_state
        from matfac_tpu.solvers.block_sgd import BlockSGDSolver
        from matfac_tpu.utils import freq

        n_users, n_items = 2048, 1024
        mat, _, _ = low_rank_ratings(n_users, n_items, k=4,
                                     density=0.02, seed=0, noise=0.1,
                                     nonneg=True)
        iu, ii = freq.invalid_users_items(mat, n_users, n_items)
        params = Params(fac_dim=32, u_reg=0.01, i_reg=0.01,
                        learn_rate=0.01, seed=0)
        model = ModelMF(params, n_users, n_items)
        s = BlockSGDSolver(model, params, mat, iu, ii, batch_size=256,
                           bu=512, bi=512, collision_norm=True,
                           engine="pallas")
        st = init_state(params, n_users, n_items)
        return s.epoch(st, 0.01, jax.random.PRNGKey(0)).u_fac

    stage("6 real block kernel (tiny)", run_real)


if __name__ == "__main__":
    main()
