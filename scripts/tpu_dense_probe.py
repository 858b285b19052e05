"""Decompose the dense-cell epoch cost at the full bench shape.

The diag-dense engine measured 842 ms at full (2.1G dense slots,
~0.4 ns/slot) — 8x the traffic model. Suspects, probed separately on
resident device data shaped like the real staging
(R [1601, 2560, 512] bf16, W int8):

  gather    per round: R_cells[cell] advanced-indexing gather of G=40
            scattered cells + reduce (the engine's access pattern)
  dslice    per round: the same 40 cells moved by lax.dynamic_slice
            with a traced start (block-DMA path) + reduce
  ew        per round: elementwise W.astype*(R.astype-P0) over a
            resident slab (cast/multiply cost)
  mm        per round: the 3 dense matmuls on a resident slab
  rowmm     per user-block row: the 3 matmuls at [bu, k] @ [k, NI*bi]
            full-row width (the row-dense engine's shape)

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_dense_probe.py > /tmp/tpu_dense_probe.log 2>&1 &
"""

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    NU, NI, bu, bi, k = 40, 40, 2560, 512, 64
    n_cells = NU * NI + 1
    rng = np.random.default_rng(0)

    # generate the big tensors ON DEVICE (host staging of 2.1G slots
    # took ~10 min over the tunnel and 17 GB of host RAM; values do
    # not matter for a perf probe of dense ops). HBM budget note
    # (v5e = 16 GB): R bf16 4.2 GB + W int8 2.1 GB resident; each
    # case below materializes at most one extra 4.2 GB reshape and
    # deletes it before the next (first run OOMed with all three
    # precomputed).
    kk = jax.random.split(jax.random.PRNGKey(0), 3)
    R = jax.jit(lambda key: jax.random.normal(
        key, (n_cells, bu, bi), jnp.bfloat16))(kk[0])
    W = jax.jit(lambda key: (jax.random.uniform(
        key, (n_cells, bu, bi), jnp.float32) < 0.005
    ).astype(jnp.int8))(kk[1])
    U3 = jax.jit(lambda key: 0.1 * jax.random.normal(
        key, (NU + 1, bu, k), jnp.float32))(kk[2])
    I3 = jax.jit(lambda key: 0.1 * jax.random.normal(
        key, (NI, bi, k), jnp.float32))(kk[2])
    cell_idx = jnp.asarray(
        rng.permutation(NU * NI).reshape(NU, NI).astype(np.int32))

    @jax.jit
    def gather(R, cell_idx):
        def body(t, acc):
            g = R[cell_idx[t]]
            return acc + jnp.sum(g.astype(jnp.float32))
        return jax.lax.fori_loop(0, NU, body, jnp.float32(0))

    @jax.jit
    def dslice(Rflat, cell_idx):
        def body(t, acc):
            def lane(l, a):
                c = cell_idx[t, l]
                g = jax.lax.dynamic_slice(Rflat, (c * bu, 0), (bu, bi))
                return a + jnp.sum(g.astype(jnp.float32))
            return jax.lax.fori_loop(0, NI, lane, acc)
        return jax.lax.fori_loop(0, NU, body, jnp.float32(0))

    @jax.jit
    def dslice_round(R, cell_idx):
        # one traced-start slice of G CONTIGUOUS cells per round
        def body(t, acc):
            g = jax.lax.dynamic_slice(
                R, (t * NI, 0, 0), (NI, bu, bi))
            return acc + jnp.sum(g.astype(jnp.float32))
        return jax.lax.fori_loop(0, NU, body, jnp.float32(0))

    @jax.jit
    def ew(R, W, U3):
        slab_r = jax.lax.dynamic_slice(R, (0, 0, 0), (NI, bu, bi))
        slab_w = jax.lax.dynamic_slice(W, (0, 0, 0), (NI, bu, bi))

        def body(t, acc):
            E = (slab_w.astype(jnp.float32)
                 * (slab_r.astype(jnp.float32) - acc))
            return jnp.sum(E, axis=(0, 1), keepdims=True) * 1e-30 + acc
        return jax.lax.fori_loop(
            0, NU, body, jnp.zeros((1, 1, bi), jnp.float32))

    @jax.jit
    def mm(R, W, U3, I3, cell_idx):
        slab_r = jax.lax.dynamic_slice(R, (0, 0, 0), (NI, bu, bi))
        slab_w = jax.lax.dynamic_slice(W, (0, 0, 0), (NI, bu, bi))

        def cellup(U, I, Rc, Wc):
            P = jnp.dot(U.astype(jnp.bfloat16),
                        I.astype(jnp.bfloat16).T,
                        preferred_element_type=jnp.float32)
            E = Wc.astype(jnp.float32) * (Rc.astype(jnp.float32) - P)
            Em = E.astype(jnp.bfloat16)
            gu = jnp.dot(Em, I.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
            gi = jnp.dot(Em.T, U.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
            return U - 0.001 * gu, I - 0.001 * gi

        vstep = jax.vmap(cellup)

        def body(t, tabs):
            u3, i3 = tabs
            ub = cell_idx[t] % NU
            U, I = vstep(u3[ub], i3, slab_r, slab_w)
            return (u3.at[ub].set(U), I)
        return jax.lax.fori_loop(0, NU, body, (U3, I3))

    @jax.jit
    def rowmm(Rrow, Wrow, U3, Iflat, row_of):
        def body(t, tabs):
            u3, If = tabs
            ub = row_of[t]
            U = u3[ub]
            Rc = jax.lax.dynamic_slice(
                Rrow, (ub, 0, 0), (1, bu, NI * bi))[0]
            Wc = jax.lax.dynamic_slice(
                Wrow, (ub, 0, 0), (1, bu, NI * bi))[0]
            P = jnp.dot(U.astype(jnp.bfloat16),
                        If.astype(jnp.bfloat16).T,
                        preferred_element_type=jnp.float32)
            E = Wc.astype(jnp.float32) * (Rc.astype(jnp.float32) - P)
            Em = E.astype(jnp.bfloat16)
            gu = jnp.dot(Em, If.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
            gi = jnp.dot(Em.T, U.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
            return (u3.at[ub].set(U - 0.001 * gu), If - 0.001 * gi)
        return jax.lax.fori_loop(0, NU, body, (U3, Iflat))

    row_of = jnp.asarray(rng.permutation(NU).astype(np.int32))

    def timeit(label, fn, *args):
        try:
            t0 = time.time()
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf) if leaf.ndim else leaf)
            comp = time.time() - t0
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                out = fn(*args)
                leaf = jax.tree_util.tree_leaves(out)[0]
                float(jnp.sum(leaf) if leaf.ndim else leaf)
                best = min(best, time.time() - t0)
            print(f"{label}: compile={comp:.1f}s best={best*1000:.1f}ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAIL: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)

    timeit("gather (40 rounds x 40-cell gather+reduce)", gather, R,
           cell_idx)
    # one 4.2 GB reshape at a time (HBM budget — see staging note)
    Rflat = jax.jit(lambda r: r.reshape(n_cells * bu, bi))(R)
    timeit("dslice (40x40 per-cell dynamic_slice+reduce)", dslice,
           Rflat, cell_idx)
    del Rflat
    timeit("dslice_round (40 contiguous-slab slices)", dslice_round,
           R, cell_idx)
    timeit("ew (40 rounds elementwise on resident slab)", ew, R, W, U3)
    timeit("mm (40 rounds 3-matmul cellup on resident slab)", mm, R, W,
           U3, I3, cell_idx)
    Rrow = jax.jit(
        lambda r: r[:NU * NI].reshape(NU, bu, NI * bi))(R)
    del R
    Wrow = jax.jit(
        lambda w: w[:NU * NI].reshape(NU, bu, NI * bi))(W)
    del W
    Iflat = I3.reshape(NI * bi, k)
    timeit("rowmm (40 user rows, full-row-width matmuls)", rowmm, Rrow,
           Wrow, U3, Iflat, row_of)


if __name__ == "__main__":
    main()
