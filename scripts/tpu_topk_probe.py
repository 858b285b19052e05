"""Full-catalog top-k scorer decomposition on-chip.

At 100k users x 20k items, k=64 (bench shape) and 4096x8192 (the PERF.md
recorded shape): time the full scorer, then variants isolating the
matmul, the exclusion scatter, and lax.top_k, plus a
jax.lax.approx_max_k drop-in.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_topk_probe.py > /tmp/tpu_topk.log 2>&1 &
"""

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.eval.ranking import CatalogScorer
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)

    for n_users, n_items, density in ((4096, 8192, 0.01),
                                      (100_000, 20_000, 0.005)):
        k = 64
        mat, _, _ = low_rank_ratings(n_users, n_items, k=8,
                                     density=density, seed=0, noise=0.1,
                                     power_law=0.6, nonneg=True)
        iu, ii = freq.invalid_users_items(mat, n_users, n_items)
        params = Params(fac_dim=k, seed=0)
        model = ModelMF(params, n_users, n_items)
        st = init_state(params, n_users, n_items)
        view = model.eval_view(st)
        def t(fn, *a, reps=3):
            out = fn(*a)
            _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][0]))
            ts = []
            for _i in range(reps):
                t0 = time.time()
                out = fn(*a)
                _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][0]))
                ts.append(time.time() - t0)
            return min(ts)

        from matfac_tpu.data.csr import RatingMatrix
        rng2 = np.random.default_rng(1)
        test = RatingMatrix.from_coo(
            np.arange(n_users, dtype=np.int64),
            rng2.integers(0, n_items, n_users),
            np.ones(n_users, np.float32), n_users, n_items)
        for ib_cfg in (8192, 32768):
            sc = CatalogScorer(mat, iu, ii, n_users, n_items,
                               user_block=4096, item_block=ib_cfg)
            print(f"shape {n_users}x{n_items} nnz={mat.nnz} "
                  f"C={sc.rated_cols.shape[1]} ib={sc.item_block} "
                  f"blocks={sc.n_items_pad // sc.item_block}",
                  flush=True)
            dt = t(lambda: sc.topk(view, 10))
            print(f"  full topk(catalog) ib={ib_cfg}: {dt*1000:.0f}ms",
                  flush=True)
            hr = sc.hit_rate(view, test, 10)   # warm (compile+stage)
            ts = []
            for _i in range(3):
                t0 = time.time()
                hr = sc.hit_rate(view, test, 10)
                ts.append(time.time() - t0)
            print(f"  hit_rate(device loo) ib={ib_cfg}: "
                  f"{min(ts)*1000:.0f}ms (hr={hr:.4f})", flush=True)
        sc = CatalogScorer(mat, iu, ii, n_users, n_items,
                           user_block=4096, item_block=8192)

        # variants on one user block
        pv = sc._pad_view(view)
        ids = jnp.arange(min(4096, n_users), dtype=jnp.int32)
        rc = sc.rated_cols[ids]
        rm = sc.rated_mask[ids]
        inval = sc.invalid_items_dev
        ib = sc.item_block
        n_blocks = sc.n_items_pad // ib
        B = ids.shape[0]

        @functools.partial(jax.jit, static_argnames=("mode",))
        def block_variant(u_fac, i_fac, rc, rm, inval, mode: str):
            u = u_fac[ids]
            row_ids = jnp.arange(B, dtype=jnp.int32)[:, None]

            def body(carry, blk):
                best_s, best_i = carry
                s0 = blk * ib
                ifb = jax.lax.dynamic_slice_in_dim(i_fac, s0, ib)
                ivb = jax.lax.dynamic_slice_in_dim(inval, s0, ib)
                scores = jnp.dot(u, ifb.T,
                                 preferred_element_type=jnp.float32)
                scores = jnp.where(ivb[None, :], -3e38, scores)
                if mode in ("full", "noexcl+topk", "approx"):
                    if mode == "full":
                        off = rc - s0
                        in_blk = (off >= 0) & (off < ib) & (rm > 0)
                        off = jnp.where(in_blk, off, 0)
                        scores = scores.at[row_ids, off].min(
                            jnp.where(in_blk, -3e38, 3e38), mode="drop")
                    if mode == "approx":
                        bs2, sel = jax.lax.approx_max_k(
                            scores, 10, recall_target=0.95)
                        new_i = sel + s0
                        cat_s = jnp.concatenate([best_s, bs2], 1)
                        cat_i = jnp.concatenate([best_i, new_i], 1)
                        ns, s2 = jax.lax.top_k(cat_s, 10)
                        return (ns, jnp.take_along_axis(cat_i, s2, 1)), None
                    cat_s = jnp.concatenate([best_s, scores], axis=1)
                    cat_i = jnp.concatenate(
                        [best_i, (s0 + jnp.arange(ib, dtype=jnp.int32)
                                  )[None, :].repeat(B, 0)], axis=1)
                    ns, sel = jax.lax.top_k(cat_s, 10)
                    return (ns, jnp.take_along_axis(cat_i, sel, 1)), None
                if mode == "matmul+max":
                    m = jnp.max(scores, axis=1, keepdims=True)
                    return (jnp.maximum(best_s[:, :1], m).repeat(10, 1),
                            best_i), None
                if mode == "excl+max":
                    off = rc - s0
                    in_blk = (off >= 0) & (off < ib) & (rm > 0)
                    off = jnp.where(in_blk, off, 0)
                    scores = scores.at[row_ids, off].min(
                        jnp.where(in_blk, -3e38, 3e38), mode="drop")
                    m = jnp.max(scores, axis=1, keepdims=True)
                    return (jnp.maximum(best_s[:, :1], m).repeat(10, 1),
                            best_i), None
                raise ValueError(mode)

            init = (jnp.full((B, 10), -3e38),
                    jnp.zeros((B, 10), jnp.int32))
            out, _ = jax.lax.scan(body, init,
                                  jnp.arange(n_blocks, dtype=jnp.int32))
            return out

        for mode in ("full", "noexcl+topk", "matmul+max", "excl+max",
                     "approx"):
            try:
                dt = t(lambda m=mode: block_variant(
                    pv.u_fac, pv.i_fac, rc, rm, inval, mode=m))
                print(f"  1 ublock [{B}] {mode}: {dt*1000:.1f}ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {mode} FAIL: {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
