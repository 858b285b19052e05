"""BPR epoch cost breakdown on-chip (route to the 15M pairs/s target).

Variants at 100k x 20k / 9.9M positives, k=64, bs=65536:
  full2/full1     : stream epoch, n_tries=2 / 1
  nosample        : same update, negatives = deterministic (p+1 mod items)
                    -> isolates the sampler's share
  sampler_only    : sampler scan alone, no factor gathers/updates
  noitemcheck     : tries=2 but without the train_items[j] element gather

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_bpr_probe.py > /tmp/tpu_bpr_probe.log 2>&1 &
"""

import functools
import time

import numpy as np


def timeit(fn, state, *args):
    """Times fn(state, *args); fn returns (state, ...) or a scalar; the
    first positional is threaded (donated) across calls when a new state
    comes back."""
    import jax
    import jax.numpy as jnp

    def force(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(jnp.ravel(leaf)[:1]))

    def thread(out):
        if isinstance(out, tuple) and hasattr(out[0], "u_fac"):
            return out[0]
        return state

    out = fn(state, *args)
    force(out)
    state = thread(out)
    times = []
    for _ in range(3):
        t0 = time.time()
        out = fn(state, *args)
        force(out)
        state = thread(out)
        times.append(time.time() - t0)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import init_state
    from matfac_tpu.models.bpr import ModelMFBPR
    from matfac_tpu.solvers.bpr import BPRSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items, k = 100_000, 20_000, 64
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    print(f"nnz={mat.nnz}", flush=True)
    params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                    learn_rate=0.01, seed=0, batch_size=65_536)
    model = ModelMFBPR(params, n_users, n_items)

    import os
    full_variants = (() if os.environ.get("SKIP_FULL")
                     else (("full2", 2), ("full1", 1)))
    for tag, n_tries in full_variants:
        s = BPRSolver(model, params, mat, iu, ii, n_tries=n_tries)
        st = init_state(params, n_users, n_items)
        key = jax.random.PRNGKey(0)

        def run(st, key, s=s):
            key, ek = jax.random.split(key)
            return s.epoch(st, 0.01, ek)

        t0 = time.time()
        st = run(st, key)
        _ = float(jnp.sum(st.u_fac[0]))
        c = time.time() - t0
        times = []
        for i in range(3):
            key, ek = jax.random.split(jax.random.PRNGKey(i + 1))
            t0 = time.time()
            st = s.epoch(st, 0.01, ek)
            _ = float(jnp.sum(st.u_fac[0]))
            times.append(time.time() - t0)
        dt = min(times)
        print(f"{tag}: compile={c:.1f}s epoch={dt*1000:.0f}ms "
              f"rate={s.n_pos/dt/1e6:.1f}M pairs/s", flush=True)

    # shared staged arrays from a solver instance
    s = BPRSolver(model, params, mat, iu, ii, n_tries=2)
    B = s.batch_size
    n_batches = s.n_batches
    u_reg = i_reg = 0.001

    # ---- nosample: identical update math, negatives deterministic ----
    @functools.partial(jax.jit, donate_argnums=(0,))
    def nosample_epoch(state, pos_u, pos_i, pos_valid, lr, key):
        def step(carry, xs):
            st, loss = carry
            b_idx, k_b = xs
            u = jax.lax.dynamic_slice_in_dim(pos_u, b_idx * B, B)
            p = jax.lax.dynamic_slice_in_dim(pos_i, b_idx * B, B)
            w = jax.lax.dynamic_slice_in_dim(pos_valid, b_idx * B, B)
            neg = (p + 1) % n_items
            pu = st.u_fac[u]
            qp = st.i_fac[p]
            qn = st.i_fac[neg]
            r_uij = jnp.einsum("ek,ek->e", pu, qp - qn,
                               preferred_element_type=jnp.float32)
            loss = loss + jnp.sum(w * jnp.logaddexp(0.0, -r_uij))
            coeff = w * (-1.0 / (1.0 + jnp.exp(r_uij)))
            gu = coeff[:, None] * (qp - qn) + 2 * u_reg * w[:, None] * pu
            gp = coeff[:, None] * pu + 2 * i_reg * w[:, None] * qp
            gn = -coeff[:, None] * pu + 2 * i_reg * w[:, None] * qn
            i_idx = jnp.concatenate([p, neg])
            i_upd = jnp.concatenate([gp, gn])
            st = st._replace(
                u_fac=st.u_fac.at[u].add(-lr * gu),
                i_fac=st.i_fac.at[i_idx].add(-lr * i_upd))
            return (st, loss), None

        k_ord, key = jax.random.split(key)
        border = jax.random.permutation(k_ord, n_batches)
        keys = jax.random.split(key, n_batches)
        (state, loss), _ = jax.lax.scan(
            step, (state, jnp.zeros(())), (border, keys))
        return state, loss

    st = init_state(params, n_users, n_items)
    dt = timeit(nosample_epoch, st, s.pos_u, s.pos_i, s.pos_valid,
                jnp.float32(0.01), jax.random.PRNGKey(0))
    print(f"nosample: epoch={dt*1000:.0f}ms "
          f"rate={s.n_pos/dt/1e6:.1f}M pairs/s", flush=True)

    # ---- sampler_only: the negative-sampling scan alone ----
    @jax.jit
    def sampler_epoch(pos_u, indptr, csr_packed, train_items, key):
        csr = (indptr, csr_packed, train_items)

        def step(acc, xs):
            b_idx, k_b = xs
            u = jax.lax.dynamic_slice_in_dim(pos_u, b_idx * B, B)
            neg, ok = s._sample_negatives(k_b, u, csr)
            return acc + jnp.sum(neg) + jnp.sum(ok), None

        k_ord, key = jax.random.split(key)
        border = jax.random.permutation(k_ord, n_batches)
        keys = jax.random.split(key, n_batches)
        acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.int32),
                              (border, keys))
        return acc

    dt = timeit(sampler_epoch, s.pos_u, s.csr_indptr, s.csr_packed,
                s.train_items, jax.random.PRNGKey(0))
    print(f"sampler_only(2 tries): epoch={dt*1000:.0f}ms "
          f"rate={s.n_pos/dt/1e6:.1f}M pairs/s", flush=True)

    # ---- noitemcheck: full epoch but skip train_items[j] gather ----
    import matfac_tpu.solvers.bpr as bpr_mod
    orig = BPRSolver._sample_negatives

    def sample_nocheck(self, key, u, csr=None):
        if csr is None:
            csr = (self.csr_indptr, self.csr_packed, self.train_items)
        indptr, csr_packed, _ = csr
        Bx = u.shape[0]
        start = indptr[u]
        deg = jnp.maximum(indptr[u + 1] - start, 1)

        def one_try(carry, k_t):
            neg, ok = carry
            k1, k2 = jax.random.split(k_t)
            jj = jax.random.randint(k1, (Bx,), 0, deg)
            row = csr_packed[start + jj]
            item_jj = row[:, 0].astype(jnp.int32)
            val_jj = row[:, 1]
            explicit = val_jj == 0.0
            lo = jnp.where(jj == 0, 0, item_jj + 1)
            next_item = row[:, 2].astype(jnp.int32)
            hi = jnp.where(jj == 0, item_jj,
                           jnp.where(jj == deg - 1, self.n_items,
                                     next_item))
            span = jnp.maximum(hi - lo, 1)
            j = lo + jax.random.randint(k2, (Bx,), 0, 2 ** 30) % span
            valid_gap = hi - lo > 0
            cand = jnp.where(explicit, item_jj, j)
            cand_ok = explicit | valid_gap
            take = cand_ok & ~ok
            neg = jnp.where(take, cand, neg)
            ok = ok | cand_ok
            return (neg, ok), None

        keys = jax.random.split(key, self.n_tries)
        (neg, ok), _ = jax.lax.scan(
            one_try, (jnp.zeros(Bx, jnp.int32), jnp.zeros(Bx, bool)),
            keys)
        return neg, ok

    bpr_mod.BPRSolver._sample_negatives = sample_nocheck
    try:
        s2 = BPRSolver(model, params, mat, iu, ii, n_tries=2)
        st = init_state(params, n_users, n_items)
        key = jax.random.PRNGKey(0)
        key, ek = jax.random.split(key)
        st = s2.epoch(st, 0.01, ek)
        _ = float(jnp.sum(st.u_fac[0]))
        times = []
        for i in range(3):
            key, ek = jax.random.split(key)
            t0 = time.time()
            st = s2.epoch(st, 0.01, ek)
            _ = float(jnp.sum(st.u_fac[0]))
            times.append(time.time() - t0)
        dt = min(times)
        print(f"noitemcheck: epoch={dt*1000:.0f}ms "
              f"rate={s2.n_pos/dt/1e6:.1f}M pairs/s", flush=True)
    finally:
        bpr_mod.BPRSolver._sample_negatives = orig


if __name__ == "__main__":
    main()
