"""BPR pairwise-ranking SGD with device-side gap negative sampling.

TPU-native analog of ModelMFBPR::train / trainHog
(modelMFBPR.cpp:245-722). Positives are train entries with rating > 0
(getBPRUIRatings, modelMFBPR.cpp:46-58). Negative sampling replicates
the reference's CSR gap trick (sampleNegItem, modelMFBPR.cpp:191-242)
with flat-array gathers:

  try: jj ~ U[0, deg_u); if rowval[jj]==0 accept that explicit zero;
  else j ~ U[gap between rated item jj and the next rated item), accept
  if j is a train item (>=1 rating). Up to `n_tries` tries; failures
  drop the example (weight 0 — the reference's own failure handling
  after its 100-try budget, modelMFBPR.cpp:227-241). First-try
  acceptance measured >90% (PERF.md), so the default budget is 2 tries
  (~1% of pairs dropped/epoch) — the sampler is gather-bound and each
  try costs a [B,3] row-gather, so a 16-try budget spent 8x the gathers
  to rescue <10% of pairs.

The pairwise update (modelMFBPR.cpp:501-521):

  r_uij = <p_u, q_p> - <p_u, q_n>;  c = -1 / (1 + exp(r_uij))
  p_u  -= lr (c (q_p - q_n) + 2 uReg p_u)
  q_p  -= lr (c p_u + 2 iReg q_p)
  q_n  -= lr (-c p_u + 2 iReg q_n)

applied batched with scatter-add; the BPRxPoisson hybrid masks dims via
model.triple_rank_mask. LR decays x0.9 per epoch in the caller
(modelMFBPR.cpp:533).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from matfac_tpu.config import Params
from matfac_tpu.models.base import MFState


class BPRSolver:
    def __init__(self, model, params: Params, train_mat,
                 invalid_users: np.ndarray, invalid_items: np.ndarray,
                 batch_size: Optional[int] = None, n_tries: int = 2,
                 mode: str = "stream"):
        """mode="stream": iterate all positives per epoch (train,
        modelMFBPR.cpp:405-559). mode="posneg": per step sample a
        random train user, a random positive from their row, and a
        negative that is either a LOWER-RATED rated item or a gap item
        (trainHogPosNeg + samplePosNegItem, modelMFBPR.cpp:61-132,
        :562-722)."""
        self.model = model
        self.params = params
        self.n_tries = n_tries
        self.mode = mode
        if model.n_items >= 2 ** 24:
            raise ValueError("packed gap sampler stores item ids in "
                             "f32 (exact below 2^24 items)")
        bs = batch_size or params.batch_size

        # positives: rating > 0, valid entities
        r, c, v = train_mat.to_coo()
        keep = (v > 0) & ~invalid_users[r] & ~invalid_items[c]
        pr, pc = r[keep], c[keep]
        # static host shuffle; per-epoch randomness = offset + batch
        # order (see solvers/sgd.py note on TPU sort-compile cost)
        sperm = np.random.default_rng(params.seed).permutation(len(pr))
        pr, pc = pr[sperm], pc[sperm]
        n = len(pr)
        n_pad = (-n) % bs if n else bs
        self.pos_u = jnp.asarray(np.concatenate(
            [pr, np.zeros(n_pad, np.int32)]).astype(np.int32))
        self.pos_i = jnp.asarray(np.concatenate(
            [pc, np.zeros(n_pad, np.int32)]).astype(np.int32))
        self.pos_valid = jnp.asarray(np.concatenate(
            [np.ones(n, np.float32), np.zeros(n_pad, np.float32)]))
        self.n_pos = n
        self.batch_size = bs
        self.n_batches = len(self.pos_u) // bs

        # flat CSR of the full train row (incl. explicit zeros) for gap
        # sampling; rows sorted by construction (RatingMatrix.from_coo).
        # The per-try lookup (col, val, next_col) is PACKED into one
        # row so each try costs one row-gather instead of three —
        # per-index cost dominates TPU gathers (PERF.md), so width-3
        # rows are ~free.
        self.csr_indptr = jnp.asarray(train_mat.indptr.astype(np.int32))
        self.csr_cols = jnp.asarray(train_mat.indices.astype(np.int32))
        self.csr_vals = jnp.asarray(train_mat.values.astype(np.float32))
        nxt = np.empty(train_mat.nnz, np.float32)
        if train_mat.nnz:
            nxt[:-1] = train_mat.indices[1:]
            nxt[-1] = train_mat.indices[-1]
        packed = np.stack([train_mat.indices.astype(np.float32),
                           train_mat.values.astype(np.float32),
                           nxt], axis=1)
        self.csr_packed = jnp.asarray(packed)   # [nnz, 3] f32
        # items with >= 1 train rating (trainItems set, :442-448)
        ti = np.zeros(model.n_items, bool)
        deg_i = train_mat.col_degrees()
        ti[: len(deg_i)] = deg_i > 0
        self.train_items = jnp.asarray(ti)
        self.n_items = int(model.n_items)
        deg_u = train_mat.row_degrees()
        tu = np.nonzero((deg_u > 0) & ~invalid_users[: train_mat.nrows])[0]
        self.train_users = jnp.asarray(tu.astype(np.int32))
        self._epoch = (self._build_epoch() if mode == "stream"
                       else self._build_posneg_epoch())
        self.last_loss = jnp.zeros(())
        self.last_inversions = jnp.zeros((), jnp.int32)

    # ------------------------------------------------------------------
    def _sample_negatives(self, key, u, csr=None):
        """Vectorized gap sampling for a batch of users. Returns
        (neg_idx[B], ok[B]). ``csr``: (indptr, cols, vals, train_items)
        passed as traced args from the epoch (closure constants blow up
        compile time); defaults to the staged arrays for direct calls."""
        if csr is None:
            csr = (self.csr_indptr, self.csr_packed, self.train_items)
        indptr, csr_packed, train_items = csr
        B = u.shape[0]
        start = indptr[u]
        deg = indptr[u + 1] - start
        deg = jnp.maximum(deg, 1)

        def one_try(carry, k_t):
            neg, ok = carry
            k1, k2 = jax.random.split(k_t)
            jj = jax.random.randint(k1, (B,), 0, deg)
            pos = start + jj
            row = csr_packed[pos]                    # one [B, 3] gather
            item_jj = row[:, 0].astype(jnp.int32)
            val_jj = row[:, 1]
            # explicit zero at sampled position -> direct accept
            explicit = val_jj == 0.0
            # gap bounds (modelMFBPR.cpp:211-222)
            lo = jnp.where(jj == 0, 0, item_jj + 1)
            # packed next-col is exact except at the very last nnz entry
            # (clamped there, matching the jj==deg-1 branch below anyway)
            next_item = row[:, 2].astype(jnp.int32)
            # branch precedence matches :211-222 — jj==0 before jj==deg-1,
            # so a single-rating user samples from [0, first rated item)
            hi = jnp.where(jj == 0, item_jj,
                           jnp.where(jj == deg - 1, self.n_items,
                                     next_item))
            span = jnp.maximum(hi - lo, 1)
            j = lo + jax.random.randint(k2, (B,), 0, 2 ** 30) % span
            valid_gap = (hi - lo > 0) & train_items[
                jnp.clip(j, 0, self.n_items - 1)]
            cand = jnp.where(explicit, item_jj, j)
            cand_ok = explicit | valid_gap
            take = cand_ok & ~ok
            neg = jnp.where(take, cand, neg)
            ok = ok | cand_ok
            return (neg, ok), None

        keys = jax.random.split(key, self.n_tries)
        (neg, ok), _ = jax.lax.scan(
            one_try, (jnp.zeros(B, jnp.int32), jnp.zeros(B, bool)), keys)
        return neg, ok

    # ------------------------------------------------------------------
    def _build_epoch(self):
        model = self.model
        u_reg = float(self.params.u_reg)
        i_reg = float(self.params.i_reg)
        n_batches = self.n_batches
        B = self.batch_size
        eps = float(self.params.eps)

        n_total = self.pos_u.shape[0]

        @functools.partial(jax.jit, donate_argnums=(0,))
        def epoch(state: MFState, pos_u, pos_i, pos_valid, indptr,
                  csr_packed, train_items, lr, key):
            csr = (indptr, csr_packed, train_items)
            k_ord, key = jax.random.split(key)
            border = jax.random.permutation(k_ord, n_batches)

            def step(carry, xs):
                st, loss, inv = carry
                b_idx, k_b = xs
                # contiguous slices + random batch order (element-level
                # rotation costs scalar-gather passes — see solvers/sgd.py)
                k_neg, k_mask = jax.random.split(k_b)
                u = jax.lax.dynamic_slice_in_dim(pos_u, b_idx * B, B)
                p = jax.lax.dynamic_slice_in_dim(pos_i, b_idx * B, B)
                v = jax.lax.dynamic_slice_in_dim(pos_valid, b_idx * B, B)
                neg, ok = self._sample_negatives(k_neg, u, csr)
                w = v * ok.astype(jnp.float32)
                m = model.triple_rank_mask(k_mask, u, p, neg)
                pu = st.u_fac[u]
                qp = st.i_fac[p]
                qn = st.i_fac[neg]
                if m is None:
                    r_ui = jnp.einsum("ek,ek->e", pu, qp,
                                      preferred_element_type=jnp.float32)
                    r_uj = jnp.einsum("ek,ek->e", pu, qn,
                                      preferred_element_type=jnp.float32)
                else:
                    r_ui = jnp.einsum("ek,ek->e", pu * m, qp,
                                      preferred_element_type=jnp.float32)
                    r_uj = jnp.einsum("ek,ek->e", pu * m, qn,
                                      preferred_element_type=jnp.float32)
                r_uij = r_ui - r_uj
                inv = inv + jnp.sum((r_uj - r_ui > eps) & (w > 0)
                                    ).astype(jnp.int32)
                loss = loss + jnp.sum(w * jnp.logaddexp(0.0, -r_uij))
                coeff = w * (-1.0 / (1.0 + jnp.exp(r_uij)))
                gu = coeff[:, None] * (qp - qn) \
                    + 2.0 * u_reg * w[:, None] * pu
                gp = coeff[:, None] * pu + 2.0 * i_reg * w[:, None] * qp
                gn = -coeff[:, None] * pu + 2.0 * i_reg * w[:, None] * qn
                if m is not None:
                    gu, gp, gn = gu * m, gp * m, gn * m
                # one fused scatter over [p; neg] instead of two passes
                i_idx = jnp.concatenate([p, neg])
                i_upd = jnp.concatenate([gp, gn])
                st = st._replace(
                    u_fac=st.u_fac.at[u].add((-lr * gu).astype(st.u_fac.dtype)),
                    i_fac=st.i_fac.at[i_idx].add((-lr * i_upd).astype(st.i_fac.dtype)))
                return (st, loss, inv), None

            keys = jax.random.split(key, n_batches)
            (state, loss, inv), _ = jax.lax.scan(
                step, (state, jnp.zeros(()), jnp.zeros((), jnp.int32)),
                (border, keys))
            return state, loss, inv

        return epoch

    # ------------------------------------------------------------------
    def _build_posneg_epoch(self):
        model = self.model
        u_reg = float(self.params.u_reg)
        i_reg = float(self.params.i_reg)
        n_batches = self.n_batches
        B = self.batch_size
        eps = float(self.params.eps)
        n_tries = self.n_tries

        @functools.partial(jax.jit, donate_argnums=(0,))
        def epoch(state: MFState, train_users, indptr, csr_packed,
                  train_items, lr, key):
            n_tr = train_users.shape[0]

            def step(carry, k_b):
                st, loss, inv = carry
                k_u, k_p, k_neg, k_mask = jax.random.split(k_b, 4)
                u = train_users[jax.random.randint(k_u, (B,), 0, n_tr)]
                start = indptr[u]
                deg = jnp.maximum(indptr[u + 1] - start, 1)
                jj_p = jax.random.randint(k_p, (B,), 0, deg)
                prow = csr_packed[start + jj_p]
                p = prow[:, 0].astype(jnp.int32)
                pos_rat = prow[:, 1]
                pos_ok = pos_rat > 0

                # negative: explicit lower-rated item or gap item
                def one_try(carry2, k_t):
                    neg, ok = carry2
                    k1, k2 = jax.random.split(k_t)
                    jj = jax.random.randint(k1, (B,), 0, deg)
                    row = csr_packed[start + jj]
                    item_jj = row[:, 0].astype(jnp.int32)
                    val_jj = row[:, 1]
                    explicit = val_jj < pos_rat   # :88 explicit negative
                    lo = jnp.where(jj == 0, 0, item_jj + 1)
                    nxt = row[:, 2].astype(jnp.int32)
                    hi = jnp.where(jj == 0, item_jj,
                                   jnp.where(jj == deg - 1, self.n_items,
                                             nxt))
                    span = jnp.maximum(hi - lo, 1)
                    j = lo + jax.random.randint(k2, (B,), 0, 2 ** 30) % span
                    gap_ok = (hi - lo > 0) & train_items[
                        jnp.clip(j, 0, self.n_items - 1)]
                    cand = jnp.where(explicit, item_jj, j)
                    cand_ok = explicit | gap_ok
                    take = cand_ok & ~ok
                    return (jnp.where(take, cand, neg), ok | cand_ok), None

                keys_t = jax.random.split(k_neg, n_tries)
                (neg, ok), _ = jax.lax.scan(
                    one_try, (jnp.zeros(B, jnp.int32),
                              jnp.zeros(B, bool)), keys_t)
                w = (pos_ok & ok).astype(jnp.float32)
                m = model.triple_rank_mask(k_mask, u, p, neg)
                pu = st.u_fac[u]
                qp = st.i_fac[p]
                qn = st.i_fac[neg]
                pm = pu if m is None else pu * m
                r_ui = jnp.einsum("ek,ek->e", pm, qp,
                                  preferred_element_type=jnp.float32)
                r_uj = jnp.einsum("ek,ek->e", pm, qn,
                                  preferred_element_type=jnp.float32)
                r_uij = r_ui - r_uj
                inv = inv + jnp.sum((r_uj - r_ui > eps) & (w > 0)
                                    ).astype(jnp.int32)
                loss = loss + jnp.sum(w * jnp.logaddexp(0.0, -r_uij))
                coeff = w * (-1.0 / (1.0 + jnp.exp(r_uij)))
                gu = coeff[:, None] * (qp - qn) \
                    + 2.0 * u_reg * w[:, None] * pu
                gp = coeff[:, None] * pu + 2.0 * i_reg * w[:, None] * qp
                gn = -coeff[:, None] * pu + 2.0 * i_reg * w[:, None] * qn
                if m is not None:
                    gu, gp, gn = gu * m, gp * m, gn * m
                # one fused scatter over [p; neg] instead of two passes
                i_idx = jnp.concatenate([p, neg])
                i_upd = jnp.concatenate([gp, gn])
                st = st._replace(
                    u_fac=st.u_fac.at[u].add((-lr * gu).astype(st.u_fac.dtype)),
                    i_fac=st.i_fac.at[i_idx].add((-lr * i_upd).astype(st.i_fac.dtype)))
                return (st, loss, inv), None

            keys = jax.random.split(key, n_batches)
            (state, loss, inv), _ = jax.lax.scan(
                step, (state, jnp.zeros(()), jnp.zeros((), jnp.int32)),
                keys)
            return state, loss, inv

        return epoch

    def epoch(self, state: MFState, lr: float, key) -> MFState:
        if self.mode == "posneg":
            state, self.last_loss, self.last_inversions = self._epoch(
                state, self.train_users, self.csr_indptr,
                self.csr_packed, self.train_items, jnp.float32(lr), key)
        else:
            state, self.last_loss, self.last_inversions = self._epoch(
                state, self.pos_u, self.pos_i, self.pos_valid,
                self.csr_indptr, self.csr_packed,
                self.train_items, jnp.float32(lr), key)
        return state
