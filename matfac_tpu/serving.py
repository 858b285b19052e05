"""Batch recommendation serving.

The deployment-facing surface the reference lacks entirely (its only
"serving" is offline top-N analysis): load a trained model, keep the
item table device-resident, and answer "top-N unrated items for these
users" with warm-jitted blocked scoring (eval.ranking engine, or the
fused Pallas kernel on TPU).

    recommender = Recommender.from_checkpoint(prefix, params, data)
    items, scores = recommender.recommend([12, 99, 1042], n=10)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from matfac_tpu.config import Params
from matfac_tpu.eval.ranking import CatalogScorer
from matfac_tpu.models.base import EvalView
from matfac_tpu.utils import freq as ufreq


class Recommender:
    def __init__(self, view: EvalView, train_mat, n_users: int,
                 n_items: int, invalid_users: Optional[np.ndarray] = None,
                 invalid_items: Optional[np.ndarray] = None,
                 user_block: int = 256, item_block: int = 32768,
                 use_pallas: Optional[bool] = None):
        if invalid_users is None or invalid_items is None:
            invalid_users, invalid_items = ufreq.invalid_users_items(
                train_mat, n_users, n_items)
        self.view = view
        self.n_users = n_users
        self.user_block = user_block
        # Default to the XLA scorer everywhere: on-chip the single-
        # dispatch XLA scan beat the per-block Pallas path 83 ms vs
        # 452 ms per 4096x8192 catalog pass (PERF.md "Full-catalog
        # top-N eval"); Pallas stays opt-in for experimentation.
        if use_pallas is None:
            use_pallas = False
        if use_pallas:
            from matfac_tpu.ops.topk_kernel import PallasCatalogScorer
            # the Pallas kernel's score tile ([user_block, item_block]
            # f32) lives in VMEM — a 32k item block would blow the
            # ~16 MB budget (the oversubscription crash documented in
            # ops/block_sgd_kernel.py), so clamp its block only
            self._scorer = PallasCatalogScorer(
                train_mat, invalid_users, invalid_items, n_users,
                n_items, user_block=user_block,
                item_block=min(item_block, 4096))
            self._pallas = True
        else:
            self._scorer = CatalogScorer(
                train_mat, invalid_users, invalid_items, n_users,
                n_items, user_block=user_block, item_block=item_block)
            self._pallas = False

    @classmethod
    def from_checkpoint(cls, prefix: str, params: Params, data,
                        model=None, **kw) -> "Recommender":
        """Load text-format factors saved by the training loop."""
        from matfac_tpu.models.base import ModelMF, init_state
        from matfac_tpu.train import checkpoint as ck

        model = model or ModelMF(params, data.n_users, data.n_items)
        sig = ck.model_signature(params, data.n_users, data.n_items)
        state = ck.load_facs(
            init_state(params, data.n_users, data.n_items), prefix, sig)
        if state is None:
            raise FileNotFoundError(
                f"no checkpoint at {prefix}_*Fac_{sig}.mat")
        return cls(model.eval_view(state), data.train_mat, data.n_users,
                   data.n_items, **kw)

    def recommend(self, users: Sequence[int], n: int = 10
                  ) -> Tuple[np.ndarray, np.ndarray]:
        """(item_ids [len(users), n], scores) — excludes each user's
        train-rated and invalid items.

        XLA path: scores EXACTLY the queried users in ONE dispatch
        (query size padded to a power-of-two bucket for compile
        reuse). The original per-covering-block loop cost one tunneled
        dispatch per distinct user block — 256 scattered users over a
        100k-user table hit ~230 blocks = 13 s/batch (measured,
        scripts/tpu_serving_latency.py)."""
        users = np.asarray(users, dtype=np.int64)
        if (users < 0).any() or (users >= self.n_users).any():
            raise ValueError("user id out of range")
        if self._pallas:
            # the Pallas scorer's rated-exclusion tiles are staged per
            # FIXED block, so it keeps the per-block path
            scores, items = self._topk_for_blocks(np.unique(
                users // self.user_block), n)
            out_i = np.empty((len(users), n), np.int64)
            out_s = np.empty((len(users), n), np.float32)
            for j, u in enumerate(users):
                b = int(u // self.user_block)
                r = int(u % self.user_block)
                out_i[j] = items[b][r]
                out_s[j] = scores[b][r]
            return out_i, out_s
        from matfac_tpu.eval.ranking import topk_catalog_block
        sc = self._scorer
        # cache keyed on view identity: replacing self.view (e.g. after
        # more training) must invalidate the padded copy or the XLA
        # path would silently serve stale factors
        if getattr(self, "_padded_src", None) is not self.view:
            self._padded_view = sc._pad_view(self.view)
            self._padded_src = self.view
        view = self._padded_view
        # bound the per-dispatch score matrix ([B, item_block] f32) —
        # unbounded query sizes would scale HBM with the request
        cap = 4096
        out_i = np.empty((len(users), n), np.int64)
        out_s = np.empty((len(users), n), np.float32)
        for s in range(0, len(users), cap):
            chunk = users[s:s + cap]
            m = len(chunk)
            B = max(64, 1 << (m - 1).bit_length())
            ids = np.zeros(B, np.int32)
            ids[:m] = chunk
            ids_d = jnp.asarray(ids)
            bv, bi = topk_catalog_block(
                view, ids_d, sc.rated_cols[ids_d], sc.rated_mask[ids_d],
                sc.invalid_items_dev, n, sc.item_block)
            out_i[s:s + m] = np.asarray(bi)[:m]
            out_s[s:s + m] = np.asarray(bv)[:m]
        return out_i, out_s

    def _topk_for_blocks(self, blocks: np.ndarray, n: int):
        """Pallas-path block scoring (its rated-exclusion tiles are
        staged per FIXED user block); the XLA path scores queried
        users directly in recommend()."""
        from matfac_tpu.ops.topk_kernel import topk_tiles
        scores, items = {}, {}
        sc = self._scorer
        i_fac = self.view.i_fac
        i_bias = self.view.i_bias
        pad = sc.I_pad - i_fac.shape[0]
        if pad:
            i_fac = jnp.pad(i_fac, ((0, pad), (0, 0)))
            i_bias = jnp.pad(i_bias, (0, pad))
        for b in blocks:
            s = int(b) * self.user_block
            uids = np.clip(np.arange(s, s + self.user_block), 0,
                           self.view.u_fac.shape[0] - 1)
            bv, bi = topk_tiles(
                self.view.u_fac[jnp.asarray(uids)], i_fac, i_bias,
                sc.invalid, sc.rated_tiles[int(b)], n,
                sc.item_block, sc.c_max, interpret=sc.interpret)
            scores[int(b)] = np.asarray(bv)
            items[int(b)] = np.asarray(bi)
        return scores, items
