# pixelrec_multimodal_tpu/inference/recommender.py
"""User-facing recommendation interface over the catalog scorer.

Parity target: /root/reference/src/inference/recommender.py:20-294
(Recommender.get_recommendations / get_item_score with unknown-user handling,
candidate validation, filter-seen). Single-user calls keep the reference API;
the batched variants (get_recommendations_batch / score_candidates_batch) are
the TPU-native path used by the evaluators — one compiled call covers whole
user blocks instead of the reference's per-user python loop.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .scorer import CatalogScorer
from ..ops.topk import NEG_INF


class Recommender:
    """Wraps a trained model + dataset for top-K generation and pair scoring."""

    def __init__(self, model, variables: Dict, dataset,
                 item_chunk: Optional[int] = None,
                 user_chunk: Optional[int] = None,
                 mesh=None, precision: str = 'bf16',
                 cascade_candidates: Optional[int] = None,
                 cascade_screen: str = 'additive',
                 cascade_recall: float = 1.0,
                 cascade_c1: Optional[int] = None):
        self.model = model
        self.dataset = dataset
        self.scorer = CatalogScorer(model, variables, dataset.feature_store,
                                    item_chunk=item_chunk,
                                    user_chunk=user_chunk, mesh=mesh,
                                    precision=precision)
        # Opt-in two-stage cascade for attention fusion (screen + exact
        # rescore; scorer.top_k_cascade). An explicit int C trusts the
        # caller's calibration (CatalogScorer.calibrate_cascade); 'auto'
        # calibrates once per catalog snapshot on a user sample and
        # installs a measured-recall plan (scorer.auto_cascade), falling
        # back to the exact full scan when no screen tier reaches the
        # recall target.
        if cascade_candidates is not None and model.fusion_type != 'attention':
            raise ValueError('cascade_candidates applies to attention '
                             f'fusion only (got {model.fusion_type!r})')
        self.cascade_auto = cascade_candidates == 'auto'
        self.cascade_candidates = (None if self.cascade_auto
                                   else cascade_candidates)
        self.cascade_screen = cascade_screen
        # Stage-1 survivor count for the 3-stage 'funnel' tier (additive
        # screen -> token0 candidate screen -> exact rescore); None picks
        # top_k_cascade's default (8*C floor 4096).
        self.cascade_c1 = cascade_c1
        # Recall target for 'auto' calibration. 1.0 (default) only
        # installs tiers whose measured screen recall covers the exact
        # top-k on the sample; < 1.0 admits faster approximate tiers
        # (e.g. the additive screen at its measured recall envelope —
        # 2.36x on the flagship model at recall 0.95).
        if not 0.0 < cascade_recall <= 1.0:
            raise ValueError(
                f"cascade_recall must be in (0, 1], got {cascade_recall}")
        self.cascade_recall = cascade_recall
        self._auto_failed_k: Optional[int] = None
        self._user_classes = set(
            map(str, getattr(dataset.user_encoder, 'classes_', [])))
        self._item_classes = set(
            map(str, getattr(dataset.item_encoder, 'classes_', [])))
        # CSR history for vectorized filter-seen masks.
        self._hist_indptr, self._hist_items = dataset.user_history_matrix()

    # ------------------------------------------------------------ single-user
    def get_recommendations(self, user_id: str, top_k: int = 10,
                            filter_seen: bool = True,
                            candidates: Optional[List[str]] = None
                            ) -> List[Tuple[str, float]]:
        """Top-K (item_id, score) for one user; [] for unknown users
        (reference recommender.py:52-110 semantics)."""
        user_id = str(user_id)
        if user_id not in self._user_classes:
            print(f"Warning: User '{user_id}' not found in the trained "
                  "user encoder.")
            return []
        uidx = int(self.dataset.user_encoder.transform([user_id])[0])

        if candidates is not None:
            valid = [str(c) for c in candidates if str(c) in self._item_classes]
            if not valid:
                return []
            cand_idx = self.dataset.item_encoder.transform(valid)
            if filter_seen:
                seen = self._seen_set(uidx)
                keep = [j for j, ci in enumerate(cand_idx) if ci not in seen]
                if not keep:
                    return []
                valid = [valid[j] for j in keep]
                cand_idx = cand_idx[keep]
            scores = self.scorer.score_candidates(
                np.asarray([uidx]), np.asarray(cand_idx)[None, :])[0]
            order = np.argsort(-scores)[:top_k]
            return [(valid[j], float(scores[j])) for j in order]

        seen_mask = None
        if filter_seen:
            seen_mask = self._seen_mask(np.asarray([uidx]))
        if self.cascade_candidates is not None:
            values, idx = self.scorer.top_k_cascade(
                np.asarray([uidx]), top_k,
                n_candidates=self.cascade_candidates, seen_mask=seen_mask,
                screen=self.cascade_screen, funnel_c1=self.cascade_c1)
        else:
            if self.cascade_auto:
                self._ensure_auto_cascade(top_k)
            values, idx = self.scorer.top_k(np.asarray([uidx]), top_k,
                                            seen_mask=seen_mask)
        out = []
        for v, i in zip(values[0], idx[0]):
            if i < 0:
                continue
            out.append((str(self.dataset.item_encoder.classes_[i]), float(v)))
        return out

    def get_diverse_recommendations(self, user_id: str, top_k: int = 10,
                                    diversity_weight: float = 0.3,
                                    filter_seen: bool = True,
                                    pool_size: Optional[int] = None
                                    ) -> List[Tuple[str, float]]:
        """Diversity-aware top-K via maximal marginal relevance (MMR).

        The reference advertises this through ``--use_diversity`` but never
        implemented it (reference generate_recommendations.py:192-208 falls
        back to standard recommendations); here it works. Procedure:
        retrieve a relevance-ranked candidate pool from the catalog scorer,
        then greedily select items maximizing
        ``(1 - w) * relevance - w * max_similarity_to_selected`` where
        similarity is cosine over the item-side modality representations the
        scorer already holds on device. Returned scores are the model's
        relevance scores, in MMR order.
        """
        if not 0.0 <= diversity_weight <= 1.0:
            raise ValueError(
                f"diversity_weight must be in [0, 1], got {diversity_weight}")
        if str(user_id) not in self._user_classes:
            print(f"Warning: User '{user_id}' not found in the trained "
                  "user encoder.")
            return []
        return self.get_diverse_recommendations_batch(
            [user_id], top_k=top_k, diversity_weight=diversity_weight,
            filter_seen=filter_seen, pool_size=pool_size)[str(user_id)]

    def get_diverse_recommendations_batch(
            self, user_ids: List[str], top_k: int = 10,
            diversity_weight: float = 0.3, filter_seen: bool = True,
            pool_size: Optional[int] = None
            ) -> Dict[str, List[Tuple[str, float]]]:
        """MMR reranking for many users: ONE batched device pass retrieves
        every user's relevance-ranked candidate pool, one gather fetches the
        pooled items' representations, then the greedy MMR selection runs on
        host (it is O(users * pool * top_k) on tiny arrays)."""
        if not 0.0 <= diversity_weight <= 1.0:
            raise ValueError(
                f"diversity_weight must be in [0, 1], got {diversity_weight}")
        if diversity_weight == 0.0:  # pure relevance: skip the pool retrieval
            return self.get_recommendations_batch(user_ids, top_k=top_k,
                                                  filter_seen=filter_seen)
        pool = pool_size or max(top_k * 5, 100)
        pool = min(pool, self.dataset.n_items)
        ranked = self.get_recommendations_batch(user_ids, top_k=pool,
                                                filter_seen=filter_seen)

        # One gather for the union of pooled items across all users.
        all_items = sorted({iid for recs in ranked.values()
                            for iid, _ in recs})
        if not all_items:
            return {u: recs[:top_k] for u, recs in ranked.items()}
        all_idx = self.dataset.item_encoder.transform(all_items)
        # Item-side modality embeddings (already computed for scoring):
        # [n, M, D] -> flattened, L2-normalized rows for cosine similarity.
        emb = np.array(self.scorer._item_feats[np.asarray(all_idx)],
                       dtype=np.float32).reshape(len(all_idx), -1)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True) + 1e-12
        row_of = {iid: r for r, iid in enumerate(all_items)}

        out: Dict[str, List[Tuple[str, float]]] = {}
        for u, recs in ranked.items():
            if len(recs) <= 1:
                out[u] = recs[:top_k]
                continue
            item_ids = [iid for iid, _ in recs]
            rel = np.asarray([s for _, s in recs], dtype=np.float32)
            rows = emb[[row_of[iid] for iid in item_ids]]
            sim = rows @ rows.T
            span = float(rel.max() - rel.min()) or 1.0
            rel_norm = (rel - rel.min()) / span
            w = diversity_weight
            selected: List[int] = [0]  # most relevant item always leads
            remaining = set(range(1, len(item_ids)))
            while remaining and len(selected) < top_k:
                best_j, best_score = -1, -np.inf
                for j in remaining:
                    penalty = max(sim[j, s] for s in selected)
                    score = (1.0 - w) * rel_norm[j] - w * penalty
                    if score > best_score:
                        best_j, best_score = j, score
                selected.append(best_j)
                remaining.discard(best_j)
            out[u] = [(item_ids[j], float(rel[j])) for j in selected]
        return out

    def get_item_score(self, user_id: str, item_id: str) -> float:
        """Predicted score for one pair; 0.0 for unknown user/item
        (reference recommender.py:112-141)."""
        user_id, item_id = str(user_id), str(item_id)
        if user_id not in self._user_classes or item_id not in self._item_classes:
            return 0.0
        uidx = int(self.dataset.user_encoder.transform([user_id])[0])
        iidx = int(self.dataset.item_encoder.transform([item_id])[0])
        s = self.scorer.score_candidates(np.asarray([uidx]),
                                         np.asarray([[iidx]]))
        return float(s[0, 0])

    # ---------------------------------------------------------------- batched
    def get_recommendations_batch(self, user_ids: List[str], top_k: int = 10,
                                  filter_seen: bool = True
                                  ) -> Dict[str, List[Tuple[str, float]]]:
        """Top-K for many users in one device pass."""
        known = [u for u in map(str, user_ids) if u in self._user_classes]
        out: Dict[str, List[Tuple[str, float]]] = {
            str(u): [] for u in user_ids}
        if not known:
            return out
        uidx = self.dataset.user_encoder.transform(known).astype(np.int32)
        seen_mask = self._seen_mask(uidx) if filter_seen else None
        if self.cascade_candidates is not None:
            values, idx = self.scorer.top_k_cascade(
                uidx, top_k, n_candidates=self.cascade_candidates,
                seen_mask=seen_mask, screen=self.cascade_screen,
                funnel_c1=self.cascade_c1)
        else:
            if self.cascade_auto:
                self._ensure_auto_cascade(top_k)
            values, idx = self.scorer.top_k(uidx, top_k, seen_mask=seen_mask)
        item_classes = np.asarray(self.dataset.item_encoder.classes_).astype(str)
        for u, vs, ids in zip(known, values, idx):
            out[u] = [(str(item_classes[i]), float(v))
                      for v, i in zip(vs, ids) if i >= 0]
        return out

    def score_candidates_batch(self, user_indices: np.ndarray,
                               candidate_idx: np.ndarray,
                               candidate_mask: Optional[np.ndarray] = None
                               ) -> np.ndarray:
        """[B] users x [B, C] candidate positions -> [B, C] scores (evaluator
        fast path; indices are encoder positions, not raw ids)."""
        return self.scorer.score_candidates(user_indices, candidate_idx,
                                            candidate_mask)

    # --------------------------------------------------------- auto cascade
    def _ensure_auto_cascade(self, k: int) -> None:
        """Install (once per catalog snapshot / k increase) the measured-
        recall cascade plan. Calibrates on a seeded sample of the full
        trained user population; when no screen tier reaches the recall
        target the scorer keeps the exact full scan (and the failure is
        remembered so each batch does not re-calibrate)."""
        plan = self.scorer._cascade_plan
        if plan is not None and plan['k'] >= k:
            return
        if self._auto_failed_k is not None and k <= self._auto_failed_k:
            return
        n_users = len(self.dataset.user_encoder.classes_)
        res = self.scorer.auto_cascade(
            np.arange(n_users, dtype=np.int32), k,
            recall_target=self.cascade_recall)
        if res is None:
            self._auto_failed_k = max(k, self._auto_failed_k or 0)

    # ----------------------------------------------------------------- history
    def _seen_set(self, uidx: int) -> set:
        lo, hi = self._hist_indptr[uidx], self._hist_indptr[uidx + 1]
        return set(self._hist_items[lo:hi].tolist())

    def _seen_mask(self, user_indices: np.ndarray) -> np.ndarray:
        """[B, n_items] bool mask of items each user has interacted with."""
        B = len(user_indices)
        mask = np.zeros((B, self.dataset.n_items), dtype=bool)
        for row, uidx in enumerate(user_indices):
            lo, hi = self._hist_indptr[uidx], self._hist_indptr[uidx + 1]
            mask[row, self._hist_items[lo:hi]] = True
        return mask

    def _get_user_interactions(self, user_id: str) -> set:
        """Original-id history set (reference recommender.py:271-280)."""
        return self.dataset.get_user_history(str(user_id))

    # ------------------------------------------------- cache API (parity)
    def print_cache_stats(self):
        """Feature-tier statistics (reference recommender.py:282-287; here
        the 'cache' is the device-resident feature store)."""
        stats = self.dataset.feature_store.get_stats()
        print(f"Feature store image tier: {stats['memory_items']} items, "
              f"hit rate {stats['hit_rate']:.2f}")
        print(f"Packed tables: {sorted(self.dataset.feature_store.tables)}")

    def clear_cache(self):
        """Clear the lazy image tier (packed tables are immutable)."""
        self.dataset.feature_store._image_cache.clear()
        print("Feature cache cleared")
