# pixelrec_multimodal_tpu/evaluation/tasks.py
"""Retrieval and ranking evaluators.

Parity target: /root/reference/src/evaluation/tasks.py:19-1025 — the
EvaluationTask enum, BaseEvaluator, TopKRetrievalEvaluator (per-user
deterministically seeded negative sampling, candidate-set ranking, vectorized
accuracy metrics, novelty/diversity/personalization pass) and
TopKRankingEvaluator, plus the factory + string mapping with explicitly
removed legacy tasks.

TPU-native redesign: instead of the reference's per-user
``get_recommendations`` loop (optionally forked across a ProcessPoolExecutor,
tasks.py:546-561), candidate sets for ALL users are assembled on the host and
scored in a handful of compiled device calls via
``recommender.score_candidates_batch``. Recommenders without that method
(e.g. baselines) fall back to the duck-typed per-user path.

Determinism: the reference derives per-user seeds with Python's builtin
``hash`` (tasks.py:215-219, 340-342), which is salted unless PYTHONHASHSEED is
pinned. When PYTHONHASHSEED is set we use builtin ``hash`` for bit-exact
parity with a reference run under the same seed; otherwise a stable blake2b
hash with identical modulus (documented deviation, SURVEY.md §7 hard parts).
"""
from __future__ import annotations

import hashlib
import logging
import os
import random
from abc import ABC, abstractmethod
from enum import Enum
from typing import Any, Dict, List, Optional, Set, Tuple

import numpy as np
import pandas as pd
import scipy.sparse as sp

from .novelty import NoveltyMetrics


class EvaluationTask(Enum):
    """Available evaluation tasks (reference tasks.py:19-28)."""
    TOP_K_RETRIEVAL = "top_k_retrieval"
    TOP_K_RANKING = "top_k_ranking"


def stable_user_seed(user_id: str, suffix: str = '') -> int:
    """Per-user 31-bit seed (reference tasks.py:215-219 semantics)."""
    s = str(user_id) + suffix
    if os.environ.get('PYTHONHASHSEED') not in (None, 'random'):
        return hash(s) % (2 ** 31)
    digest = hashlib.blake2b(s.encode('utf-8'), digest_size=8).digest()
    return int.from_bytes(digest, 'little') % (2 ** 31)


class BaseEvaluator(ABC):
    """Shared evaluator state and reporting (reference tasks.py:31-118)."""

    def __init__(self, recommender, test_data: pd.DataFrame, config,
                 task_name: str, **kwargs):
        self.recommender = recommender
        self.config = config
        self.task_name = task_name
        self.top_k = getattr(config.recommendation, 'top_k', 20)
        self.filter_seen = kwargs.get('filter_seen', True)
        self.test_data = test_data.copy()
        self.test_data['user_id'] = self.test_data['user_id'].astype(str)
        self.test_data['item_id'] = self.test_data['item_id'].astype(str)
        logging.basicConfig(level=logging.INFO)
        self.logger = logging.getLogger(self.__class__.__name__)

    @abstractmethod
    def evaluate(self) -> Dict[str, Any]:
        ...

    def print_summary(self, results: Dict[str, Any]):
        print(f"\n=== {self.task_name} Results ===")
        for metric, value in results.items():
            if metric in ('evaluation_metadata', 'predictions'):
                continue
            if isinstance(value, float):
                print(f"{metric}: {value:.4f}")
            else:
                print(f"{metric}: {value}")


class TopKRetrievalEvaluator(BaseEvaluator):
    """Candidate-set retrieval evaluation with sampled negatives."""

    def __init__(self, recommender, test_data: pd.DataFrame, config,
                 use_sampling: bool = True, num_negatives: int = 100,
                 sampling_strategy: str = 'random',
                 full_catalog: bool = False, **kwargs):
        super().__init__(recommender, test_data, config, "Top-K Retrieval",
                         **kwargs)
        self.use_sampling = use_sampling
        self.num_negatives = num_negatives
        self.sampling_strategy = sampling_strategy
        # full_catalog: rank every user's TOP-K OVER THE ENTIRE CATALOG —
        # the reference recommender's candidates=None hot loop (reference
        # recommender.py:96-106, batch-256 host python per user) done as
        # blocked fused-scorer top-K. This is the meaningful full-catalog
        # mode; `use_sampling=False` stays reference-parity (positives-only
        # candidate set, reference tasks.py:332-338 — docs/evaluation.md).
        self.full_catalog = full_catalog
        self.num_workers = kwargs.get('num_workers', 1)  # kept for API parity

    # ----------------------------------------------------------- candidates
    def _get_all_item_ids(self) -> List[str]:
        """Full catalog from the recommender's item encoder, test-data
        fallback (reference tasks.py:159-179)."""
        ds = getattr(self.recommender, 'dataset', None)
        enc = getattr(ds, 'item_encoder', None) if ds is not None else None
        classes = getattr(enc, 'classes_', None)
        if classes is not None:
            return [str(i) for i in classes]
        return list(self.test_data['item_id'].unique())

    def _catalog_arrays(self):
        """Catalog id list, id->position map and test-count weights, built
        ONCE per evaluator.

        The reference rebuilds the full candidate list and a per-candidate
        ``counts.get`` weight list for every user (tasks.py:181-308) —
        O(users x catalog) host python, its own documented hot spot. Caching
        these and sampling through a virtual index (below) preserves the
        exact RNG streams while dropping the per-user catalog scans.
        """
        cache = getattr(self, '_catalog_cache', None)
        if cache is None:
            all_items = self._get_all_item_ids()
            pos_of = {item: i for i, item in enumerate(all_items)}
            counts = self.test_data['item_id'].value_counts()
            # Same values as the reference's per-candidate
            # ``float(counts.get(i, 1))`` (default 1 for unseen items).
            counts_arr = counts.reindex(all_items).fillna(1.0).to_numpy(
                dtype=np.float64)
            cache = self._catalog_cache = (all_items, pos_of, counts_arr)
        return cache

    def _sample_negatives(self, user_id: str,
                          positive_items: List[str]) -> List[str]:
        """Seeded per-user negative sampling (reference tasks.py:181-308).

        Draws positions into the VIRTUAL candidate list (catalog minus this
        user's positives, order preserved) and maps them back, instead of
        materializing the list per user. ``random.Random(seed).sample`` on a
        range consumes the generator identically to sampling the list itself
        (the algorithm depends only on the population length), so outputs are
        bit-identical to the reference under a pinned PYTHONHASHSEED.
        """
        all_items, pos_of, counts_arr = self._catalog_arrays()
        pos = {str(i) for i in positive_items}
        pos_positions = sorted(pos_of[p] for p in pos if p in pos_of)
        n_candidates = len(all_items) - len(pos_positions)

        def virt(j: int) -> str:
            # j-th element of the catalog with positives skipped.
            for q in pos_positions:
                if q <= j:
                    j += 1
                else:
                    break
            return all_items[j]

        if n_candidates < self.num_negatives:
            return [virt(j) for j in range(n_candidates)]
        if not n_candidates:
            return []

        seed = stable_user_seed(user_id)
        n = min(self.num_negatives, n_candidates)

        if self.sampling_strategy == 'random':
            idxs = random.Random(seed).sample(range(n_candidates), n)
            return [virt(j) for j in idxs]

        # popularity / popularity_inverse: weights from test-data counts with
        # default count 1 for unseen items (reference :226-308).
        raw = (np.delete(counts_arr, pos_positions) if pos_positions
               else counts_arr.copy())
        if self.sampling_strategy == 'popularity_inverse':
            raw = 1.0 / raw
        if raw.sum() == 0:
            raw = np.ones_like(raw)
        p = raw / raw.sum()
        rng = np.random.RandomState(seed)
        try:
            picked = rng.choice(n_candidates, size=n, replace=False, p=p)
            return [virt(int(j)) for j in picked]
        except ValueError as e:
            print(f"Warning: {self.sampling_strategy} sampling failed for "
                  f"user {user_id}: {e}. Using random sampling.")
            idxs = random.Random(seed).sample(range(n_candidates), n)
            return [virt(j) for j in idxs]

    def _candidate_set(self, user_id: str,
                       positive_items: List[str]) -> List[str]:
        """Positives + sampled negatives, deduped and seed-shuffled
        (reference tasks.py:329-342)."""
        candidates = list(positive_items)
        if self.use_sampling:
            candidates.extend(self._sample_negatives(user_id, positive_items))
        candidates = list(dict.fromkeys(candidates))
        random.Random(stable_user_seed(user_id, 'shuffle')).shuffle(candidates)
        return candidates

    # -------------------------------------------------------------- scoring
    def _rank_all_users(self, user_groups) -> List[Tuple[str, List, List, List]]:
        """Per-user (user_id, recommendations, positives, recommended-ids).

        Batched path: pad the candidate lists into one [U, C_max] index matrix
        and score everything in a few compiled calls.
        """
        users, candidates, positives = [], [], []
        for user_id, inter in user_groups:
            user_id = str(user_id)
            pos = [str(i) for i in inter['item_id'].tolist()]
            users.append(user_id)
            positives.append(pos)
            if not self.full_catalog:
                candidates.append(
                    self._candidate_set(user_id, pos) if pos else [])

        if self.full_catalog:
            return self._rank_full_catalog(users, positives)

        fast = hasattr(self.recommender, 'score_candidates_batch')
        if fast:
            try:
                return self._rank_batched(users, candidates, positives)
            except Exception as e:
                self.logger.warning(
                    f"Batched scoring failed ({e}); falling back to "
                    "per-user path.")
        return self._rank_sequential(users, candidates, positives)

    def _rank_full_catalog(self, users, positives):
        """Top-K over the whole catalog per user (|users| x |catalog|).

        filter_seen=False keeps every test positive rankable — same contract
        as the candidate-set path (reference tasks.py:344-354 passes
        filter_seen=False). Learned recommenders take the one-device-pass
        batched path (fused CatalogScorer, internally blocked); duck-typed
        baselines fall back to their per-user full-catalog ranking.
        """
        rec = self.recommender
        if hasattr(rec, 'get_recommendations_batch'):
            out = rec.get_recommendations_batch(
                users, top_k=self.top_k, filter_seen=False)
        else:
            out = {}
            for u in users:
                try:
                    out[u] = rec.get_recommendations(
                        u, top_k=self.top_k, filter_seen=False)
                except Exception as e:
                    print(f"Error evaluating user {u}: {e}")
                    out[u] = []
        results = []
        for u, pos in zip(users, positives):
            recs = [(str(i), float(s)) for i, s in out.get(u, [])]
            results.append((u, recs, pos, [i for i, _ in recs]))
        return results

    def _rank_batched(self, users, candidates, positives):
        ds = self.recommender.dataset
        known_users = set(map(str, ds.user_encoder.classes_))
        known_items = set(map(str, ds.item_encoder.classes_))

        rows = [i for i, u in enumerate(users)
                if u in known_users and candidates[i]]
        results = [(u, [], positives[i], []) for i, u in enumerate(users)]
        if not rows:
            return results

        c_max = max(len(candidates[i]) for i in rows)
        uidx = ds.user_encoder.transform([users[i] for i in rows])
        cand_idx = np.zeros((len(rows), c_max), dtype=np.int32)
        cand_mask = np.zeros((len(rows), c_max), dtype=bool)
        # ONE encoder transform for all users' candidates — a per-user
        # transform call costs ~1-3ms of sklearn overhead each (measured
        # ~15s of the eval wall-clock at 5k users).
        cand_ids: List[List[str]] = [
            [c for c in candidates[i] if c in known_items] for i in rows]
        flat = [c for valid in cand_ids for c in valid]
        if flat:
            flat_enc = ds.item_encoder.transform(flat)
            pos = 0
            for r, valid in enumerate(cand_ids):
                n = len(valid)
                if n:
                    cand_idx[r, :n] = flat_enc[pos:pos + n]
                    cand_mask[r, :n] = True
                pos += n

        scores = self.recommender.score_candidates_batch(
            np.asarray(uidx, np.int32), cand_idx, cand_mask)

        for r, i in enumerate(rows):
            valid = cand_ids[r]
            if not valid:
                continue
            s = scores[r, :len(valid)]
            order = np.argsort(-s)[: self.top_k]
            recs = [(valid[j], float(s[j])) for j in order]
            results[i] = (users[i], recs, positives[i],
                          [it for it, _ in recs])
        return results

    def _rank_sequential(self, users, candidates, positives):
        """Duck-typed per-user path (reference tasks.py:310-364)."""
        out = []
        for u, cands, pos in zip(users, candidates, positives):
            if not pos:
                out.append((u, [], [], []))
                continue
            try:
                recs = self.recommender.get_recommendations(
                    user_id=u, top_k=self.top_k, filter_seen=False,
                    candidates=cands)
                recs = [(str(i), s) for i, s in recs] if recs else []
                out.append((u, recs, pos, [i for i, _ in recs]))
            except Exception as e:
                print(f"Error evaluating user {u}: {e}")
                out.append((u, [], pos, []))
        return out

    # ---------------------------------------------------------------- metrics
    @staticmethod
    def _make_rec_matrix(predicted_lists: List[list]) -> sp.csr_matrix:
        """Users x recommended-items indicator matrix (reference :368-400)."""
        if not predicted_lists:
            return sp.csr_matrix((0, 0))
        item_to_col: Dict[str, int] = {}
        rows, cols = [], []
        for uidx, recs in enumerate(predicted_lists):
            for item in recs:
                col = item_to_col.setdefault(item, len(item_to_col))
                rows.append(uidx)
                cols.append(col)
        if not rows:
            return sp.csr_matrix((len(predicted_lists), 0))
        return sp.csr_matrix(
            (np.ones(len(rows)), (rows, cols)),
            shape=(len(predicted_lists), len(item_to_col)))

    @staticmethod
    def _calculate_personalization(predicted_lists: List[list]) -> float:
        """1 - mean pairwise cosine of users' recommendation sets (:402-428)."""
        if not predicted_lists:
            return 0.0
        m = TopKRetrievalEvaluator._make_rec_matrix(predicted_lists)
        n = m.shape[0]
        if n <= 1:
            return 1.0
        # Closed form for the mean pairwise cosine: with rows normalized
        # (zero rows stay zero, matching sklearn's cosine of a zero
        # vector = 0), sum over ALL ordered pairs of cos(u, v) equals
        # ||sum_u u_hat||^2, of which n_nz are the diagonal ones. Equal
        # to sklearn cosine_similarity + triu mean (the reference's
        # pattern) up to fp rounding, but O(nnz) instead of O(n^2)
        # (measured 10.1s -> <0.1s at 5k users).
        norms = np.sqrt(np.asarray(m.multiply(m).sum(axis=1)).ravel())
        nz = norms > 0
        inv = np.zeros_like(norms)
        inv[nz] = 1.0 / norms[nz]
        m_hat = sp.diags(inv) @ m
        colsum = np.asarray(m_hat.sum(axis=0)).ravel()
        total = float(colsum @ colsum)           # sum over ordered pairs
        mean_cos = (total - int(nz.sum())) / (n * (n - 1))
        return 1 - mean_cos

    def _item_input_embeddings(self, item_ids: Set[str]
                               ) -> Optional[Dict[str, np.ndarray]]:
        """Concatenated input-feature vectors per recommended item, for
        intra-list similarity.

        The reference concatenates each item's processed input features
        (tasks.py:432-507); its image/text branches crash on a NameError
        (:479, 484-485), leaving tag + numerical. Here the intended behavior:
        tag index + numerical features + any packed encoder-embedding tables
        (vision/language), drawn from the feature store in O(1) per item.
        """
        ds = getattr(self.recommender, 'dataset', None)
        store = getattr(ds, 'feature_store', None) if ds is not None else None
        if store is None:
            return None
        enc = ds.item_encoder
        known = set(map(str, enc.classes_))
        ids = [str(i) for i in item_ids if str(i) in known]
        if not ids:
            return None
        # One encoder transform + one table gather for ALL items — the
        # per-item transform loop cost ~70s at 20k recommended items.
        pos = np.asarray(enc.transform(ids), np.int64)
        cols = [np.asarray(store.tables['tag_idx'], np.float64)[pos, None]]
        if 'numerical' in store.tables:
            cols.append(store.tables['numerical'][pos].astype(np.float64))
        for key in ('vision_emb', 'language_emb'):
            if key in store.tables:
                cols.append(store.tables[key][pos].astype(np.float64))
        mat = np.concatenate(cols, axis=1)
        return {i: mat[j] for j, i in enumerate(ids)}

    # ---------------------------------------------------------------- driver
    def evaluate(self) -> Dict[str, Any]:
        """Run retrieval evaluation (reference tasks.py:509-716)."""
        print(f"Evaluating Top-K Retrieval (K={self.top_k})")
        if self.full_catalog:
            print("Full-catalog mode: ranking every user's top-K over the "
                  "entire catalog")
        elif self.use_sampling:
            print(f"Using negative sampling: {self.num_negatives} negatives "
                  f"per user, strategy: {self.sampling_strategy}")

        user_groups = list(self.test_data.groupby('user_id'))
        num_users = len(user_groups)
        np.random.seed(42)
        random.seed(42)

        raw = self._rank_all_users(user_groups)

        all_predictions = {r[0]: r[1] for r in raw}
        all_pos = [r[2] for r in raw]
        all_rec = [r[3] for r in raw]

        hits_at_k = np.zeros(num_users)
        prec_den = np.asarray([len(r) for r in all_rec], dtype=np.float32)
        rec_den = np.asarray([len(p) for p in all_pos], dtype=np.float32)
        mrr = np.zeros(num_users)
        ndcg = np.zeros(num_users)

        for i in range(num_users):
            pos_set = set(all_pos[i])
            if not pos_set:
                continue
            rec_list = all_rec[i]
            hits_at_k[i] = len(set(rec_list) & pos_set)
            for j, item in enumerate(rec_list, 1):
                if item in pos_set:
                    mrr[i] = 1.0 / j
                    break
            ndcg[i] = self._calculate_ndcg(rec_list, pos_set, self.top_k)

        with np.errstate(divide='ignore', invalid='ignore'):
            precision = hits_at_k / prec_den
            recall = hits_at_k / rec_den
        precision[np.isnan(precision)] = 0.0
        recall[np.isnan(recall)] = 0.0
        with np.errstate(divide='ignore', invalid='ignore'):
            f1 = 2 * precision * recall / (precision + recall)
        f1[np.isnan(f1)] = 0.0
        hit_rate = (hits_at_k > 0).astype(float)

        results: Dict[str, Any] = {
            'avg_precision_at_k': float(np.mean(precision)) if num_users else 0.0,
            'avg_recall_at_k': float(np.mean(recall)) if num_users else 0.0,
            'avg_f1_at_k': float(np.mean(f1)) if num_users else 0.0,
            'avg_hit_rate_at_k': float(np.mean(hit_rate)) if num_users else 0.0,
            'avg_ndcg_at_k': float(np.mean(ndcg)) if num_users else 0.0,
            'avg_mrr': float(np.mean(mrr)) if num_users else 0.0,
            'num_users_evaluated': num_users,
            'evaluation_method': (
                'full_catalog' if self.full_catalog
                else 'negative_sampling' if self.use_sampling
                else 'full_evaluation'),
            'predictions': all_predictions,
        }

        # ---- novelty / diversity / personalization pass (:637-714)
        print("\nCalculating Novelty and Diversity Metrics...")
        ds = getattr(self.recommender, 'dataset', None)
        inter = getattr(ds, 'interactions', None) if ds is not None else None
        if inter is None or inter.empty:
            self.logger.warning(
                "Recommender's dataset does not have 'interactions' or it's "
                "empty. Skipping novelty metrics.")
            return results

        inter = inter.copy()
        inter['user_id'] = inter['user_id'].astype(str)
        inter['item_id'] = inter['item_id'].astype(str)
        item_popularity = inter['item_id'].value_counts().to_dict()
        history = inter[['user_id', 'item_id']].values.tolist()

        recommended_ids = {i for recs in all_predictions.values()
                           for i, _ in recs}
        item_embeddings = (self._item_input_embeddings(recommended_ids)
                           if recommended_ids else None)
        calc = NoveltyMetrics(item_popularity=item_popularity,
                              user_history=history,
                              item_embeddings=item_embeddings)

        per_user = {}
        for user_id, recs in all_predictions.items():
            per_user[user_id] = calc.calculate_metrics(
                recommendations=[i for i, _ in recs], user_id=user_id)

        def collect(key, drop_nan=False):
            vals = [m[key] for m in per_user.values() if key in m]
            if drop_nan:
                vals = [v for v in vals if not np.isnan(v)]
            return float(np.mean(vals)) if vals else 0.0

        results['avg_self_information'] = collect('avg_self_information')
        results['avg_iif'] = collect('avg_iif')
        results['avg_catalog_coverage'] = collect('catalog_coverage')
        results['avg_personalization'] = self._calculate_personalization(
            [[i for i, _ in recs] for recs in all_predictions.values()])
        results['avg_intra_list_similarity'] = collect(
            'intra_list_similarity', drop_nan=True)
        results['avg_personalized_novelty'] = collect('personalized_novelty')
        return results

    def _calculate_ndcg(self, recommended_items: List[str],
                        relevant_items: set, k: int) -> float:
        """Retrieval NDCG with IDCG over min(|relevant|, k)
        (reference tasks.py:718-747 — note this differs from metrics.py)."""
        if not relevant_items:
            return 0.0
        dcg = sum(1.0 / np.log2(i + 1)
                  for i, item in enumerate(recommended_items[:k], 1)
                  if item in relevant_items)
        num_rel = min(len(relevant_items), k)
        idcg = sum(1.0 / np.log2(i + 2) for i in range(num_rel))
        return dcg / idcg if idcg > 0 else 0.0


class TopKRankingEvaluator(BaseEvaluator):
    """Ranks each user's test items by model score (reference :750-932)."""

    def __init__(self, recommender, test_data: pd.DataFrame, config, **kwargs):
        super().__init__(recommender, test_data, config, "Top-K Ranking",
                         **kwargs)

    def evaluate(self) -> Dict[str, Any]:
        print(f"Evaluating Top-K Ranking (K={self.top_k})")
        metrics = {'avg_rank': [], 'median_rank': [], 'mrr': [],
                   'hit_rate_at_k': [], 'ndcg_at_k': []}
        all_predictions: Dict[str, List[Tuple[str, float]]] = {}
        user_groups = self.test_data.groupby('user_id')

        batched = self._batched_scores(user_groups)

        for user_id, inter in user_groups:
            user_id = str(user_id)
            test_items = [str(i) for i in inter['item_id'].tolist()]
            try:
                if batched is not None and user_id in batched:
                    item_scores = batched[user_id]
                else:
                    item_scores = []
                    for item_id in test_items:
                        try:
                            s = self.recommender.get_item_score(user_id,
                                                                str(item_id))
                        except Exception as e:
                            print(f"Error getting score for user {user_id}, "
                                  f"item {item_id}: {e}")
                            s = 0.0
                        item_scores.append((str(item_id), s))
                if not item_scores:
                    for v in metrics.values():
                        v.append(0.0)
                    continue
                all_predictions[user_id] = list(item_scores)
                item_scores = sorted(item_scores, key=lambda x: x[1],
                                     reverse=True)
                ranked_items = [i for i, _ in item_scores]
                ranks = list(range(1, len(item_scores) + 1))
                metrics['avg_rank'].append(float(np.mean(ranks)))
                metrics['median_rank'].append(float(np.median(ranks)))
                metrics['mrr'].append(1.0 / ranks[0] if ranks else 0.0)
                hits = sum(1 for r in ranks if r <= self.top_k)
                metrics['hit_rate_at_k'].append(
                    hits / len(test_items) if test_items else 0.0)
                metrics['ndcg_at_k'].append(self._calculate_ndcg(
                    ranked_items, set(test_items), self.top_k))
            except Exception as e:
                print(f"Error evaluating ranking for user {user_id}: {e}")
                metrics['avg_rank'].append(float('inf'))
                metrics['median_rank'].append(float('inf'))
                metrics['mrr'].append(0.0)
                metrics['hit_rate_at_k'].append(0.0)
                metrics['ndcg_at_k'].append(0.0)

        results: Dict[str, Any] = {}
        for name, values in metrics.items():
            if values:
                if name in ('avg_rank', 'median_rank'):
                    finite = [v for v in values if np.isfinite(v)]
                    if finite:
                        results[f'avg_{name}'] = float(np.mean(finite))
                        results[f'std_{name}'] = float(np.std(finite))
                    else:
                        results[f'avg_{name}'] = float('inf')
                        results[f'std_{name}'] = 0.0
                else:
                    results[f'avg_{name}'] = float(np.mean(values))
                    results[f'std_{name}'] = float(np.std(values))
            else:
                results[f'avg_{name}'] = 0.0
                results[f'std_{name}'] = 0.0
        results['num_users_evaluated'] = len(user_groups)
        results['predictions'] = all_predictions
        return results

    def _batched_scores(self, user_groups
                        ) -> Optional[Dict[str, List[Tuple[str, float]]]]:
        """Score every user's test items in one compiled pass when the
        recommender supports it."""
        if not hasattr(self.recommender, 'score_candidates_batch'):
            return None
        try:
            ds = self.recommender.dataset
            known_users = set(map(str, ds.user_encoder.classes_))
            known_items = set(map(str, ds.item_encoder.classes_))
            users, item_lists = [], []
            for user_id, inter in user_groups:
                user_id = str(user_id)
                if user_id not in known_users:
                    continue
                items = [str(i) for i in inter['item_id'].tolist()]
                users.append(user_id)
                item_lists.append(items)
            if not users:
                return {}
            c_max = max(len(it) for it in item_lists)
            uidx = ds.user_encoder.transform(users).astype(np.int32)
            cand = np.zeros((len(users), c_max), dtype=np.int32)
            mask = np.zeros((len(users), c_max), dtype=bool)
            for r, items in enumerate(item_lists):
                valid_flags = [i in known_items for i in items]
                enc = ds.item_encoder.transform(
                    [i for i, ok in zip(items, valid_flags) if ok])
                # Keep positions aligned with the original item order; unknown
                # items score 0.0 like the reference's failure path.
                j = 0
                for c, (item, ok) in enumerate(zip(items, valid_flags)):
                    if ok:
                        cand[r, c] = enc[j]
                        mask[r, c] = True
                        j += 1
            scores = self.recommender.score_candidates_batch(uidx, cand, mask)
            out = {}
            for r, (u, items) in enumerate(zip(users, item_lists)):
                out[u] = [(item,
                           float(scores[r, c]) if mask[r, c] else 0.0)
                          for c, item in enumerate(items)]
            return out
        except Exception as e:
            self.logger.warning(f"Batched ranking scoring failed ({e}); "
                                "falling back to per-pair path.")
            return None

    def _calculate_ndcg(self, ranked_items: List[str], relevant_items: set,
                        k: int) -> float:
        """Same IDCG-over-min(|relevant|,k) form as retrieval (reference
        tasks.py:903-932)."""
        if not relevant_items:
            return 0.0
        dcg = sum(1.0 / np.log2(i + 1)
                  for i, item in enumerate(ranked_items[:k], 1)
                  if item in relevant_items)
        num_rel = min(len(relevant_items), k)
        idcg = sum(1.0 / np.log2(i + 2) for i in range(num_rel))
        return dcg / idcg if idcg > 0 else 0.0


def create_evaluator(task: EvaluationTask, recommender,
                     test_data: pd.DataFrame, config, **kwargs
                     ) -> BaseEvaluator:
    """Factory (reference tasks.py:935-974)."""
    if task == EvaluationTask.TOP_K_RETRIEVAL:
        return TopKRetrievalEvaluator(recommender=recommender,
                                      test_data=test_data, config=config,
                                      **kwargs)
    if task == EvaluationTask.TOP_K_RANKING:
        return TopKRankingEvaluator(recommender=recommender,
                                    test_data=test_data, config=config,
                                    **kwargs)
    raise ValueError(f"Unknown evaluation task: {task}")


# String task names, with removed legacy tasks kept as explicit Nones
# (reference tasks.py:979-988).
TASK_MAPPING = {
    'retrieval': EvaluationTask.TOP_K_RETRIEVAL,
    'ranking': EvaluationTask.TOP_K_RANKING,
    'next_item': None,
    'cold_user': None,
    'cold_item': None,
    'beyond_accuracy': None,
    'session_based': None,
}


def get_task_from_string(task_name: str) -> EvaluationTask:
    """Resolve a CLI task string (reference tasks.py:991-1025)."""
    if task_name in TASK_MAPPING:
        task = TASK_MAPPING[task_name]
        if task is None:
            raise ValueError(
                f"Task '{task_name}' has been removed in the simplified "
                f"evaluation framework. Available tasks: "
                f"{list(EvaluationTask.__members__.keys())}")
        return task
    try:
        return EvaluationTask(task_name)
    except ValueError:
        raise ValueError(
            f"Unknown task '{task_name}'. Available tasks: "
            f"{list(EvaluationTask.__members__.keys())}")
