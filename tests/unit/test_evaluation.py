"""Unit tests for metrics, novelty, advanced metrics, and the evaluators.

Mirrors the reference strategy: evaluators are tested against a FAKE
recommender whose scores are a deterministic function of item id
(tests/unit/src/inference/test_recommender.py pattern in the reference).
"""
import numpy as np
import pandas as pd
import pytest

from pixelrec_multimodal_tpu.config import Config
from pixelrec_multimodal_tpu.evaluation.advanced_metrics import (
    AdvancedMetrics,
    FairnessMetrics,
)
from pixelrec_multimodal_tpu.evaluation.metrics import (
    calculate_map,
    calculate_ndcg,
    calculate_precision_at_k,
    calculate_recall_at_k,
    mrr_batch,
    ndcg_at_k_batch,
)
from pixelrec_multimodal_tpu.evaluation.novelty import (
    DiversityCalculator,
    NoveltyMetrics,
)
from pixelrec_multimodal_tpu.evaluation.tasks import (
    EvaluationTask,
    TopKRankingEvaluator,
    TopKRetrievalEvaluator,
    create_evaluator,
    get_task_from_string,
    stable_user_seed,
)


class TestMetricFunctions:
    def test_precision(self):
        assert calculate_precision_at_k(['a', 'b', 'c'], {'a', 'c'}, 3) == \
            pytest.approx(2 / 3)
        assert calculate_precision_at_k([], {'a'}, 5) == 0.0
        assert calculate_precision_at_k(['a'], {'a'}, 0) == 0.0

    def test_recall(self):
        assert calculate_recall_at_k(['a', 'b'], {'a', 'c', 'd'}, 2) == \
            pytest.approx(1 / 3)
        assert calculate_recall_at_k(['a'], set(), 1) == 0.0

    def test_ndcg_perfect_and_zero(self):
        assert calculate_ndcg(['a', 'b'], {'a', 'b'}, 2) == pytest.approx(1.0)
        assert calculate_ndcg(['x', 'y'], {'a'}, 2) == 0.0
        # Hit at position 2 only: dcg = 1/log2(3); idcg = 1 (one hit sorted first)
        val = calculate_ndcg(['x', 'a'], {'a'}, 2)
        assert val == pytest.approx((1 / np.log2(3)) / 1.0)

    def test_map(self):
        # hits at ranks 1 and 3 of 2 relevant: (1/1 + 2/3)/2
        assert calculate_map(['a', 'x', 'b'], {'a', 'b'}) == \
            pytest.approx((1.0 + 2 / 3) / 2)
        assert calculate_map(['x'], set()) == 0.0

    def test_batch_variants_match_scalar(self):
        hits = np.array([[True, False, True], [False, False, False]])
        ndcgs = ndcg_at_k_batch(hits, 3)
        scalar0 = calculate_ndcg(['a', 'x', 'b'], {'a', 'b'}, 3)
        assert ndcgs[0] == pytest.approx(scalar0)
        assert ndcgs[1] == 0.0
        assert list(mrr_batch(hits)) == [1.0, 0.0]


class TestNovelty:
    @pytest.fixture
    def calc(self):
        pop = {'a': 10, 'b': 5, 'c': 1}
        hist = [('u1', 'a'), ('u1', 'b'), ('u2', 'a'), ('u2', 'c')]
        embs = {'a': np.array([1.0, 0.0]), 'b': np.array([1.0, 0.0]),
                'c': np.array([0.0, 1.0])}
        return NoveltyMetrics(pop, hist, embs)

    def test_self_information(self, calc):
        # p(a) = 10/16
        expected = -np.log2(10 / 16)
        assert calc.calculate_self_information(['a']) == pytest.approx(expected)
        assert calc.calculate_self_information(['unknown']) == 0.0

    def test_iif(self, calc):
        # 2 users, a seen by 2 users -> log(2/2) = 0
        assert calc.calculate_iif(['a']) == pytest.approx(0.0, abs=1e-6)
        assert calc.calculate_iif(['b']) == pytest.approx(np.log(2), abs=1e-6)

    def test_coverage_and_longtail(self, calc):
        assert calc.calculate_coverage(['a', 'b']) == pytest.approx(2 / 3)
        # ranks: a=0, b=1, c=2; threshold = int(3*0.2)=0 -> everything tail
        assert calc.calculate_long_tail_percentage(['a', 'c']) == 1.0

    def test_intra_list_similarity(self, calc):
        # a,b identical (sim 1); a,c orthogonal (sim 0)
        assert calc.calculate_diversity(['a', 'b']) == pytest.approx(1.0)
        assert calc.calculate_diversity(['a', 'c']) == pytest.approx(0.0)
        assert calc.calculate_diversity(['a']) == 0.0

    def test_personalized_novelty(self, calc):
        assert calc.calculate_personalized_novelty(['a', 'c'], 'u1') == 0.5
        assert calc.calculate_personalized_novelty(['b'], 'u2') == 1.0

    def test_full_metrics_dict(self, calc):
        m = calc.calculate_metrics(['a', 'b'], user_id='u1')
        assert {'avg_self_information', 'avg_iif', 'catalog_coverage',
                'avg_popularity_rank', 'long_tail_percentage',
                'intra_list_similarity', 'personalized_novelty'} <= set(m)
        assert calc.calculate_metrics([]) == {}

    def test_diversity_calculator(self):
        embs = {'a': np.array([1.0, 0.0]), 'b': np.array([0.0, 1.0])}
        d = DiversityCalculator(embs)
        assert d.calculate_pairwise_diversity(['a', 'b']) == pytest.approx(1.0)
        assert d.calculate_pairwise_diversity(['a', 'b'], 'euclidean') == \
            pytest.approx(np.sqrt(2))
        assert d.calculate_coverage_diversity(
            {'u1': ['a', 'b'], 'u2': ['a']}) == pytest.approx(2 / 3)


class TestAdvancedMetrics:
    def test_mrr_hit_rate(self):
        recs = [['a', 'b'], ['x', 'y']]
        rel = [{'b'}, {'z'}]
        assert AdvancedMetrics.calculate_mrr(recs, rel) == pytest.approx(0.25)
        assert AdvancedMetrics.calculate_hit_rate(recs, rel) == 0.5

    def test_gini(self):
        equal = AdvancedMetrics.calculate_gini_coefficient(
            {'a': 5, 'b': 5, 'c': 5})
        assert equal == pytest.approx(0.0, abs=1e-9)
        unequal = AdvancedMetrics.calculate_gini_coefficient(
            {'a': 0, 'b': 0, 'c': 30})
        assert unequal > 0.6

    def test_serendipity(self):
        s = AdvancedMetrics.calculate_serendipity(
            [['a', 'b']], [{'a'}], [{'a', 'b'}])
        assert s == pytest.approx(0.5)  # b is relevant and unexpected

    def test_fairness(self):
        parity = FairnessMetrics.calculate_demographic_parity(
            {'u1': ['a', 'b'], 'u2': ['a', 'a']},
            {'u1': {'gender': 'x'}, 'u2': {'gender': 'y'}})
        assert parity['x'] == 1.0
        assert parity['y'] == 0.5
        pf = FairnessMetrics.calculate_provider_fairness(
            [['a', 'b'], ['a']], {'a': 'p1', 'b': 'p2'})
        assert pf['provider_exposure']['p1'] == pytest.approx(2 / 3)


class FakeRecommender:
    """Deterministic fake backend: score(item) = item number / 100."""

    class _Enc:
        def __init__(self, classes):
            import numpy as np
            self.classes_ = np.asarray(classes)

        def transform(self, xs):
            lookup = {c: i for i, c in enumerate(self.classes_)}
            return np.asarray([lookup[x] for x in xs])

    class _DS:
        pass

    def __init__(self, items, interactions_df):
        self.dataset = self._DS()
        self.dataset.item_encoder = self._Enc(items)
        self.dataset.user_encoder = self._Enc(
            sorted(interactions_df['user_id'].unique()))
        self.dataset.interactions = interactions_df

    @staticmethod
    def _score(item_id):
        return int(str(item_id)[1:]) / 100.0

    def get_recommendations(self, user_id, top_k=10, filter_seen=True,
                            candidates=None):
        items = candidates if candidates is not None else \
            list(self.dataset.item_encoder.classes_)
        scored = [(str(i), self._score(i)) for i in items]
        scored.sort(key=lambda x: x[1], reverse=True)
        return scored[:top_k]

    def get_item_score(self, user_id, item_id):
        return self._score(item_id)


@pytest.fixture
def eval_setup():
    items = [f'i{j}' for j in range(40)]
    inter = pd.DataFrame({
        'user_id': ['u1'] * 3 + ['u2'] * 3,
        'item_id': ['i1', 'i2', 'i3', 'i4', 'i5', 'i6'],
    })
    test = pd.DataFrame({
        'user_id': ['u1', 'u2'],
        'item_id': ['i39', 'i0'],  # u1's positive is the highest-scoring item
    })
    cfg = Config()
    cfg.recommendation.top_k = 5
    rec = FakeRecommender(items, inter)
    return rec, test, cfg


class TestRetrievalEvaluator:
    def test_evaluate_with_sampling(self, eval_setup):
        rec, test, cfg = eval_setup
        ev = TopKRetrievalEvaluator(rec, test, cfg, use_sampling=True,
                                    num_negatives=10)
        res = ev.evaluate()
        # u1's positive i39 always scores highest -> hit at rank 1.
        assert res['avg_hit_rate_at_k'] >= 0.5
        assert res['num_users_evaluated'] == 2
        assert res['evaluation_method'] == 'negative_sampling'
        assert 'avg_personalization' in res
        assert 'predictions' in res and 'u1' in res['predictions']

    def test_deterministic_negatives(self, eval_setup):
        rec, test, cfg = eval_setup
        ev = TopKRetrievalEvaluator(rec, test, cfg, num_negatives=10)
        a = ev._sample_negatives('u1', ['i1'])
        b = ev._sample_negatives('u1', ['i1'])
        assert a == b
        assert 'i1' not in a
        assert len(a) == 10

    def test_positive_always_in_candidates(self, eval_setup):
        rec, test, cfg = eval_setup
        ev = TopKRetrievalEvaluator(rec, test, cfg, num_negatives=5)
        cands = ev._candidate_set('u1', ['i7'])
        assert 'i7' in cands
        assert len(set(cands)) == len(cands)

    def test_full_evaluation_mode(self, eval_setup):
        rec, test, cfg = eval_setup
        ev = TopKRetrievalEvaluator(rec, test, cfg, use_sampling=False)
        res = ev.evaluate()
        assert res['evaluation_method'] == 'full_evaluation'

    def test_full_catalog_mode(self, eval_setup):
        rec, test, cfg = eval_setup
        ev = TopKRetrievalEvaluator(rec, test, cfg, full_catalog=True)
        res = ev.evaluate()
        assert res['evaluation_method'] == 'full_catalog'
        # Full catalog ranked by score = item number: u1's positive i39 is
        # the global argmax (hit at rank 1), u2's positive i0 the argmin
        # (outside top-5) -> hit rate 0.5, MRR (1.0 + 0.0)/2.
        assert res['avg_hit_rate_at_k'] == 0.5
        assert res['avg_mrr'] == 0.5
        assert res['predictions']['u1'][0][0] == 'i39'
        assert len(res['predictions']['u1']) == cfg.recommendation.top_k

    def test_full_catalog_batched_matches_per_user(self, eval_setup):
        rec, test, cfg = eval_setup
        per_user = TopKRetrievalEvaluator(
            rec, test, cfg, full_catalog=True).evaluate()

        class BatchedFake(type(rec)):
            def get_recommendations_batch(self, user_ids, top_k=10,
                                          filter_seen=True):
                return {u: self.get_recommendations(
                    u, top_k=top_k, filter_seen=filter_seen)
                    for u in user_ids}

        brec = BatchedFake(list(rec.dataset.item_encoder.classes_),
                           rec.dataset.interactions)
        batched = TopKRetrievalEvaluator(
            brec, test, cfg, full_catalog=True).evaluate()
        for key in ('avg_hit_rate_at_k', 'avg_mrr', 'avg_ndcg_at_k'):
            assert batched[key] == per_user[key]
        assert batched['predictions'] == per_user['predictions']

    def test_stable_seed(self):
        assert stable_user_seed('u1') == stable_user_seed('u1')
        assert stable_user_seed('u1') != stable_user_seed('u2')
        assert 0 <= stable_user_seed('u1') < 2 ** 31


class TestRankingEvaluator:
    def test_evaluate(self, eval_setup):
        rec, test, cfg = eval_setup
        test_multi = pd.DataFrame({
            'user_id': ['u1', 'u1', 'u2'],
            'item_id': ['i10', 'i20', 'i5'],
        })
        ev = TopKRankingEvaluator(rec, test_multi, cfg)
        res = ev.evaluate()
        assert res['num_users_evaluated'] == 2
        assert res['avg_mrr'] == 1.0  # reference quirk: first rank is always 1
        assert res['avg_ndcg_at_k'] == pytest.approx(1.0)
        assert set(res['predictions']) == {'u1', 'u2'}


class TestFactory:
    def test_create_and_mapping(self, eval_setup):
        rec, test, cfg = eval_setup
        ev = create_evaluator(EvaluationTask.TOP_K_RETRIEVAL, rec, test, cfg)
        assert isinstance(ev, TopKRetrievalEvaluator)
        assert get_task_from_string('retrieval') == EvaluationTask.TOP_K_RETRIEVAL
        assert get_task_from_string('ranking') == EvaluationTask.TOP_K_RANKING
        with pytest.raises(ValueError, match='removed'):
            get_task_from_string('next_item')
        with pytest.raises(ValueError):
            get_task_from_string('bogus')


class TestVectorizedSamplingEquivalence:
    """The virtual-index negative sampler must be bit-identical to the
    reference algorithm (per-user candidate-list rebuild + counts.get
    weights, reference tasks.py:181-308), which it replaced for speed."""

    @staticmethod
    def _reference_sample(ev, user_id, positive_items):
        import random as _random
        all_items = ev._get_all_item_ids()
        pos = {str(i) for i in positive_items}
        candidates = [i for i in all_items if i not in pos]
        if len(candidates) < ev.num_negatives:
            return candidates
        if not candidates:
            return []
        seed = stable_user_seed(user_id)
        n = min(ev.num_negatives, len(candidates))
        if ev.sampling_strategy == 'random':
            return _random.Random(seed).sample(candidates, n)
        counts = ev.test_data['item_id'].value_counts()
        raw = np.asarray([float(counts.get(i, 1)) for i in candidates])
        if ev.sampling_strategy == 'popularity_inverse':
            raw = 1.0 / raw
        if raw.sum() == 0:
            raw = np.ones_like(raw)
        p = raw / raw.sum()
        rng = np.random.RandomState(seed)
        try:
            picked = rng.choice(len(candidates), size=n, replace=False, p=p)
            return [candidates[i] for i in picked]
        except ValueError:
            return _random.Random(seed).sample(candidates, n)

    @pytest.mark.parametrize('strategy', ['random', 'popularity',
                                          'popularity_inverse'])
    def test_bit_identical_to_reference_algorithm(self, eval_setup, strategy):
        rec, test, cfg = eval_setup
        ev = TopKRetrievalEvaluator(rec, test, cfg, num_negatives=12,
                                    sampling_strategy=strategy)
        rng = np.random.default_rng(3)
        catalog = ev._get_all_item_ids()
        for u in range(25):
            n_pos = int(rng.integers(0, 8))
            pos = list(rng.choice(catalog, size=n_pos, replace=False))
            got = ev._sample_negatives(f'user{u}', pos)
            want = self._reference_sample(ev, f'user{u}', pos)
            assert got == want, (strategy, u, pos)

    def test_fewer_candidates_than_negatives(self, eval_setup):
        rec, test, cfg = eval_setup
        ev = TopKRetrievalEvaluator(rec, test, cfg, num_negatives=1000)
        catalog = ev._get_all_item_ids()
        got = ev._sample_negatives('u1', catalog[:5])
        assert got == self._reference_sample(ev, 'u1', catalog[:5])
        assert len(got) == len(catalog) - 5

    def test_positives_outside_catalog_ignored(self, eval_setup):
        rec, test, cfg = eval_setup
        ev = TopKRetrievalEvaluator(rec, test, cfg, num_negatives=10)
        got = ev._sample_negatives('u9', ['i3', 'not_in_catalog'])
        assert got == self._reference_sample(ev, 'u9',
                                             ['i3', 'not_in_catalog'])
