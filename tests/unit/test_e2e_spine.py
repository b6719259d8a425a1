"""End-to-end spine test: dataset -> training -> catalog scoring (ID-only).

Mirrors the reference's integration-test assertions (weights change, loss is
finite, recommendations are ordered) on synthetic data with no pretrained
encoders (BASELINE.json config #1).
"""
import numpy as np
import pandas as pd
import pytest

from pixelrec_multimodal_tpu.config import Config
from pixelrec_multimodal_tpu.data.dataset import MultimodalDataset
from pixelrec_multimodal_tpu.models import build_model
from pixelrec_multimodal_tpu.training import Trainer


def make_data(n_users=12, n_items=30, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        for it in rng.choice(n_items, size=6, replace=False):
            rows.append((f'u{u}', f'i{it}', int(rng.integers(0, 1000))))
    inter = pd.DataFrame(rows, columns=['user_id', 'item_id', 'timestamp'])
    items = pd.DataFrame({
        'item_id': [f'i{j}' for j in range(n_items)],
        'tag': [f'tag{j % 3}' for j in range(n_items)],
        'description': [f'item number {j}' for j in range(n_items)],
        'views': rng.random(n_items) * 100,
    })
    return inter, items


@pytest.fixture(scope='module')
def id_only_setup(tmp_path_factory):
    inter, items = make_data()
    cfg = Config()
    cfg.model.vision_model = None
    cfg.model.language_model = None
    cfg.model.embedding_dim = 16
    cfg.model.fusion_hidden_dims = [32, 16]
    cfg.model.use_contrastive = False
    cfg.training.batch_size = 32
    cfg.checkpoint_dir = str(tmp_path_factory.mktemp('ckpts'))

    ds = MultimodalDataset(
        inter, items, image_folder='/nonexistent',
        vision_model_name=None, language_model_name=None,
        create_negative_samples=True,
        numerical_feat_cols=['views'], categorical_feat_cols=['tag'],
        numerical_normalization_method='standardization')
    val = MultimodalDataset(
        inter.iloc[:20], items, image_folder='/nonexistent',
        vision_model_name=None, language_model_name=None,
        create_negative_samples=True,
        numerical_feat_cols=['views'], categorical_feat_cols=['tag'],
        numerical_normalization_method='standardization',
        user_encoder=ds.user_encoder, item_encoder=ds.item_encoder,
        tag_encoder=ds.tag_encoder,
        numerical_scaler=ds.numerical_processor.scaler)
    model = build_model(cfg.model, ds.n_users, ds.n_items, ds.n_tags,
                        num_numerical_features=1)
    return cfg, ds, val, model


class TestDataset:
    def test_negative_sampling_balance(self, id_only_setup):
        _, ds, _, _ = id_only_setup
        labels = ds.samples['label']
        n_pos = int(labels.sum())
        n_neg = len(labels) - n_pos
        assert n_pos == 12 * 6
        assert n_neg == n_pos  # ratio 1.0, catalog >> history

    def test_negatives_are_not_positives(self, id_only_setup):
        _, ds, _, _ = id_only_setup
        pos = set(zip(ds.interactions['user_idx'], ds.interactions['item_idx']))
        neg_mask = ds.samples['label'] == 0
        for u, i in zip(ds.samples['user_idx'][neg_mask],
                        ds.samples['item_idx'][neg_mask]):
            assert (u, i) not in pos

    def test_getitem_schema(self, id_only_setup):
        _, ds, _, _ = id_only_setup
        sample = ds[0]
        assert {'user_idx', 'item_idx', 'label', 'tag_idx',
                'numerical_features'} <= set(sample)
        assert sample['numerical_features'].shape == (1,)

    def test_batches_static_shape(self, id_only_setup):
        _, ds, _, _ = id_only_setup
        sizes = set()
        total_weight = 0.0
        for b in ds.batches(32, shuffle=False):
            sizes.add(b['user_idx'].shape[0])
            total_weight += b['weight'].sum()
        assert sizes == {32}
        assert total_weight == len(ds)

    def test_user_history(self, id_only_setup):
        _, ds, _, _ = id_only_setup
        hist = ds.get_user_history('u0')
        assert len(hist) == 6
        assert ds.get_user_history('nobody') == set()


class TestTraining:
    def test_train_updates_and_checkpoints(self, id_only_setup):
        cfg, ds, val, model = id_only_setup
        trainer = Trainer(model, config=cfg, checkpoint_dir=cfg.checkpoint_dir,
                          use_contrastive=False)
        train_losses, val_losses = trainer.train(
            ds, val, epochs=2, lr=0.01, batch_size=32, patience=5)
        assert len(train_losses) == 2
        assert all(np.isfinite(train_losses))
        # Loss went down or at least bookkeeping is consistent.
        assert trainer.training_history['train_losses'] == train_losses
        ckpt_dir = trainer.get_model_checkpoint_dir()
        assert (ckpt_dir / 'last_model' / 'state').exists()
        assert (ckpt_dir / 'best_model' / 'state').exists()

    def test_checkpoint_roundtrip(self, id_only_setup):
        cfg, ds, val, model = id_only_setup
        trainer = Trainer(model, config=cfg, checkpoint_dir=cfg.checkpoint_dir,
                          use_contrastive=False)
        trainer.train(ds, val, epochs=1, lr=0.01, batch_size=32)
        import jax
        params_before = jax.device_get(trainer.state.params)
        trainer.load_checkpoint('last_model')
        params_after = jax.device_get(trainer.state.params)
        import jax.tree_util as jtu
        for a, b in zip(jtu.tree_leaves(params_before),
                        jtu.tree_leaves(params_after)):
            np.testing.assert_allclose(a, b, rtol=1e-6)


class TestRecommender:
    @pytest.fixture(scope='class')
    def trained(self, id_only_setup):
        cfg, ds, val, model = id_only_setup
        trainer = Trainer(model, config=cfg, checkpoint_dir=cfg.checkpoint_dir,
                          use_contrastive=False)
        trainer.train(ds, val, epochs=1, lr=0.01, batch_size=32)
        variables = {'params': trainer.state.params}
        if trainer.state.batch_stats is not None:
            variables['batch_stats'] = trainer.state.batch_stats
        from pixelrec_multimodal_tpu.inference import Recommender
        return Recommender(model, variables, ds, item_chunk=128, user_chunk=8)

    def test_topk_ordering_and_k(self, trained):
        recs = trained.get_recommendations('u0', top_k=5, filter_seen=False)
        assert len(recs) == 5
        scores = [s for _, s in recs]
        assert scores == sorted(scores, reverse=True)

    def test_filter_seen(self, trained):
        recs = trained.get_recommendations('u0', top_k=30, filter_seen=True)
        seen = trained.dataset.get_user_history('u0')
        assert not (set(r[0] for r in recs) & seen)
        assert len(recs) == 30 - len(seen)

    def test_unknown_user(self, trained):
        assert trained.get_recommendations('nobody', top_k=5) == []
        assert trained.get_item_score('nobody', 'i0') == 0.0
        assert trained.get_item_score('u0', 'nothing') == 0.0

    def test_candidates_subset(self, trained):
        cands = ['i0', 'i1', 'i2', 'bogus']
        recs = trained.get_recommendations('u1', top_k=10, filter_seen=False,
                                           candidates=cands)
        assert set(r[0] for r in recs) <= {'i0', 'i1', 'i2'}

    def test_item_score_matches_topk_path(self, trained):
        """Candidate scoring and streaming top-k agree on values."""
        recs = trained.get_recommendations('u2', top_k=3, filter_seen=False)
        for item_id, score in recs:
            s = trained.get_item_score('u2', item_id)
            np.testing.assert_allclose(s, score, rtol=1e-4, atol=1e-5)

    def test_diverse_recommendations_mmr(self, trained):
        plain = trained.get_recommendations('u0', top_k=5, filter_seen=False)
        diverse = trained.get_diverse_recommendations(
            'u0', top_k=5, diversity_weight=0.5, filter_seen=False)
        assert len(diverse) == 5
        # Scores are the model's relevance scores for those items.
        for item_id, score in diverse:
            np.testing.assert_allclose(
                trained.get_item_score('u0', item_id), score,
                rtol=1e-4, atol=1e-5)
        # Most relevant item always leads; no duplicates.
        assert diverse[0][0] == plain[0][0]
        assert len({i for i, _ in diverse}) == 5

    def test_diverse_weight_zero_is_plain_topk(self, trained):
        plain = trained.get_recommendations('u1', top_k=4, filter_seen=False)
        diverse = trained.get_diverse_recommendations(
            'u1', top_k=4, diversity_weight=0.0, filter_seen=False)
        assert [i for i, _ in diverse] == [i for i, _ in plain]

    def test_diverse_respects_filter_seen(self, trained):
        seen = trained.dataset.get_user_history('u2')
        diverse = trained.get_diverse_recommendations(
            'u2', top_k=10, diversity_weight=0.4, filter_seen=True)
        assert not ({i for i, _ in diverse} & seen)

    def test_diverse_batch_matches_single_user(self, trained):
        batch = trained.get_diverse_recommendations_batch(
            ['u0', 'u3', 'nobody'], top_k=4, diversity_weight=0.5,
            filter_seen=False)
        assert batch['nobody'] == []
        for u in ('u0', 'u3'):
            single = trained.get_diverse_recommendations(
                u, top_k=4, diversity_weight=0.5, filter_seen=False)
            assert batch[u] == single

    def test_diverse_rejects_bad_weight(self, trained):
        with pytest.raises(ValueError):
            trained.get_diverse_recommendations('u0', diversity_weight=1.5)
        # Weight validation precedes the unknown-user short-circuit.
        with pytest.raises(ValueError):
            trained.get_diverse_recommendations('nobody', diversity_weight=-1)
        assert trained.get_diverse_recommendations('nobody', top_k=3) == []

    def test_full_matrix_consistency(self, trained):
        """score_full agrees with the streaming top-k result."""
        uidx = trained.dataset.user_encoder.transform(['u3'])
        full = trained.scorer.score_full(uidx)[0]
        values, idx = trained.scorer.top_k(uidx, 5)
        np.testing.assert_allclose(np.sort(full)[::-1][:5], values[0],
                                   rtol=1e-4, atol=1e-5)
        assert set(idx[0]) == set(np.argsort(-full)[:5])


class TestEvaluatorIntegration:
    """Retrieval evaluator drives the real (batched) recommender path."""

    def test_retrieval_eval_batched(self, id_only_setup):
        cfg, ds, val, model = id_only_setup
        from pixelrec_multimodal_tpu.training import Trainer
        from pixelrec_multimodal_tpu.inference import Recommender
        from pixelrec_multimodal_tpu.evaluation.tasks import (
            TopKRetrievalEvaluator)
        import pandas as pd
        trainer = Trainer(model, config=cfg, checkpoint_dir=cfg.checkpoint_dir,
                          use_contrastive=False)
        trainer.train(ds, None, epochs=1, lr=0.01, batch_size=32)
        variables = {'params': trainer.state.params}
        if trainer.state.batch_stats is not None:
            variables['batch_stats'] = trainer.state.batch_stats
        rec = Recommender(model, variables, ds, item_chunk=128, user_chunk=8)
        test = pd.DataFrame({'user_id': ['u0', 'u1', 'u2'],
                             'item_id': ['i1', 'i2', 'i3']})
        cfg.recommendation.top_k = 5
        ev = TopKRetrievalEvaluator(rec, test, cfg, use_sampling=True,
                                    num_negatives=10)
        res = ev.evaluate()
        assert res['num_users_evaluated'] == 3
        assert 0.0 <= res['avg_ndcg_at_k'] <= 1.0
        assert 0.0 <= res['avg_hit_rate_at_k'] <= 1.0
        assert 'avg_personalization' in res
        # Batched scores equal the per-user candidate path.
        preds = res['predictions']['u0']
        for item_id, score in preds[:3]:
            assert abs(rec.get_item_score('u0', item_id) - score) < 1e-4
