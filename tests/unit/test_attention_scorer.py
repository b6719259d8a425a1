"""Tests for the fused attention-fusion scoring path (ops/attention_scorer).

The factorized attention math (per-item Q/K/folded-V tables + pairwise
kernel) must reproduce the flax score_from_towers path exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelrec_multimodal_tpu.models.multimodal import MultimodalRecommender
from pixelrec_multimodal_tpu.ops.attention_scorer import (
    build_attention_head,
    compute_item_side_attention,
    compute_user_side_attention,
    pallas_attention_scores,
    xla_attention_scores,
)

N_USERS, N_ITEMS, N_TAGS = 8, 20, 3


def make_model(use_batch_norm=True, final_activation='sigmoid', heads=2,
               emb=8):
    return MultimodalRecommender(
        n_users=N_USERS, n_items=N_ITEMS, n_tags=N_TAGS,
        num_numerical_features=2, embedding_dim=emb,
        vision_feature_dim=6, language_feature_dim=5,
        use_contrastive=False, fusion_hidden_dims=(32, 16),
        fusion_type='attention', num_attention_heads=heads,
        use_batch_norm=use_batch_norm, dropout_rate=0.2,
        final_activation=final_activation)


def init_variables(model, train_batches=3):
    rng = np.random.default_rng(0)
    B = 16
    kw = dict(
        vision_features=jnp.asarray(rng.standard_normal((B, 6)), jnp.float32),
        language_features=jnp.asarray(rng.standard_normal((B, 5)),
                                      jnp.float32),
        numerical_features=jnp.asarray(rng.standard_normal((B, 2)),
                                       jnp.float32))
    idx = jnp.asarray(rng.integers(0, 8, B), jnp.int32)
    variables = model.init({'params': jax.random.PRNGKey(0)}, idx, idx,
                           idx % N_TAGS, train=False, **kw)
    if 'batch_stats' in variables:
        state = dict(variables)
        for _ in range(train_batches):
            _, mutated = model.apply(
                state, idx, idx, idx % N_TAGS, train=True,
                rngs={'dropout': jax.random.PRNGKey(1)},
                mutable=['batch_stats'], **kw)
            state['batch_stats'] = mutated['batch_stats']
        variables = state
    return variables


def sides(model, variables, B=4, C=12, seed=1):
    rng = np.random.default_rng(seed)
    item_idx = jnp.arange(C, dtype=jnp.int32) % N_ITEMS
    tag_idx = item_idx % N_TAGS
    kw = dict(
        vision_features=jnp.asarray(rng.standard_normal((C, 6)), jnp.float32),
        language_features=jnp.asarray(rng.standard_normal((C, 5)),
                                      jnp.float32),
        numerical_features=jnp.asarray(rng.standard_normal((C, 2)),
                                       jnp.float32))
    item_feats = model.apply(variables, item_idx, tag_idx,
                             method='item_tower', **kw)
    # Wrap into the embedding-table range: out-of-range ids produce NaN
    # rows that would make every comparison a NaN==NaN freebie.
    user_idx = jnp.arange(B, dtype=jnp.int32) % N_USERS
    user_emb = model.apply(variables, user_idx, method='user_tower')
    ue = jnp.repeat(user_emb, C, axis=0)
    it = jnp.tile(item_feats, (B, 1, 1))
    generic = model.apply(variables, ue, it,
                          method='score_from_towers').reshape(B, C)
    return item_feats, user_emb, generic


class TestAttentionHead:
    @pytest.mark.parametrize('use_bn', [True, False])
    @pytest.mark.parametrize('final', ['sigmoid', 'none'])
    @pytest.mark.parametrize('heads', [1, 2])
    def test_xla_matches_generic(self, use_bn, final, heads):
        model = make_model(use_batch_norm=use_bn, final_activation=final,
                           heads=heads)
        variables = init_variables(model)
        head = build_attention_head(variables, model)
        assert head is not None and head['fusion'] == 'attention'

        item_feats, user_emb, generic = sides(model, variables)
        item_side = compute_item_side_attention(head, item_feats)
        user_side = compute_user_side_attention(head, user_emb)
        fast = xla_attention_scores(head, user_side, item_side)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(generic),
                                   rtol=2e-4, atol=2e-5)

    def test_with_gram_false_skips_gram_tables(self):
        """with_gram=False returns the 7-tuple (no it_sc) — the scorer
        skips the ~n_sc floats/item HBM cost under the stream variant."""
        model = make_model()
        variables = init_variables(model)
        head = build_attention_head(variables, model)
        item_feats, user_emb, _ = sides(model, variables)
        short = compute_item_side_attention(head, item_feats,
                                            with_gram=False)
        full = compute_item_side_attention(head, item_feats, with_gram=True)
        assert len(short) == 7 and len(full) == 8
        for a, b in zip(short, full[:7]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_scorer_variant_resolution(self):
        """Off-TPU the scorer defaults to 'stream' (no gram tables);
        an explicit 'gram' builds the 8-tuple."""
        from pixelrec_multimodal_tpu.data.feature_store import (
            ItemFeatureStore,
        )
        from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer

        model = make_model()
        variables = init_variables(model)
        rng = np.random.default_rng(4)
        store = ItemFeatureStore(N_ITEMS, np.arange(N_ITEMS).astype(str))
        store.tables['tag_idx'] = (np.arange(N_ITEMS) % N_TAGS).astype(
            np.int32)
        store.tables['numerical'] = rng.standard_normal(
            (N_ITEMS, 2)).astype(np.float32)
        store.tables['vision_emb'] = rng.standard_normal(
            (N_ITEMS, 6)).astype(np.float32)
        store.tables['language_emb'] = rng.standard_normal(
            (N_ITEMS, 5)).astype(np.float32)
        auto = CatalogScorer(model, variables, store, item_chunk=128,
                             user_chunk=8)
        assert auto.attention_variant == 'stream'  # CPU backend
        assert len(auto._item_fast) == 7
        gram = CatalogScorer(model, variables, store, item_chunk=128,
                             user_chunk=8, attention_variant='gram')
        assert len(gram._item_fast) == 8

    def test_non_attention_returns_none(self):
        model = MultimodalRecommender(
            n_users=4, n_items=8, n_tags=2, num_numerical_features=0,
            embedding_dim=8, fusion_hidden_dims=(16,),
            fusion_type='concatenate', use_contrastive=False)
        variables = model.init({'params': jax.random.PRNGKey(0)},
                               jnp.zeros(2, jnp.int32),
                               jnp.zeros(2, jnp.int32),
                               jnp.zeros(2, jnp.int32), train=False)
        assert build_attention_head(variables, model) is None


class TestAttentionKernel:
    @pytest.mark.parametrize('heads', [1, 2])
    def test_interpret_matches_xla(self, heads):
        model = make_model(heads=heads)
        variables = init_variables(model)
        head = build_attention_head(variables, model)
        item_feats, user_emb, _ = sides(model, variables, B=16, C=128)
        item_side = compute_item_side_attention(head, item_feats)
        user_side = compute_user_side_attention(head, user_emb)
        ref = xla_attention_scores(head, user_side, item_side)
        out = pallas_attention_scores(
            head, user_side, item_side, tile_users=16, tile_items=128,
            compute_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize('heads', [1, 2])
    def test_gram_variant_matches_xla(self, heads):
        """Gram-factorized LayerNorm variant: identical math via
        precomputed Gram tables (E[y^2]-mu^2 variance), so the tolerance
        is looser than the stream kernel's."""
        model = make_model(heads=heads)
        variables = init_variables(model)
        head = build_attention_head(variables, model)
        item_feats, user_emb, _ = sides(model, variables, B=16, C=128)
        item_side = compute_item_side_attention(head, item_feats)
        user_side = compute_user_side_attention(head, user_emb)
        ref = xla_attention_scores(head, user_side, item_side)
        assert not np.isnan(np.asarray(ref)).any()
        out = pallas_attention_scores(
            head, user_side, item_side, tile_users=16, tile_items=128,
            compute_dtype=jnp.float32, interpret=True, variant='gram')
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_gram_multi_tile_grid(self):
        model = make_model(use_batch_norm=False)
        variables = init_variables(model)
        head = build_attention_head(variables, model)
        item_feats, user_emb, _ = sides(model, variables, B=32, C=256, seed=7)
        item_side = compute_item_side_attention(head, item_feats)
        user_side = compute_user_side_attention(head, user_emb)
        ref = xla_attention_scores(head, user_side, item_side)
        out = pallas_attention_scores(
            head, user_side, item_side, tile_users=16, tile_items=128,
            compute_dtype=jnp.float32, interpret=True, variant='gram')
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_multi_tile_grid(self):
        model = make_model(use_batch_norm=False)
        variables = init_variables(model)
        head = build_attention_head(variables, model)
        item_feats, user_emb, _ = sides(model, variables, B=32, C=256, seed=7)
        item_side = compute_item_side_attention(head, item_feats)
        user_side = compute_user_side_attention(head, user_emb)
        ref = xla_attention_scores(head, user_side, item_side)
        out = pallas_attention_scores(
            head, user_side, item_side, tile_users=16, tile_items=128,
            compute_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


class TestScorerIntegration:
    def test_topk_fast_matches_generic(self):
        from pixelrec_multimodal_tpu.data.feature_store import ItemFeatureStore
        from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer

        model = make_model()
        variables = init_variables(model)
        rng = np.random.default_rng(4)
        store = ItemFeatureStore(N_ITEMS, np.arange(N_ITEMS).astype(str))
        store.tables['tag_idx'] = (np.arange(N_ITEMS) % N_TAGS).astype(np.int32)
        store.tables['numerical'] = rng.standard_normal(
            (N_ITEMS, 2)).astype(np.float32)
        store.tables['vision_emb'] = rng.standard_normal(
            (N_ITEMS, 6)).astype(np.float32)
        store.tables['language_emb'] = rng.standard_normal(
            (N_ITEMS, 5)).astype(np.float32)

        fast = CatalogScorer(model, variables, store, item_chunk=128,
                             user_chunk=8, fast_path=True)
        slow = CatalogScorer(model, variables, store, item_chunk=128,
                             user_chunk=8, fast_path=False)
        assert fast._head is not None

        users = np.arange(4, dtype=np.int32)
        seen = np.zeros((4, N_ITEMS), bool)
        seen[0, :3] = True
        vf, idf = fast.top_k(users, 5, seen_mask=seen)
        vs, ids = slow.top_k(users, 5, seen_mask=seen)
        np.testing.assert_array_equal(idf, ids)
        np.testing.assert_allclose(vf, vs, rtol=2e-4, atol=2e-5)
