"""Edge cases for the streaming/merging top-k primitives (ops/topk.py) and
the catalog scorer's boundary conditions."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelrec_multimodal_tpu.ops.topk import (
    NEG_INF,
    init_topk,
    merge_topk,
    topk_2d,
)


class TestTopKPrimitives:
    def test_topk_2d_matches_numpy(self):
        rng = np.random.default_rng(0)
        s = rng.standard_normal((5, 40)).astype(np.float32)
        v, i = topk_2d(jnp.asarray(s), 7)
        for row in range(5):
            expect = np.sort(s[row])[::-1][:7]
            np.testing.assert_allclose(np.asarray(v[row]), expect, rtol=1e-6)
            np.testing.assert_allclose(s[row][np.asarray(i[row])], expect,
                                       rtol=1e-6)

    def test_merge_equals_global_topk(self):
        """Merging chunked top-k's == top-k over the concatenation."""
        rng = np.random.default_rng(1)
        B, k = 4, 6
        chunks = [rng.standard_normal((B, 32)).astype(np.float32)
                  for _ in range(5)]
        carry = init_topk(B, k)
        for c, chunk in enumerate(chunks):
            idx = c * 32 + jnp.broadcast_to(jnp.arange(32, dtype=jnp.int32),
                                            (B, 32))
            carry = merge_topk(*carry, jnp.asarray(chunk), idx, k)
        values, indices = map(np.asarray, carry)
        full = np.concatenate(chunks, axis=1)
        for row in range(B):
            expect = np.sort(full[row])[::-1][:k]
            np.testing.assert_allclose(values[row], expect, rtol=1e-6)
            np.testing.assert_allclose(full[row][indices[row]], expect,
                                       rtol=1e-6)

    def test_k_larger_than_chunk(self):
        """k greater than a single chunk width still merges exactly."""
        rng = np.random.default_rng(2)
        B, k, width = 2, 10, 4
        chunks = [rng.standard_normal((B, width)).astype(np.float32)
                  for _ in range(6)]
        carry = init_topk(B, k)
        for c, chunk in enumerate(chunks):
            idx = c * width + jnp.broadcast_to(
                jnp.arange(width, dtype=jnp.int32), (B, width))
            carry = merge_topk(*carry, jnp.asarray(chunk), idx, k)
        values, _ = map(np.asarray, carry)
        full = np.concatenate(chunks, axis=1)
        np.testing.assert_allclose(
            values, np.sort(full, axis=1)[:, ::-1][:, :k], rtol=1e-6)

    def test_init_carry_is_all_invalid(self):
        v, i = init_topk(3, 4)
        assert np.all(np.asarray(v) == float(NEG_INF))
        assert np.all(np.asarray(i) == -1)

    def test_masked_entries_never_win(self):
        B, k = 2, 3
        scores = jnp.full((B, 8), 5.0).at[:, 0].set(9.0)
        scores = scores.at[:, 0].set(NEG_INF)  # masked best
        idx = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (B, 8))
        v, i = merge_topk(*init_topk(B, k), scores, idx, k)
        assert 0 not in set(np.asarray(i).ravel().tolist())


class TestScorerBoundaries:
    @pytest.fixture(scope='class')
    def scorer(self):
        from pixelrec_multimodal_tpu.data.feature_store import ItemFeatureStore
        from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer
        from pixelrec_multimodal_tpu.models.multimodal import (
            MultimodalRecommender)
        n_items = 37  # deliberately not a multiple of the 128 pad
        model = MultimodalRecommender(
            n_users=16, n_items=n_items, n_tags=3, num_numerical_features=0,
            embedding_dim=8, vision_feature_dim=None,
            language_feature_dim=None, use_contrastive=False,
            fusion_hidden_dims=(16,), fusion_type='concatenate',
            use_batch_norm=False, dropout_rate=0.0)
        idx = jnp.zeros((2,), jnp.int32)
        variables = model.init({'params': jax.random.PRNGKey(0)},
                               idx, idx, idx, train=False)
        store = ItemFeatureStore(n_items, np.arange(n_items).astype(str))
        store.tables['tag_idx'] = np.arange(n_items).astype(np.int32) % 3
        return CatalogScorer(model, variables, store, item_chunk=128,
                             user_chunk=4)

    def test_k_equals_catalog(self, scorer):
        """k == n_items returns every item exactly once, none padded."""
        v, i = scorer.top_k(np.asarray([0, 1]), scorer.n_items)
        for row in np.asarray(i):
            assert sorted(row.tolist()) == list(range(scorer.n_items))
        assert np.all(np.asarray(v) > float(NEG_INF) / 2)

    def test_padding_never_surfaces(self, scorer):
        """Indices past n_items (pad region) never appear in results."""
        v, i = scorer.top_k(np.asarray([2, 3, 4]), 10)
        assert np.asarray(i).max() < scorer.n_items

    def test_topk_matches_full_scores(self, scorer):
        users = np.asarray([1, 5])
        full = scorer.score_full(users)
        v, i = scorer.top_k(users, 5)
        for r in range(2):
            np.testing.assert_allclose(
                np.sort(full[r])[::-1][:5], np.asarray(v[r]),
                rtol=1e-4, atol=1e-5)
