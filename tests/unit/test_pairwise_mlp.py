"""Tests for the fused factorized pairwise-MLP scoring path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelrec_multimodal_tpu.models.multimodal import MultimodalRecommender
from pixelrec_multimodal_tpu.ops.pairwise_mlp import (
    build_factorized_head,
    compute_item_first,
    compute_item_side_gated,
    compute_user_first,
    compute_user_side_gated,
    pallas_pairwise_scores,
    pallas_pairwise_scores_gated,
    xla_pairwise_scores,
    xla_pairwise_scores_gated,
)

N_USERS, N_ITEMS, N_TAGS = 8, 20, 3


def make_model(use_batch_norm=True, final_activation='sigmoid',
               fusion_type='concatenate'):
    return MultimodalRecommender(
        n_users=N_USERS, n_items=N_ITEMS, n_tags=N_TAGS,
        num_numerical_features=2, embedding_dim=8,
        vision_feature_dim=6, language_feature_dim=5,
        use_contrastive=False, fusion_hidden_dims=(32, 16),
        fusion_type=fusion_type, use_batch_norm=use_batch_norm,
        dropout_rate=0.2, final_activation=final_activation)


def init_variables(model, train_batches=3):
    """Initialize and run a few train steps so BN stats are non-trivial."""
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


class TestFactorizedHead:
    @pytest.mark.parametrize('use_bn', [True, False])
    @pytest.mark.parametrize('final', ['sigmoid', 'none'])
    def test_matches_generic_path(self, use_bn, final):
        """Factorized+folded scoring == the flax score_from_towers path."""
        model = make_model(use_batch_norm=use_bn, final_activation=final)
        variables = init_variables(model)
        head = build_factorized_head(variables, model)
        assert head is not None

        rng = np.random.default_rng(1)
        C = 12
        item_idx = jnp.arange(C, dtype=jnp.int32)
        tag_idx = item_idx % N_TAGS
        kw = dict(
            vision_features=jnp.asarray(rng.standard_normal((C, 6)),
                                        jnp.float32),
            language_features=jnp.asarray(rng.standard_normal((C, 5)),
                                          jnp.float32),
            numerical_features=jnp.asarray(rng.standard_normal((C, 2)),
                                           jnp.float32))
        item_feats = model.apply(variables, item_idx, tag_idx,
                                 method='item_tower', **kw)  # [C, M, D]

        B = 4
        user_idx = jnp.arange(B, dtype=jnp.int32)
        user_emb = model.apply(variables, user_idx, method='user_tower')

        # Generic path: score all pairs via score_from_towers.
        ue = jnp.repeat(user_emb, C, axis=0)
        it = jnp.tile(item_feats, (B, 1, 1))
        generic = model.apply(variables, ue, it,
                              method='score_from_towers').reshape(B, C)

        # Fast path.
        item_first = compute_item_first(head, item_feats.reshape(C, -1))
        user_first = compute_user_first(head, user_emb)
        fast = xla_pairwise_scores(head, user_first, item_first)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(generic),
                                   rtol=2e-4, atol=2e-5)

    def test_attention_returns_none(self):
        """Attention fusion can't factorize (pair-dependent LayerNorm)."""
        model = MultimodalRecommender(
            n_users=4, n_items=8, n_tags=2, num_numerical_features=0,
            embedding_dim=8, fusion_hidden_dims=(16,),
            fusion_type='attention', num_attention_heads=2,
            use_contrastive=False)
        variables = model.init({'params': jax.random.PRNGKey(0)},
                               jnp.zeros(2, jnp.int32),
                               jnp.zeros(2, jnp.int32),
                               jnp.zeros(2, jnp.int32), train=False)
        assert build_factorized_head(variables, model) is None


def _item_user_sides(model, variables, B=4, C=12, seed=1):
    """Common fixtures: item tower feats + user embeddings + generic scores."""
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
                             method='item_tower', **kw)  # [C, M, D]
    user_idx = jnp.arange(B, dtype=jnp.int32)
    user_emb = model.apply(variables, user_idx, method='user_tower')
    ue = jnp.repeat(user_emb, C, axis=0)
    it = jnp.tile(item_feats, (B, 1, 1))
    generic = model.apply(variables, ue, it,
                          method='score_from_towers').reshape(B, C)
    return item_feats, user_emb, generic


class TestGatedFactorizedHead:
    @pytest.mark.parametrize('use_bn', [True, False])
    @pytest.mark.parametrize('final', ['sigmoid', 'tanh', 'none'])
    def test_matches_generic_path(self, use_bn, final):
        """Gated factorized scoring == the flax score_from_towers path."""
        model = make_model(use_batch_norm=use_bn, final_activation=final,
                           fusion_type='gated')
        variables = init_variables(model)
        head = build_factorized_head(variables, model)
        assert head is not None and head['fusion'] == 'gated'

        item_feats, user_emb, generic = _item_user_sides(model, variables)
        item_first, item_gates = compute_item_side_gated(head, item_feats)
        user_first, user_gates = compute_user_side_gated(head, user_emb)
        fast = xla_pairwise_scores_gated(head, user_first, user_gates,
                                         item_first, item_gates)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(generic),
                                   rtol=2e-4, atol=2e-5)

    def test_pallas_interpret_matches_xla(self):
        model = make_model(fusion_type='gated')
        variables = init_variables(model)
        head = build_factorized_head(variables, model)
        item_feats, user_emb, _ = _item_user_sides(model, variables, B=16,
                                                   C=128)
        # Pad item side to one full tile (as the scorer's catalog pad does).
        item_first, item_gates = compute_item_side_gated(head, item_feats)
        user_first, user_gates = compute_user_side_gated(head, user_emb)
        ref = xla_pairwise_scores_gated(head, user_first, user_gates,
                                        item_first, item_gates)
        out = pallas_pairwise_scores_gated(
            head, user_first, user_gates, item_first, item_gates,
            tile_users=16, tile_items=128, compute_dtype=jnp.float32,
            interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_multi_tile_grid_interpret(self):
        model = make_model(use_batch_norm=False, fusion_type='gated')
        variables = init_variables(model)
        head = build_factorized_head(variables, model)
        item_feats, user_emb, _ = _item_user_sides(model, variables, B=32,
                                                   C=256, seed=5)
        item_first, item_gates = compute_item_side_gated(head, item_feats)
        user_first, user_gates = compute_user_side_gated(head, user_emb)
        ref = xla_pairwise_scores_gated(head, user_first, user_gates,
                                        item_first, item_gates)
        out = pallas_pairwise_scores_gated(
            head, user_first, user_gates, item_first, item_gates,
            tile_users=16, tile_items=128, compute_dtype=jnp.float32,
            interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


class TestPallasKernel:
    def test_interpret_matches_xla(self):
        """The Pallas kernel (interpret mode on CPU) matches the XLA math."""
        model = make_model()
        variables = init_variables(model)
        head = build_factorized_head(variables, model)
        rng = np.random.default_rng(2)
        B, C = 16, 128  # one tile each
        h1 = head['b1'].shape[0]
        user_first = jnp.asarray(rng.standard_normal((B, h1)), jnp.float32)
        item_first = jnp.asarray(rng.standard_normal((C, h1)), jnp.float32)
        ref = xla_pairwise_scores(head, user_first, item_first)
        out = pallas_pairwise_scores(head, user_first, item_first,
                                     tile_users=16, tile_items=128,
                                     compute_dtype=jnp.float32,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_multi_tile_grid(self):
        model = make_model(use_batch_norm=False)
        variables = init_variables(model)
        head = build_factorized_head(variables, model)
        rng = np.random.default_rng(3)
        B, C = 32, 256  # 2x2 tiles
        h1 = head['b1'].shape[0]
        user_first = jnp.asarray(rng.standard_normal((B, h1)), jnp.float32)
        item_first = jnp.asarray(rng.standard_normal((C, h1)), jnp.float32)
        ref = xla_pairwise_scores(head, user_first, item_first)
        out = pallas_pairwise_scores(head, user_first, item_first,
                                     tile_users=16, tile_items=128,
                                     compute_dtype=jnp.float32,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


class TestInt8Head:
    def _quantized_head(self, model=None, seed=6, B=16, C=128):
        from pixelrec_multimodal_tpu.ops.pairwise_mlp import (
            calibrate_head_ranges,
            quantize_mlp_chain,
        )
        model = model or make_model()
        variables = init_variables(model)
        head = build_factorized_head(variables, model)
        rng = np.random.default_rng(seed)
        h1 = head['b1'].shape[0]
        user_first = jnp.asarray(rng.standard_normal((B, h1)), jnp.float32)
        item_first = jnp.asarray(rng.standard_normal((C, h1)), jnp.float32)
        ranges = calibrate_head_ranges(head, user_first, item_first)
        qhead = dict(head)
        qhead['qlayers'] = quantize_mlp_chain(head, ranges)
        return head, qhead, user_first, item_first

    def test_int8_close_to_f32(self):
        """Quantized scores track the f32 chain within the int8 error
        budget (sigmoid outputs, calibrated ranges)."""
        head, qhead, user_first, item_first = self._quantized_head()
        ref = np.asarray(xla_pairwise_scores(head, user_first, item_first))
        q = np.asarray(xla_pairwise_scores(qhead, user_first, item_first))
        assert np.max(np.abs(q - ref)) < 0.05
        # Ranking is what matters: per-user top-5 sets mostly agree.
        top_r = np.argsort(-ref, axis=1)[:, :5]
        top_q = np.argsort(-q, axis=1)[:, :5]
        agree = np.mean([len(set(a) & set(b)) / 5
                         for a, b in zip(top_r, top_q)])
        assert agree >= 0.8

    @pytest.mark.parametrize('final', ['sigmoid', 'none'])
    def test_pallas_interpret_matches_xla(self, final):
        """The int8 kernel branch (interpret mode) == the XLA int8 math."""
        model = make_model(final_activation=final)
        _, qhead, user_first, item_first = self._quantized_head(model)
        ref = xla_pairwise_scores(qhead, user_first, item_first)
        out = pallas_pairwise_scores(qhead, user_first, item_first,
                                     tile_users=16, tile_items=128,
                                     compute_dtype=jnp.float32,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_flagship_width_fidelity(self):
        """int8 ranking fidelity at the PRODUCTION head width
        ([512,256,128], the bench.py geometry): top-50 set agreement over
        a 64-user x 4096-item block must stay high — the quality bound
        BASELINE.md's int8 section relies on."""
        from pixelrec_multimodal_tpu.ops.pairwise_mlp import (
            calibrate_head_ranges,
            quantize_mlp_chain,
        )
        rng = np.random.default_rng(11)
        h1 = 512
        layers = []
        prev = h1
        for width in (256, 128):
            layers.append((jnp.asarray(
                rng.standard_normal((prev, width)), jnp.float32) * 0.05,
                jnp.asarray(rng.standard_normal(width), jnp.float32) * 0.05))
            prev = width
        w_last = np.zeros((prev, 128), np.float32)
        w_last[:, 0] = rng.standard_normal(prev) * 0.05
        layers.append((jnp.asarray(w_last), jnp.zeros(128, jnp.float32)))
        head = {'layers': layers, 'activation': 'relu',
                'final_activation': 'sigmoid',
                'b1': jnp.zeros(h1, jnp.float32), 'b1_folded': True}
        B, C = 64, 4096
        uf = jnp.asarray(rng.standard_normal((B, h1)), jnp.float32) * 0.5
        itf = jnp.asarray(rng.standard_normal((C, h1)), jnp.float32) * 0.5
        ranges = calibrate_head_ranges(head, uf[:16], itf[:512])
        qhead = dict(head, qlayers=quantize_mlp_chain(head, ranges))

        ref = np.asarray(xla_pairwise_scores(head, uf, itf))
        q = np.asarray(xla_pairwise_scores(qhead, uf, itf))
        k = 50
        top_r = np.argsort(-ref, axis=1)[:, :k]
        top_q = np.argsort(-q, axis=1)[:, :k]
        agree = np.mean([len(set(a) & set(b)) / k
                         for a, b in zip(top_r, top_q)])
        assert agree >= 0.9, agree
        assert np.max(np.abs(q - ref)) < 0.05

    def test_scorer_precision_int8(self):
        """CatalogScorer(precision='int8!'): scores close to bf16's, the
        unsupported-fusion case raises."""
        from pixelrec_multimodal_tpu.data.feature_store import ItemFeatureStore
        from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer

        model = make_model()
        variables = init_variables(model)
        rng = np.random.default_rng(7)
        store = ItemFeatureStore(N_ITEMS, np.arange(N_ITEMS).astype(str))
        store.tables['tag_idx'] = (np.arange(N_ITEMS) % N_TAGS).astype(np.int32)
        store.tables['numerical'] = rng.standard_normal(
            (N_ITEMS, 2)).astype(np.float32)
        store.tables['vision_emb'] = rng.standard_normal(
            (N_ITEMS, 6)).astype(np.float32)
        store.tables['language_emb'] = rng.standard_normal(
            (N_ITEMS, 5)).astype(np.float32)

        exact = CatalogScorer(model, variables, store, item_chunk=128,
                              user_chunk=8)
        q = CatalogScorer(model, variables, store, item_chunk=128,
                          user_chunk=8, precision='int8!')
        assert q._head.get('qlayers') is not None

        users = np.arange(4, dtype=np.int32)
        np.testing.assert_allclose(q.score_full(users),
                                   exact.score_full(users), atol=0.05)

        # Candidate path (sampled-negative eval) also runs the int8 chain
        # and tracks the exact scores.
        cands = rng.integers(0, N_ITEMS, size=(4, 7)).astype(np.int32)
        np.testing.assert_allclose(
            q.score_candidates(users, cands),
            exact.score_candidates(users, cands), atol=0.05)

        # Attention has no quantized chain — must raise.
        attn = make_model(fusion_type='attention')
        avars = init_variables(attn)
        with pytest.raises(ValueError, match='int8'):
            CatalogScorer(attn, avars, store, item_chunk=128,
                          user_chunk=8, precision='int8!')

    def test_scorer_precision_int8_gated(self):
        """Gated fusion quantizes too: full scores and candidate scores
        track the exact scorer within the int8 budget."""
        from pixelrec_multimodal_tpu.data.feature_store import ItemFeatureStore
        from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer

        model = make_model(fusion_type='gated')
        variables = init_variables(model)
        rng = np.random.default_rng(9)
        store = ItemFeatureStore(N_ITEMS, np.arange(N_ITEMS).astype(str))
        store.tables['tag_idx'] = (np.arange(N_ITEMS) % N_TAGS).astype(np.int32)
        store.tables['numerical'] = rng.standard_normal(
            (N_ITEMS, 2)).astype(np.float32)
        store.tables['vision_emb'] = rng.standard_normal(
            (N_ITEMS, 6)).astype(np.float32)
        store.tables['language_emb'] = rng.standard_normal(
            (N_ITEMS, 5)).astype(np.float32)

        exact = CatalogScorer(model, variables, store, item_chunk=128,
                              user_chunk=8)
        q = CatalogScorer(model, variables, store, item_chunk=128,
                          user_chunk=8, precision='int8!')
        assert q._head.get('qlayers') is not None

        users = np.arange(4, dtype=np.int32)
        np.testing.assert_allclose(q.score_full(users),
                                   exact.score_full(users), atol=0.05)
        cands = rng.integers(0, N_ITEMS, size=(4, 7)).astype(np.int32)
        np.testing.assert_allclose(
            q.score_candidates(users, cands),
            exact.score_candidates(users, cands), atol=0.05)

    @pytest.mark.parametrize('final', ['sigmoid', 'none'])
    def test_gated_pallas_interpret_matches_xla(self, final):
        """The gated int8 kernel branch (interpret mode) == the XLA int8
        math."""
        from pixelrec_multimodal_tpu.ops.pairwise_mlp import (
            calibrate_head_ranges_gated,
            quantize_mlp_chain,
        )
        model = make_model(final_activation=final, fusion_type='gated')
        variables = init_variables(model)
        head = build_factorized_head(variables, model)
        rng = np.random.default_rng(12)
        h1 = head['h1']
        B, C = 16, 128
        uf = jnp.asarray(rng.standard_normal((B, h1)), jnp.float32)
        ug = jnp.asarray(rng.standard_normal((B, 8)), jnp.float32)
        itf = jnp.asarray(rng.standard_normal(
            (C, head['n_item_mods'] * h1)), jnp.float32)
        ig = jnp.asarray(rng.standard_normal((C, 8)), jnp.float32)
        ranges = calibrate_head_ranges_gated(head, (uf, ug), (itf, ig))
        qhead = dict(head, qlayers=quantize_mlp_chain(head, ranges))
        ref = xla_pairwise_scores_gated(qhead, uf, ug, itf, ig)
        out = pallas_pairwise_scores_gated(qhead, uf, ug, itf, ig,
                                           tile_users=16, tile_items=128,
                                           compute_dtype=jnp.float32,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


class TestInt8AutoPrecision:
    """The measured-flip-point heuristic (VERDICT r4 #4): precision='int8'
    only engages where the hidden chain dominates; 'int8!' forces."""

    def _store(self):
        from pixelrec_multimodal_tpu.data.feature_store import (
            ItemFeatureStore,
        )
        rng = np.random.default_rng(7)
        store = ItemFeatureStore(N_ITEMS, np.arange(N_ITEMS).astype(str))
        store.tables['tag_idx'] = (np.arange(N_ITEMS)
                                   % N_TAGS).astype(np.int32)
        store.tables['numerical'] = rng.standard_normal(
            (N_ITEMS, 2)).astype(np.float32)
        store.tables['vision_emb'] = rng.standard_normal(
            (N_ITEMS, 6)).astype(np.float32)
        store.tables['language_emb'] = rng.standard_normal(
            (N_ITEMS, 5)).astype(np.float32)
        return store

    def test_flagship_ratio_value(self):
        """The decision metric at the flagship [512,256,128] head is 640
        (below threshold -> bf16 fallback), pinning the BASELINE.md
        accounting."""
        from pixelrec_multimodal_tpu.ops.pairwise_mlp import (
            INT8_MIN_CHAIN_FLOPS_PER_LANE,
            int8_chain_flops_per_lane,
        )
        head = {'h1': 512, 'layers': [
            (np.zeros((512, 256)), np.zeros(256)),
            (np.zeros((256, 128)), np.zeros(128)),
            (np.zeros((128, 128)), np.zeros(128)),
        ]}
        assert int8_chain_flops_per_lane(head) == 640
        assert 640 < INT8_MIN_CHAIN_FLOPS_PER_LANE

    def test_below_flip_point_falls_back_with_warning(self, capsys):
        from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer
        model = make_model()  # (32,16) head: ratio 32, far below
        variables = init_variables(model)
        sc = CatalogScorer(model, variables, self._store(), item_chunk=128,
                           user_chunk=8, precision='int8')
        assert sc.precision == 'bf16'
        assert sc._head.get('qlayers') is None
        assert 'flip point' in capsys.readouterr().err

    def test_force_engages_below_flip_point(self):
        from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer
        model = make_model()
        variables = init_variables(model)
        sc = CatalogScorer(model, variables, self._store(), item_chunk=128,
                           user_chunk=8, precision='int8!')
        assert sc.precision == 'int8'
        assert sc._head.get('qlayers') is not None

    def test_above_flip_point_engages(self):
        from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer
        model = MultimodalRecommender(
            n_users=N_USERS, n_items=N_ITEMS, n_tags=N_TAGS,
            num_numerical_features=2, embedding_dim=8,
            vision_feature_dim=6, language_feature_dim=5,
            use_contrastive=False, fusion_hidden_dims=(4, 512),
            fusion_type='concatenate', use_batch_norm=False)
        variables = init_variables(model)
        sc = CatalogScorer(model, variables, self._store(), item_chunk=128,
                           user_chunk=8, precision='int8')
        assert sc.precision == 'int8'
        assert sc._head.get('qlayers') is not None


class TestGatedFactoredKernel:
    """Factored gated kernel (per-side exp coefficients + MXU table
    contraction; VERDICT r4 #5): same math as the exact gated kernel up
    to f32 exp ulps / the tables' dtype quantization."""

    def _inputs(self, head, B=16, C=128, seed=12):
        rng = np.random.default_rng(seed)
        h1 = head['h1']
        uf = jnp.asarray(rng.standard_normal((B, h1)), jnp.float32)
        ug = jnp.asarray(rng.standard_normal((B, 8)), jnp.float32)
        itf = jnp.asarray(rng.standard_normal(
            (C, head['n_item_mods'] * h1)), jnp.float32)
        ig = jnp.asarray(rng.standard_normal((C, 8)), jnp.float32)
        return uf, ug, itf, ig

    @pytest.mark.parametrize('final', ['sigmoid', 'none'])
    def test_factored_matches_xla_f32_tables(self, final):
        from pixelrec_multimodal_tpu.ops.pairwise_mlp import (
            factor_gated_tables,
            factor_gated_user,
            pallas_pairwise_scores_gated_factored,
        )
        model = make_model(final_activation=final, fusion_type='gated')
        variables = init_variables(model)
        head = build_factorized_head(variables, model)
        uf, ug, itf, ig = self._inputs(head)
        ref = xla_pairwise_scores_gated(head, uf, ug, itf, ig)
        ufx, a = factor_gated_user(head, uf, ug)
        t4, igb = factor_gated_tables(head, itf, ig,
                                      table_dtype=jnp.float32)
        out = pallas_pairwise_scores_gated_factored(
            head, ufx, a, t4, igb, tile_users=16, tile_items=128,
            compute_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_factored_bf16_tables_close(self):
        """bf16 tables (the production/MXU dtype) stay within the bf16
        quantization envelope of the exact scores."""
        from pixelrec_multimodal_tpu.ops.pairwise_mlp import (
            factor_gated_tables,
            factor_gated_user,
            pallas_pairwise_scores_gated_factored,
        )
        model = make_model(fusion_type='gated')
        variables = init_variables(model)
        head = build_factorized_head(variables, model)
        uf, ug, itf, ig = self._inputs(head)
        ref = np.asarray(xla_pairwise_scores_gated(head, uf, ug, itf, ig))
        ufx, a = factor_gated_user(head, uf, ug)
        t4, igb = factor_gated_tables(head, itf, ig)
        out = np.asarray(pallas_pairwise_scores_gated_factored(
            head, ufx, a, t4, igb, tile_users=16, tile_items=128,
            compute_dtype=jnp.float32, interpret=True))
        assert np.max(np.abs(out - ref)) < 0.05
        # ranking preserved: top-10 per user overlaps >= 9/10 on average
        top_ref = np.argsort(-ref, axis=1)[:, :10]
        top_out = np.argsort(-out, axis=1)[:, :10]
        agree = np.mean([len(set(a_) & set(b_)) / 10
                         for a_, b_ in zip(top_ref.tolist(),
                                           top_out.tolist())])
        assert agree >= 0.9, agree

    def test_scorer_gated_factored_matches_exact(self):
        """CatalogScorer(gated_variant='factored') — the TPU default for
        gated fusion — produces the exact scorer's top-k through the real
        scan bodies (interpret-mode kernel on CPU): pre-chunked table
        layout, factored user side, score_full and seen-mask paths."""
        from pixelrec_multimodal_tpu.data.feature_store import (
            ItemFeatureStore,
        )
        from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer

        model = make_model(fusion_type='gated')
        variables = init_variables(model)
        rng = np.random.default_rng(9)
        store = ItemFeatureStore(N_ITEMS, np.arange(N_ITEMS).astype(str))
        store.tables['tag_idx'] = (np.arange(N_ITEMS)
                                   % N_TAGS).astype(np.int32)
        store.tables['numerical'] = rng.standard_normal(
            (N_ITEMS, 2)).astype(np.float32)
        store.tables['vision_emb'] = rng.standard_normal(
            (N_ITEMS, 6)).astype(np.float32)
        store.tables['language_emb'] = rng.standard_normal(
            (N_ITEMS, 5)).astype(np.float32)
        exact = CatalogScorer(model, variables, store, item_chunk=128,
                              user_chunk=8)
        fact = CatalogScorer(model, variables, store, item_chunk=128,
                             user_chunk=8, gated_variant='factored')
        assert fact._gated_factored
        assert fact._item_fast_factored is not None
        users = np.arange(6, dtype=np.int32)
        seen = np.zeros((6, N_ITEMS), bool)
        seen[1, :4] = True
        ve, ie = exact.top_k(users, 5, seen_mask=seen)
        vf, if_ = fact.top_k(users, 5, seen_mask=seen)
        np.testing.assert_array_equal(if_, ie)
        np.testing.assert_allclose(vf, ve, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(fact.score_full(users),
                                   exact.score_full(users),
                                   rtol=2e-3, atol=2e-3)

    def test_scorer_gated_factored_size_fallback(self, monkeypatch, capsys):
        """Above the factored-table byte cap the scorer keeps the exact
        kernel (large catalogs; the cap reuses _PACK_BYTES)."""
        from pixelrec_multimodal_tpu.data.feature_store import (
            ItemFeatureStore,
        )
        from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer

        monkeypatch.setattr(CatalogScorer, '_PACK_BYTES', 1)
        model = make_model(fusion_type='gated')
        variables = init_variables(model)
        rng = np.random.default_rng(9)
        store = ItemFeatureStore(N_ITEMS, np.arange(N_ITEMS).astype(str))
        store.tables['tag_idx'] = (np.arange(N_ITEMS)
                                   % N_TAGS).astype(np.int32)
        store.tables['numerical'] = rng.standard_normal(
            (N_ITEMS, 2)).astype(np.float32)
        store.tables['vision_emb'] = rng.standard_normal(
            (N_ITEMS, 6)).astype(np.float32)
        store.tables['language_emb'] = rng.standard_normal(
            (N_ITEMS, 5)).astype(np.float32)
        sc = CatalogScorer(model, variables, store, item_chunk=128,
                           user_chunk=8, gated_variant='factored')
        assert not sc._gated_factored
        assert sc._item_fast_factored is None
        assert 'keeping the exact' in capsys.readouterr().err
        users = np.arange(4, dtype=np.int32)
        v, i = sc.top_k(users, 5)   # exact path still works
        assert (i >= 0).all()

    def test_int8_chain_composes(self):
        from pixelrec_multimodal_tpu.ops.pairwise_mlp import (
            calibrate_head_ranges_gated,
            factor_gated_tables,
            factor_gated_user,
            pallas_pairwise_scores_gated_factored,
            quantize_mlp_chain,
        )
        model = make_model(fusion_type='gated')
        variables = init_variables(model)
        head = build_factorized_head(variables, model)
        uf, ug, itf, ig = self._inputs(head)
        ranges = calibrate_head_ranges_gated(head, (uf, ug), (itf, ig))
        qhead = dict(head, qlayers=quantize_mlp_chain(head, ranges))
        ref = np.asarray(xla_pairwise_scores_gated(qhead, uf, ug, itf, ig))
        ufx, a = factor_gated_user(qhead, uf, ug)
        t4, igb = factor_gated_tables(qhead, itf, ig,
                                      table_dtype=jnp.float32)
        out = np.asarray(pallas_pairwise_scores_gated_factored(
            qhead, ufx, a, t4, igb, tile_users=16, tile_items=128,
            compute_dtype=jnp.float32, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


class TestScorerFastPathIntegration:
    @pytest.mark.parametrize('fusion', ['concatenate', 'gated'])
    def test_topk_fast_matches_generic(self, fusion):
        """CatalogScorer with fast path on == off, same top-k results."""
        from pixelrec_multimodal_tpu.data.feature_store import ItemFeatureStore
        from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer

        model = make_model(fusion_type=fusion)
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
        vf, idf = fast.top_k(users, 5)
        vs, ids = slow.top_k(users, 5)
        np.testing.assert_array_equal(idf, ids)
        np.testing.assert_allclose(vf, vs, rtol=2e-4, atol=2e-5)
