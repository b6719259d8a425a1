"""M4 tests: full multimodal training (3 fusions + contrastive) over
embedding tables, device-side augmentation, and the end-to-end unfrozen path
with freeze masks."""
import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from pixelrec_multimodal_tpu.config import ImageAugmentationConfig, ModelConfig
from pixelrec_multimodal_tpu.models import build_model
from pixelrec_multimodal_tpu.models.end_to_end import (
    EndToEndRecommender,
    trainable_mask,
)
from pixelrec_multimodal_tpu.models.multimodal import MultimodalRecommender
from pixelrec_multimodal_tpu.ops.augment import (
    augment_batch,
    color_jitter,
    gaussian_blur,
    random_horizontal_flip,
    random_resized_crop,
    random_rotation,
)
from pixelrec_multimodal_tpu.training.optimizers import (
    build_optimizer,
    with_frozen,
)
from pixelrec_multimodal_tpu.training.steps import (
    init_train_state,
    make_step_fns,
)

N_USERS, N_ITEMS, N_TAGS = 10, 24, 4
VDIM, LDIM, NUMF = 12, 8, 3


def make_tables(seed=0):
    rng = np.random.default_rng(seed)
    return {
        'vision_emb': jnp.asarray(
            rng.standard_normal((N_ITEMS, VDIM)).astype(np.float32)),
        'language_emb': jnp.asarray(
            rng.standard_normal((N_ITEMS, LDIM)).astype(np.float32)),
        'clip_text_emb': jnp.asarray(
            rng.standard_normal((N_ITEMS, 16)).astype(np.float32)),
        'numerical': jnp.asarray(
            rng.standard_normal((N_ITEMS, NUMF)).astype(np.float32)),
    }


def make_batch(size=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        'user_idx': jnp.asarray(rng.integers(0, N_USERS, size), jnp.int32),
        'item_idx': jnp.asarray(rng.integers(0, N_ITEMS, size), jnp.int32),
        'tag_idx': jnp.asarray(rng.integers(0, N_TAGS, size), jnp.int32),
        'label': jnp.asarray(rng.integers(0, 2, size), jnp.float32),
        'weight': jnp.ones(size, jnp.float32),
    }


def full_model(fusion='concatenate', contrastive=False):
    return MultimodalRecommender(
        n_users=N_USERS, n_items=N_ITEMS, n_tags=N_TAGS,
        num_numerical_features=NUMF, embedding_dim=8,
        vision_feature_dim=VDIM, language_feature_dim=LDIM,
        clip_text_feature_dim=16, use_contrastive=contrastive,
        fusion_hidden_dims=(16,), fusion_type=fusion, use_batch_norm=True,
        dropout_rate=0.1, num_attention_heads=2)


class TestMultimodalFusionTraining:
    @pytest.mark.parametrize('fusion', ['concatenate', 'attention', 'gated'])
    def test_training_step_updates(self, fusion):
        model = full_model(fusion)
        tx = build_optimizer('adamw', 1e-2)
        state = init_train_state(model, tx, jax.random.PRNGKey(0))
        p0 = jax.device_get(state.params)
        train_step, eval_step = make_step_fns(model, make_tables())
        batch = make_batch()
        state, metrics = train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics['total_loss']))
        delta = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
                    for a, b in zip(jax.tree.leaves(p0),
                                    jax.tree.leaves(
                                        jax.device_get(state.params))))
        assert delta > 0
        em = eval_step(state, batch)
        assert np.isfinite(float(em['total_loss']))

    def test_contrastive_branch(self):
        model = full_model(contrastive=True)
        assert model.contrastive_active
        tx = build_optimizer('adamw', 1e-2)
        state = init_train_state(model, tx, jax.random.PRNGKey(0))
        assert 'temperature' in state.params
        train_step, _ = make_step_fns(model, make_tables(),
                                      contrastive_weight=0.5)
        state, metrics = train_step(state, make_batch(),
                                    jax.random.PRNGKey(1))
        assert float(metrics['contrastive_loss']) != 0.0
        assert np.isfinite(float(metrics['total_loss']))

    def test_missing_tables_zero_degradation(self):
        """Enabled modality + absent table -> zero features, not a crash."""
        model = full_model()
        tx = build_optimizer('adamw', 1e-2)
        state = init_train_state(model, tx, jax.random.PRNGKey(0))
        train_step, _ = make_step_fns(
            model, {'numerical': make_tables()['numerical']})
        state, metrics = train_step(state, make_batch(),
                                    jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics['total_loss']))


class TestAugmentation:
    @pytest.fixture
    def images(self):
        rng = np.random.default_rng(0)
        return jnp.asarray(rng.random((4, 3, 32, 32)).astype(np.float32))

    def test_shapes_preserved(self, images):
        key = jax.random.PRNGKey(0)
        for fn in (lambda: random_resized_crop(key, images),
                   lambda: color_jitter(key, images),
                   lambda: random_horizontal_flip(key, images),
                   lambda: random_rotation(key, images, 10.0),
                   lambda: gaussian_blur(key, images)):
            out = fn()
            assert out.shape == images.shape
            assert np.isfinite(np.asarray(out)).all()

    def test_flip_is_exact_reversal(self, images):
        key = jax.random.PRNGKey(3)
        out = np.asarray(random_horizontal_flip(key, images, p=1.0))
        np.testing.assert_allclose(out, np.asarray(images)[..., ::-1])

    def test_full_pipeline_jits_and_is_deterministic(self, images):
        cfg = ImageAugmentationConfig(enabled=True, gaussian_noise=True)
        fn = jax.jit(lambda k, x: augment_batch(k, x, cfg))
        a = fn(jax.random.PRNGKey(0), images)
        b = fn(jax.random.PRNGKey(0), images)
        c = fn(jax.random.PRNGKey(1), images)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        assert not np.allclose(np.asarray(a), np.asarray(c))
        assert a.shape == images.shape

    def test_disabled_passthrough(self, images):
        cfg = ImageAugmentationConfig(enabled=False)
        out = augment_batch(jax.random.PRNGKey(0), images, cfg)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(images))


class TestEndToEndFreezing:
    def _tiny_e2e(self):
        from pixelrec_multimodal_tpu.encoders.text_models import (
            TextEncoderConfig, TextTransformer)

        scorer = MultimodalRecommender(
            n_users=N_USERS, n_items=N_ITEMS, n_tags=N_TAGS,
            num_numerical_features=0, embedding_dim=8,
            vision_feature_dim=None, language_feature_dim=16,
            use_contrastive=False, fusion_hidden_dims=(16,),
            fusion_type='concatenate', use_batch_norm=False,
            language_model_name='tiny')
        model = EndToEndRecommender(scorer=scorer,
                                    language_model_name='tiny')
        # Patch in a tiny text encoder by overriding the registry call via
        # direct construction: use a subclass closure instead.
        tiny_cfg = TextEncoderConfig(vocab_size=50, hidden_size=16,
                                     num_layers=1, num_heads=2,
                                     intermediate_size=32,
                                     max_position_embeddings=16)

        class TinyE2E(EndToEndRecommender):
            def setup(self):
                self.language_encoder = TextTransformer(tiny_cfg)

        return TinyE2E(scorer=scorer, language_model_name='tiny')

    def test_frozen_encoder_not_updated(self):
        from pixelrec_multimodal_tpu.training.e2e_steps import (
            init_e2e_train_state, make_e2e_step_fns)
        model = self._tiny_e2e()
        base_tx = build_optimizer('adamw', 1e-2)

        state = init_e2e_train_state(model, base_tx, jax.random.PRNGKey(0),
                                     text_len=8)
        mask = trainable_mask(state.params, freeze_language=True)
        tx = with_frozen(build_optimizer('adamw', 1e-2), mask)
        state = init_e2e_train_state(model, tx, jax.random.PRNGKey(0),
                                     text_len=8)
        p0 = jax.device_get(state.params)

        train_step, eval_step = make_e2e_step_fns(model, {})
        batch = make_batch(8)
        batch['text_input_ids'] = jnp.ones((8, 8), jnp.int32) * 3
        batch['text_attention_mask'] = jnp.ones((8, 8), jnp.int32)
        state, metrics = train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics['total_loss']))

        p1 = jax.device_get(state.params)
        enc_delta = sum(
            float(np.abs(np.asarray(a) - np.asarray(b)).sum())
            for a, b in zip(jax.tree.leaves(p0['language_encoder']),
                            jax.tree.leaves(p1['language_encoder'])))
        scorer_delta = sum(
            float(np.abs(np.asarray(a) - np.asarray(b)).sum())
            for a, b in zip(jax.tree.leaves(p0['scorer']),
                            jax.tree.leaves(p1['scorer'])))
        assert enc_delta == 0.0      # frozen tower untouched
        assert scorer_delta > 0.0    # scorer learned

    def test_unfrozen_encoder_updates(self):
        from pixelrec_multimodal_tpu.training.e2e_steps import (
            init_e2e_train_state, make_e2e_step_fns)
        model = self._tiny_e2e()
        state = init_e2e_train_state(model, build_optimizer('adamw', 1e-2),
                                     jax.random.PRNGKey(0), text_len=8)
        mask = trainable_mask(state.params, freeze_language=False)
        tx = with_frozen(build_optimizer('adamw', 1e-2), mask)
        state = init_e2e_train_state(model, tx, jax.random.PRNGKey(0),
                                     text_len=8)
        p0 = jax.device_get(state.params)
        train_step, _ = make_e2e_step_fns(model, {})
        batch = make_batch(8)
        batch['text_input_ids'] = jnp.ones((8, 8), jnp.int32) * 3
        batch['text_attention_mask'] = jnp.ones((8, 8), jnp.int32)
        state, _ = train_step(state, batch, jax.random.PRNGKey(1))
        p1 = jax.device_get(state.params)
        enc_delta = sum(
            float(np.abs(np.asarray(a) - np.asarray(b)).sum())
            for a, b in zip(jax.tree.leaves(p0['language_encoder']),
                            jax.tree.leaves(p1['language_encoder'])))
        assert enc_delta > 0.0


class TestRematEncoders:
    """remat_encoders: jax.checkpoint around the towers must change memory
    behavior only — losses and updated params stay numerically identical."""

    def _tiny(self, remat):
        from pixelrec_multimodal_tpu.encoders.text_models import (
            TextEncoderConfig, TextTransformer)
        from pixelrec_multimodal_tpu.models.end_to_end import (
            EndToEndRecommender)

        scorer = MultimodalRecommender(
            n_users=N_USERS, n_items=N_ITEMS, n_tags=N_TAGS,
            num_numerical_features=0, embedding_dim=8,
            vision_feature_dim=None, language_feature_dim=16,
            use_contrastive=False, fusion_hidden_dims=(16,),
            fusion_type='concatenate', use_batch_norm=False,
            language_model_name='tiny')
        tiny_cfg = TextEncoderConfig(vocab_size=50, hidden_size=16,
                                     num_layers=1, num_heads=2,
                                     intermediate_size=32,
                                     max_position_embeddings=16)

        class TinyE2E(EndToEndRecommender):
            def setup(self):
                self.language_encoder = self._maybe_remat(
                    TextTransformer(tiny_cfg))

        return TinyE2E(scorer=scorer, language_model_name='tiny',
                       remat_encoders=remat)

    def _one_step(self, remat):
        from pixelrec_multimodal_tpu.training.e2e_steps import (
            init_e2e_train_state, make_e2e_step_fns)
        from pixelrec_multimodal_tpu.training.optimizers import (
            build_optimizer)
        model = self._tiny(remat)
        # SGD, not Adam: the attention key-bias gradient is analytically
        # zero (softmax shift invariance), so Adam's g/sqrt(v) normalizer
        # amplifies remat's reordered-float noise on it to lr scale. SGD
        # keeps the update linear in the gradient, making the remat
        # equivalence checkable to float tolerance.
        state = init_e2e_train_state(model, build_optimizer('sgd', 1e-2),
                                     jax.random.PRNGKey(0), text_len=8)
        train_step, _ = make_e2e_step_fns(model, {})
        batch = make_batch(8)
        batch['text_input_ids'] = jnp.ones((8, 8), jnp.int32) * 3
        batch['text_attention_mask'] = jnp.ones((8, 8), jnp.int32)
        state, metrics = train_step(state, batch, jax.random.PRNGKey(1))
        return jax.device_get(state.params), float(metrics['total_loss'])

    def test_remat_matches_baseline_exactly(self):
        p_base, loss_base = self._one_step(remat=False)
        p_remat, loss_remat = self._one_step(remat=True)
        assert np.isfinite(loss_base)
        np.testing.assert_allclose(loss_remat, loss_base, rtol=1e-6)
        for a, b in zip(jax.tree.leaves(p_base), jax.tree.leaves(p_remat)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_builder_threads_remat_flag(self):
        from pixelrec_multimodal_tpu.config import ModelConfig
        from pixelrec_multimodal_tpu.models.end_to_end import (
            build_end_to_end_model)
        cfg = ModelConfig(vision_model=None, language_model='sentence-bert',
                          embedding_dim=8, use_contrastive=False)
        m = build_end_to_end_model(cfg, 4, 4, 2, 0, remat_encoders=True)
        assert m.remat_encoders is True
