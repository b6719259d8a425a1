# pixelrec_multimodal_tpu/training/e2e_steps.py
"""Compiled train/eval steps for the end-to-end (unfrozen encoder) path.

Counterpart of training/steps.py for models/end_to_end.EndToEndRecommender:
batches carry raw pixels/tokens (dataset.batches(include_raw=...)), device-
side augmentation (ops/augment.py) runs inside the compiled train step, and
encoder freezing is enforced via the optimizer mask
(training/optimizers.with_frozen), matching the reference's
freeze_vision/freeze_language behavior
(/root/reference/src/models/multimodal.py:230-250).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ImageAugmentationConfig
from ..models.losses import recommender_loss
from ..ops.augment import augment_batch
from .steps import TrainState, _classification_sums


def make_e2e_step_fns(model, tables: Dict[str, jnp.ndarray],
                      bce_weight: float = 1.0,
                      contrastive_weight: float = 0.1,
                      augmentation_config: Optional[ImageAugmentationConfig]
                      = None):
    """Jitted (train_step, eval_step) for an EndToEndRecommender."""
    scorer = model.scorer
    contrastive = scorer.contrastive_active

    def forward(params, batch_stats, tables_in, batch, rng, train: bool):
        it = batch['item_idx']
        kw = {}
        for key in ('image', 'text_input_ids', 'text_attention_mask',
                    'clip_text_input_ids', 'clip_text_attention_mask'):
            if key in batch:
                kw[key] = batch[key]
        if scorer.num_numerical_features > 0:
            if 'numerical' in tables:
                kw['numerical_features'] = jnp.take(tables_in['numerical'], it,
                                                    axis=0)
            else:
                kw['numerical_features'] = jnp.zeros(
                    (it.shape[0], scorer.num_numerical_features), jnp.float32)
        if train and 'image' in kw and augmentation_config is not None \
                and augmentation_config.enabled:
            aug_rng = jax.random.fold_in(rng, 1)
            kw['image'] = augment_batch(aug_rng, kw['image'],
                                        augmentation_config)

        variables = {'params': params}
        if batch_stats is not None:
            variables['batch_stats'] = batch_stats
        mutable = ['batch_stats'] if (train and batch_stats is not None) else False
        rngs = {'dropout': rng} if train else None
        out = model.apply(
            variables, batch['user_idx'], batch['item_idx'], batch['tag_idx'],
            train=train, return_embeddings=contrastive, rngs=rngs,
            mutable=mutable, **kw)
        new_stats = None
        if mutable:
            out, mutated = out
            new_stats = mutated.get('batch_stats')
        if contrastive:
            scores, vis_c, txt_c, _ = out
        else:
            scores, vis_c, txt_c = out, None, None
        temp = (params['scorer']['temperature']
                if contrastive and 'temperature' in params.get('scorer', {})
                else scorer.contrastive_temperature)
        loss = recommender_loss(
            scores.squeeze(-1), batch['label'], vis_c, txt_c, temp,
            use_contrastive=contrastive,
            contrastive_weight=contrastive_weight, bce_weight=bce_weight,
            weight=batch.get('weight'))
        return scores, loss, new_stats

    def train_step(state: TrainState, tables_in, batch, rng):
        def loss_fn(params):
            scores, loss, new_stats = forward(params, state.batch_stats,
                                              tables_in, batch, rng,
                                              train=True)
            return loss['total'], (scores, loss, new_stats)

        grads, (scores, loss, new_stats) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        finite = jnp.isfinite(loss['total'])

        def do_update(_):
            s = state.apply_gradients(grads)
            if new_stats is not None:
                s = s.replace(batch_stats=new_stats)
            return s

        new_state = jax.lax.cond(finite, do_update, lambda _: state, None)
        weight = batch.get('weight', jnp.ones_like(batch['label']))
        metrics = {
            'total_loss': loss['total'], 'bce_loss': loss['bce'],
            'contrastive_loss': loss['contrastive'],
            **_classification_sums(scores.squeeze(-1), batch['label'], weight),
        }
        return new_state, metrics

    def eval_step(state: TrainState, tables_in, batch):
        scores, loss, _ = forward(state.params, state.batch_stats, tables_in,
                                  batch, rng=None, train=False)
        weight = batch.get('weight', jnp.ones_like(batch['label']))
        return {
            'total_loss': loss['total'], 'bce_loss': loss['bce'],
            'contrastive_loss': loss['contrastive'],
            **_classification_sums(scores.squeeze(-1), batch['label'], weight),
        }

    jit_train = jax.jit(train_step, donate_argnums=(0,))
    jit_eval = jax.jit(eval_step)
    return (lambda state, batch, rng: jit_train(state, tables, batch, rng),
            lambda state, batch: jit_eval(state, tables, batch))


def init_e2e_train_state(model, tx, rng, batch_size: int = 2,
                         image_size: int = 224, text_len: int = 16,
                         clip_text_len: int = 77) -> TrainState:
    """Initialize an end-to-end model's parameters with dummy inputs."""
    scorer = model.scorer
    idx = jnp.zeros((batch_size,), jnp.int32)
    kw = {}
    if model.vision_model_name:
        kw['image'] = jnp.zeros((batch_size, 3, image_size, image_size),
                                jnp.float32)
    if model.language_model_name:
        kw['text_input_ids'] = jnp.ones((batch_size, text_len), jnp.int32)
        kw['text_attention_mask'] = jnp.ones((batch_size, text_len), jnp.int32)
    if model.use_clip_text:
        kw['clip_text_input_ids'] = jnp.ones((batch_size, clip_text_len),
                                             jnp.int32)
        kw['clip_text_attention_mask'] = jnp.ones(
            (batch_size, clip_text_len), jnp.int32)
    if scorer.num_numerical_features > 0:
        kw['numerical_features'] = jnp.zeros(
            (batch_size, scorer.num_numerical_features), jnp.float32)
    variables = model.init({'params': rng}, idx, idx, idx, train=False,
                           return_embeddings=scorer.contrastive_active, **kw)
    return TrainState.create(apply_fn=model.apply,
                             params=variables['params'],
                             batch_stats=variables.get('batch_stats'),
                             tx=tx)
