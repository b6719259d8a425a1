# pixelrec_multimodal_tpu/models/end_to_end.py
"""End-to-end model: Flax encoder towers + the multimodal scorer.

This is the unfrozen-backbone path. The reference runs HF encoders inside the
scoring model's forward pass (/root/reference/src/models/multimodal.py:
559-580), optionally with gradients when freeze_vision/freeze_language are
False (:230-250). Here the towers are the zoo's Flax modules composed in
front of the table-based scorer; freezing is expressed through the optimizer
(training/optimizers.with_frozen) so frozen subtrees receive neither
gradients nor weight decay.

The frozen-production path (precomputed embedding tables) remains the fast
default; this module exists for fine-tuning and for full reference parity.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import ModelConfig
from ..encoders import (
    build_clip_text_encoder,
    build_language_encoder,
    build_vision_encoder,
)
from .multimodal import MultimodalRecommender, build_model


class EndToEndRecommender(nn.Module):
    """Encoders-in-the-graph variant of the recommender.

    Accepts raw pixel/token inputs; computes pooled encoder features and
    feeds the shared scorer. Parameter tree layout:
        params/vision_encoder/..., params/language_encoder/...,
        params/clip_text_encoder/..., params/scorer/...
    so the scorer subtree is directly reusable by the catalog scorer after
    training, and freeze masks select encoder subtrees by name.
    """
    scorer: MultimodalRecommender
    vision_model_name: Optional[str] = None
    language_model_name: Optional[str] = None
    use_clip_text: bool = False
    encoder_dtype: Any = jnp.float32
    # Rematerialize encoder forwards in the backward pass (jax.checkpoint):
    # activations of the deep towers are recomputed instead of stored,
    # trading ~1 extra encoder forward of FLOPs for O(depth) less HBM —
    # the standard TPU memory lever for fine-tuning with large batches.
    remat_encoders: bool = False

    def _maybe_remat(self, module: nn.Module) -> nn.Module:
        if not self.remat_encoders:
            return module
        import dataclasses
        cls = nn.remat(type(module))
        kwargs = {f.name: getattr(module, f.name)
                  for f in dataclasses.fields(module)
                  if f.init and f.name not in ('parent', 'name')}
        return cls(**kwargs)

    def setup(self):
        if self.vision_model_name:
            self.vision_encoder = self._maybe_remat(build_vision_encoder(
                self.vision_model_name, dtype=self.encoder_dtype))
        if self.language_model_name:
            self.language_encoder = self._maybe_remat(build_language_encoder(
                self.language_model_name, dtype=self.encoder_dtype))
        if self.use_clip_text:
            self.clip_text_encoder = self._maybe_remat(
                build_clip_text_encoder(dtype=self.encoder_dtype))

    def __call__(self, user_idx, item_idx, tag_idx,
                 image: Optional[jnp.ndarray] = None,
                 text_input_ids: Optional[jnp.ndarray] = None,
                 text_attention_mask: Optional[jnp.ndarray] = None,
                 numerical_features: Optional[jnp.ndarray] = None,
                 clip_text_input_ids: Optional[jnp.ndarray] = None,
                 clip_text_attention_mask: Optional[jnp.ndarray] = None,
                 *, train: bool = False, return_embeddings: bool = False):
        vision_features = None
        if self.vision_model_name and image is not None:
            _, vision_features = self.vision_encoder(image)
        language_features = None
        if self.language_model_name and text_input_ids is not None:
            _, language_features = self.language_encoder(
                text_input_ids, text_attention_mask)
        clip_text_features = None
        if self.use_clip_text and clip_text_input_ids is not None:
            _, clip_text_features = self.clip_text_encoder(
                clip_text_input_ids, clip_text_attention_mask)
        return self.scorer(
            user_idx, item_idx, tag_idx,
            vision_features=vision_features,
            language_features=language_features,
            numerical_features=numerical_features,
            clip_text_features=clip_text_features,
            train=train, return_embeddings=return_embeddings)


def build_end_to_end_model(model_config: ModelConfig, n_users: int,
                           n_items: int, n_tags: int,
                           num_numerical_features: int,
                           encoder_dtype=jnp.float32,
                           remat_encoders: bool = False
                           ) -> EndToEndRecommender:
    scorer = build_model(model_config, n_users, n_items, n_tags,
                         num_numerical_features)
    return EndToEndRecommender(
        scorer=scorer,
        vision_model_name=model_config.vision_model,
        language_model_name=model_config.language_model,
        use_clip_text=scorer.contrastive_active,
        encoder_dtype=encoder_dtype,
        remat_encoders=remat_encoders)


def trainable_mask(params: Dict, freeze_vision: bool = True,
                   freeze_language: bool = True) -> Dict:
    """Bool pytree: False on frozen encoder subtrees.

    The CLIP text tower follows freeze_vision (the reference freezes it with
    the vision model, multimodal.py:234-236).
    """
    import jax

    def label(path_key, leaf):
        top = str(path_key[0].key) if path_key else ''
        if top == 'vision_encoder':
            return not freeze_vision
        if top == 'clip_text_encoder':
            return not freeze_vision
        if top == 'language_encoder':
            return not freeze_language
        return True

    return jax.tree_util.tree_map_with_path(label, params)
