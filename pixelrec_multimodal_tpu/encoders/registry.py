# pixelrec_multimodal_tpu/encoders/registry.py
"""Encoder zoo registry: build Flax encoder modules by MODEL_CONFIGS key.

Parity target: the reference's dispatch in
/root/reference/src/models/multimodal.py:207-250 (CLIPVisionModel /
Dinov2Model / AutoModel-resnet/convnext for vision, AutoModel for language,
CLIPTextModel for the contrastive stream). Every module exposes a ``pooled``
method producing the exact feature the reference's extraction logic yields
(multimodal.py:388-470).
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from ..config import MODEL_CONFIGS
from .clip import CLIPTextTower, CLIPVisionTower
from .convnext import ConvNextTower
from .dinov2 import Dinov2Tower
from .resnet import ResNetTower
from .text_models import TEXT_CONFIGS, TextTransformer, build_text_encoder


def build_vision_encoder(model_key: str, dtype=jnp.float32):
    """Vision tower for a MODEL_CONFIGS['vision'] key."""
    if model_key == 'clip':
        return CLIPVisionTower(dtype=dtype)
    if model_key == 'dino':
        return Dinov2Tower(dtype=dtype)
    if model_key == 'resnet':
        return ResNetTower(dtype=dtype)
    if model_key == 'convnext':
        return ConvNextTower(dtype=dtype)
    raise ValueError(f"Unknown vision model key: {model_key}")


def build_language_encoder(model_key: str, dtype=jnp.float32) -> TextTransformer:
    """Language tower for a MODEL_CONFIGS['language'] key."""
    return build_text_encoder(model_key, dtype=dtype)


def build_clip_text_encoder(dtype=jnp.float32) -> CLIPTextTower:
    """The CLIP text tower used for the contrastive stream."""
    return CLIPTextTower(dtype=dtype)


def pooled_dim(modality: str, model_key: str) -> int:
    """Output dim of the pooled feature, as registered in MODEL_CONFIGS."""
    if modality == 'clip_text':
        return MODEL_CONFIGS['vision']['clip']['text_dim']
    return MODEL_CONFIGS[modality][model_key]['dim']
