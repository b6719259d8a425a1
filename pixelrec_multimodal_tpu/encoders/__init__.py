"""Flax encoder zoo: the reference's 8 frozen HF backbones, TPU-native."""
from .registry import (  # noqa: F401
    build_clip_text_encoder,
    build_language_encoder,
    build_vision_encoder,
    pooled_dim,
)
