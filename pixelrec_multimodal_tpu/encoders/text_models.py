# pixelrec_multimodal_tpu/encoders/text_models.py
"""Flax text encoders: BERT family (bert / MiniLM / RoBERTa) and MPNet.

Parity targets (reference loads these via ``AutoModel``,
/root/reference/src/models/multimodal.py:238-250; feature extraction prefers
``pooler_output`` and falls back to mean pooling, :456-470):

  * bert-base-uncased, sentence-transformers/all-MiniLM-L6-v2 — post-LN
    transformer with absolute positions + token types + tanh pooler.
  * roberta-base — same body, position ids offset past the padding index
    (padding_idx=1), no effective token types.
  * sentence-transformers/all-mpnet-base-v2 — RoBERTa-style embeddings plus a
    shared T5-style relative attention bias added in every layer.

All four produce (last_hidden_state, pooler_output); pooler is
tanh(Dense(cls)) exactly as HF.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import (
    MultiHeadSelfAttention,
    create_position_ids_from_input_ids,
    get_activation,
    padding_attention_bias,
)


@dataclass(frozen=True)
class TextEncoderConfig:
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = 'gelu'
    pad_token_id: int = 0
    # 'absolute' (BERT), 'absolute_offset' (RoBERTa/MPNet: ids start after
    # padding_idx), with optional T5-style relative bias (MPNet).
    position_style: str = 'absolute'
    use_relative_bias: bool = False
    relative_num_buckets: int = 32
    relative_max_distance: int = 128


# Configurations of the four supported checkpoints.
TEXT_CONFIGS = {
    'bert': TextEncoderConfig(vocab_size=30522, hidden_size=768, num_layers=12,
                              num_heads=12, intermediate_size=3072),
    'sentence-bert': TextEncoderConfig(vocab_size=30522, hidden_size=384,
                                       num_layers=6, num_heads=12,
                                       intermediate_size=1536),
    'roberta': TextEncoderConfig(vocab_size=50265, hidden_size=768,
                                 num_layers=12, num_heads=12,
                                 intermediate_size=3072,
                                 max_position_embeddings=514,
                                 type_vocab_size=1, layer_norm_eps=1e-5,
                                 pad_token_id=1,
                                 position_style='absolute_offset'),
    'mpnet': TextEncoderConfig(vocab_size=30527, hidden_size=768,
                               num_layers=12, num_heads=12,
                               intermediate_size=3072,
                               max_position_embeddings=514,
                               type_vocab_size=0, layer_norm_eps=1e-5,
                               pad_token_id=1,
                               position_style='absolute_offset',
                               use_relative_bias=True),
}


class TransformerLayer(nn.Module):
    """Post-LN transformer block (BERT/MPNet layout)."""
    config: TextEncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        c = self.config
        attn_out = MultiHeadSelfAttention(
            c.hidden_size, c.num_heads, dtype=self.dtype,
            name='attention')(x, bias)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                         name='attention_norm')(x + attn_out)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype,
                     name='intermediate')(x)
        h = get_activation(c.hidden_act)(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name='output')(h)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name='output_norm')(x + h)
        return x


def relative_position_bucket(relative_position: jnp.ndarray,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> jnp.ndarray:
    """T5 bidirectional relative position bucketing (HF MPNet semantics)."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    num_buckets //= 2
    ret += (n < 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class TextTransformer(nn.Module):
    """BERT-family / MPNet text encoder with tanh pooler."""
    config: TextEncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.config
        B, T = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, T), jnp.int32)

        word = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                        name='word_embeddings')(input_ids)
        if c.position_style == 'absolute_offset':
            position_ids = create_position_ids_from_input_ids(
                input_ids, c.pad_token_id)
        else:
            position_ids = jnp.broadcast_to(
                jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       dtype=self.dtype, name='position_embeddings')(position_ids)
        x = word + pos
        if c.type_vocab_size > 0:
            tok_type = jnp.zeros((B, T), jnp.int32)
            x = x + nn.Embed(c.type_vocab_size, c.hidden_size,
                             dtype=self.dtype,
                             name='token_type_embeddings')(tok_type)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name='embeddings_norm')(x)

        bias = padding_attention_bias(attention_mask, dtype=jnp.float32)
        if c.use_relative_bias:
            ctx = jnp.arange(T)[:, None]
            mem = jnp.arange(T)[None, :]
            buckets = relative_position_bucket(
                mem - ctx, c.relative_num_buckets, c.relative_max_distance)
            rel = nn.Embed(c.relative_num_buckets, c.num_heads,
                           dtype=jnp.float32,
                           name='relative_attention_bias')(buckets)
            bias = bias + rel.transpose(2, 0, 1)[None]  # (1, heads, T, T)

        for i in range(c.num_layers):
            x = TransformerLayer(c, dtype=self.dtype, name=f'layer_{i}')(x, bias)

        pooled = nn.Dense(c.hidden_size, dtype=self.dtype,
                          name='pooler')(x[:, 0])
        pooled = nn.tanh(pooled)
        return x, pooled

    def pooled(self, input_ids, attention_mask=None) -> jnp.ndarray:
        """The feature the recommender consumes (reference multimodal.py:
        456-470: pooler_output when present — true for all four models)."""
        _, pooled = self(input_ids, attention_mask)
        return pooled


def build_text_encoder(model_key: str, dtype=jnp.float32) -> TextTransformer:
    if model_key not in TEXT_CONFIGS:
        raise ValueError(f"Unknown language model key: {model_key}")
    return TextTransformer(TEXT_CONFIGS[model_key], dtype=dtype)
