# pixelrec_multimodal_tpu/encoders/common.py
"""Shared building blocks for the Flax encoder zoo.

The zoo reimplements the reference's eight frozen Hugging Face backbones
(/root/reference/src/config.py:18-31; loaded at
/root/reference/src/models/multimodal.py:207-250) as native Flax modules so
encoder forwards run as compiled XLA programs on TPU. Weight layouts follow
the HF checkpoints so encoders/convert.py can map parameters one-to-one.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * nn.sigmoid(1.702 * x)


ACT2FN = {
    'gelu': lambda x: nn.gelu(x, approximate=False),
    'gelu_new': lambda x: nn.gelu(x, approximate=True),
    'quick_gelu': quick_gelu,
    'relu': nn.relu,
    'silu': nn.silu,
    'tanh': nn.tanh,
}


def get_activation(name: str) -> Callable:
    return ACT2FN.get(name, ACT2FN['gelu'])


class MultiHeadSelfAttention(nn.Module):
    """Standard multi-head self-attention with separate q/k/v/out projections
    (HF weight layout: q/k/v/out each [hidden, hidden] + bias)."""
    hidden_size: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x: (B, T, H). bias: additive attention bias broadcastable to
        (B, heads, T, T) — used for padding masks, causal masks, and MPNet's
        relative position bias."""
        B, T, H = x.shape
        d = H // self.num_heads
        q = nn.Dense(H, dtype=self.dtype, name='query')(x)
        k = nn.Dense(H, dtype=self.dtype, name='key')(x)
        v = nn.Dense(H, dtype=self.dtype, name='value')(x)
        q = q.reshape(B, T, self.num_heads, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, self.num_heads, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, self.num_heads, d).transpose(0, 2, 1, 3)
        scores = jnp.einsum('bhqd,bhkd->bhqk', q, k) / jnp.sqrt(
            jnp.asarray(d, x.dtype))
        if bias is not None:
            scores = scores + bias
        weights = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum('bhqk,bhkd->bhqd', weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, H)
        return nn.Dense(H, dtype=self.dtype, name='out')(out)


def padding_attention_bias(attention_mask: jnp.ndarray,
                           dtype=jnp.float32) -> jnp.ndarray:
    """(B, T) 1/0 mask -> additive bias (B, 1, 1, T) with -inf on pads
    (HF's extended attention mask)."""
    bias = (1.0 - attention_mask.astype(dtype)) * jnp.asarray(-1e9, dtype)
    return bias[:, None, None, :]


def causal_attention_bias(T: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 1, T, T) lower-triangular causal bias."""
    mask = jnp.tril(jnp.ones((T, T), bool))
    return jnp.where(mask, 0.0, -1e9).astype(dtype)[None, None]


def create_position_ids_from_input_ids(input_ids: jnp.ndarray,
                                       padding_idx: int) -> jnp.ndarray:
    """RoBERTa/MPNet position ids: pads keep padding_idx, real tokens count
    from padding_idx + 1 (HF create_position_ids_from_input_ids)."""
    mask = (input_ids != padding_idx).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + padding_idx
