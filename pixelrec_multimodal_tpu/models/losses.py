# pixelrec_multimodal_tpu/models/losses.py
"""Loss functions (pure JAX, jit-safe).

Parity targets: /root/reference/src/models/losses.py — ContrastiveLoss
(:16-79, symmetric InfoNCE) and MultimodalRecommenderLoss (:82-174, weighted
BCE + contrastive with NaN propagation). All branching is value-level
(jnp.where), so a single compiled graph covers finite and non-finite batches —
the host decides whether to apply the update (see training/trainer.py).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def contrastive_loss(image_features: jnp.ndarray, text_features: jnp.ndarray,
                     temperature: jnp.ndarray | float = 0.07,
                     weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Symmetric CLIP-style InfoNCE over a batch of aligned pairs.

    ``weight`` (0/1 per row) excludes padded rows from both softmax directions
    — needed because compiled steps use static batch shapes with masked tails.
    """
    img = l2_normalize(image_features)
    txt = l2_normalize(text_features)
    logits = img @ txt.T / temperature
    if weight is not None:
        neg = jnp.asarray(-1e9, logits.dtype)
        logits = jnp.where(weight[None, :] > 0, logits, neg)  # mask columns
        logits = jnp.where(weight[:, None] > 0, logits, neg)  # mask rows
    diag = jnp.diagonal(logits)
    lse_rows = jax.nn.logsumexp(logits, axis=1)
    lse_cols = jax.nn.logsumexp(logits, axis=0)
    if weight is None:
        loss_i2t = jnp.mean(lse_rows - diag)
        loss_t2i = jnp.mean(lse_cols - diag)
    else:
        denom = jnp.maximum(jnp.sum(weight), 1.0)
        loss_i2t = jnp.sum(weight * (lse_rows - diag)) / denom
        loss_t2i = jnp.sum(weight * (lse_cols - diag)) / denom
    return (loss_i2t + loss_t2i) / 2


def recommender_loss(
    predictions: jnp.ndarray,
    labels: jnp.ndarray,
    vision_features: Optional[jnp.ndarray] = None,
    text_features: Optional[jnp.ndarray] = None,
    temperature: jnp.ndarray | float = 0.07,
    use_contrastive: bool = True,
    contrastive_weight: float = 0.1,
    bce_weight: float = 1.0,
    weight: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Weighted BCE (+ optional contrastive) with the reference's NaN contract.

    predictions are post-sigmoid probabilities; clamped to [1e-7, 1-1e-7]
    before the log (reference losses.py:148-153). If any prediction is
    non-finite, total and bce become NaN and contrastive 0 (reference
    :139-146) — the host-side trainer skips the update for such batches.
    """
    eps = 1e-7
    p = jnp.clip(predictions, eps, 1.0 - eps)
    per_example = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log1p(-p))
    if weight is None:
        bce = jnp.mean(per_example)
    else:
        bce = jnp.sum(weight * per_example) / jnp.maximum(jnp.sum(weight), 1.0)

    has_contrastive = (use_contrastive and vision_features is not None
                       and text_features is not None)
    if has_contrastive:
        contr = contrastive_loss(vision_features, text_features, temperature,
                                 weight=weight)
    else:
        contr = jnp.asarray(0.0, dtype=predictions.dtype)

    total = bce_weight * bce + contrastive_weight * contr

    finite = jnp.all(jnp.isfinite(predictions))
    nan = jnp.asarray(jnp.nan, dtype=predictions.dtype)
    return {
        'total': jnp.where(finite, total, nan),
        'bce': jnp.where(finite, bce, nan),
        'contrastive': jnp.where(finite, contr, jnp.asarray(0.0, predictions.dtype)),
    }
