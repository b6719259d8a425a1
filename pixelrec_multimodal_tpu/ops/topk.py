# pixelrec_multimodal_tpu/ops/topk.py
"""Top-K selection primitives for catalog-scale ranking.

The reference sorts full python lists of (item, score) tuples on the host
(/root/reference/src/inference/recommender.py:96-106). Here top-K runs on
device: ``jax.lax.top_k`` per user row, a streaming merge for chunked catalog
scans (exact top-K without materializing the [users, items] matrix), and a
shard-local top-K + gather pattern for mesh-sharded catalogs (SURVEY.md §5.7's
replacement design for the catalog axis).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Python float, NOT jnp.float32(...): a module-level device array would
# initialize the JAX backend at import time, before CLIs can select a
# platform (it froze the platform to axon/1-CPU-device and broke
# --device cpu + simulated-mesh runs).
NEG_INF = -1e30


def topk_2d(scores: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-wise top-k of a [B, N] score matrix -> (values, indices)."""
    return jax.lax.top_k(scores, k)


def merge_topk(values_a: jnp.ndarray, idx_a: jnp.ndarray,
               values_b: jnp.ndarray, idx_b: jnp.ndarray,
               k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge two per-row candidate sets into the row-wise top-k.

    Used as the combiner of the streaming catalog scan: carry the running
    top-k, merge each newly scored chunk. Selection uses
    ``lax.approx_max_k(recall_target=1.0)`` — exact per its contract, but
    lowered to TPU's two-stage PartialReduce instead of a full per-row
    sort (measured: the lax.top_k merge cost the headline scan ~0.6ns per
    scored pair at chunk 8192, k 50; profile_scorer.py topk_full vs
    topk_k1). Tie-breaking order may differ from lax.top_k — ranking is
    over continuous scores where exact ties are measure-zero.
    """
    cat_v = jnp.concatenate([values_a, values_b], axis=-1)
    cat_i = jnp.concatenate([idx_a, idx_b], axis=-1)
    v, pos = jax.lax.approx_max_k(cat_v, k, recall_target=1.0)
    i = jnp.take_along_axis(cat_i, pos, axis=-1)
    return v, i


def init_topk(batch: int, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Neutral running-top-k carry: -inf scores, -1 indices."""
    return (jnp.full((batch, k), NEG_INF, jnp.float32),
            jnp.full((batch, k), -1, jnp.int32))


def sharded_topk(scores: jnp.ndarray, k: int, axis_name: str
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact global top-k over an item axis sharded across ``axis_name``.

    For use inside shard_map: each shard computes its local top-k over its
    [B, N/shards] slice, the (k per shard) candidates are all-gathered over
    ICI, and a final top-k merges them. Communication is O(shards * k) per row
    instead of O(N).

    ``scores`` is the local shard [B, N_local]; returned indices are global
    (offset by the shard's position).
    """
    n_local = scores.shape[-1]
    shard = jax.lax.axis_index(axis_name)
    # Same exact-but-faster selection as merge_topk (PartialReduce).
    local_v, local_i = jax.lax.approx_max_k(scores, min(k, n_local),
                                            recall_target=1.0)
    local_i = local_i + shard * n_local
    all_v = jax.lax.all_gather(local_v, axis_name, axis=-1, tiled=True)
    all_i = jax.lax.all_gather(local_i, axis_name, axis=-1, tiled=True)
    v, pos = jax.lax.top_k(all_v, k)
    return v, jnp.take_along_axis(all_i, pos, axis=-1)
