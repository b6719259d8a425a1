# pixelrec_multimodal_tpu/encoders/precompute.py
"""Batched, mesh-sharded encoder forwards -> item embedding tables.

This is the TPU-native replacement for the reference's per-item serial CPU
cache build (/root/reference/scripts/precompute_cache.py:120-132) and the
design BASELINE.json's north star prescribes: frozen encoders run ONCE over
the catalog as large batched forwards (batch axis sharded over the mesh's
'data' dimension), producing float32 tables

    vision_emb    [n_items, dim_v]
    language_emb  [n_items, dim_l]
    clip_text_emb [n_items, 512]     (vision == 'clip')

that training and full-catalog scoring gather from (training/steps.py,
inference/scorer.py). Host work is only JPEG decode + batching; resize/
normalize math and the encoder forwards are compiled XLA.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np

from ..data.processors.image_processor import PREPROCESS_SPECS
from .convert import load_pretrained_params
from .registry import (
    build_clip_text_encoder,
    build_language_encoder,
    build_vision_encoder,
    pooled_dim,
)


def _device_put_batch(arr, mesh):
    import jax
    if mesh is None:
        return arr
    from ..parallel.mesh import batch_sharding
    return jax.device_put(arr, batch_sharding(mesh))


def _batched_pooled(apply_fn, inputs: List[np.ndarray], n_items: int,
                    out_dim: int, batch_size: int, mesh,
                    make_batch) -> np.ndarray:
    """Run apply_fn over the catalog in static-shape batches.

    The NEXT batch's host work (JPEG decode + host->device transfer in
    ``make_batch``) is prefetched on a worker thread while the device
    runs the current forward — without this the image path serializes
    decode, transfer and compute (measured 173 items/s for ResNet-50
    through the dev tunnel; transfers dominate there).
    """
    from concurrent.futures import ThreadPoolExecutor

    def staged(start):
        idx = np.arange(start, min(start + batch_size, n_items))
        valid = len(idx)
        if valid < batch_size:  # pad to static shape
            idx = np.concatenate(
                [idx, np.zeros(batch_size - valid, dtype=idx.dtype)])
        batch_inputs = make_batch(idx)
        return [_device_put_batch(b, mesh) for b in batch_inputs], valid

    out = np.zeros((n_items, out_dim), dtype=np.float32)
    starts = list(range(0, n_items, batch_size))
    if not starts:  # empty catalog: nothing to prefetch
        return out
    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(staged, starts[0])
        for i, start in enumerate(starts):
            batch_inputs, valid = fut.result()
            if i + 1 < len(starts):
                fut = ex.submit(staged, starts[i + 1])
            pooled = np.asarray(apply_fn(*batch_inputs))
            out[start:start + valid] = pooled[:valid]
    return out


def params_or_random(modality: str, model_key: str, module, example_args,
                     rng_seed: int = 0) -> Dict:
    """Pretrained params from a local HF cache, else random init with a loud
    warning (zero-egress environments)."""
    import jax

    params = load_pretrained_params(modality, model_key)
    if params is not None:
        print(f"Loaded pretrained weights for {modality}/{model_key}")
        return params
    print(f"WARNING: no local pretrained weights for {modality}/{model_key}; "
          "using random initialization. Embeddings will not match the "
          "reference's pretrained features.")
    variables = module.init(jax.random.PRNGKey(rng_seed), *example_args)
    return variables['params']


def precompute_embedding_tables(store, config, batch_size: int = 64,
                                mesh=None, dtype=None) -> List[str]:
    """Fill a feature store's encoder-embedding tables. Returns table names
    added. ``store`` is a data.feature_store.ItemFeatureStore."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    added: List[str] = []
    n = store.n_items
    vision_key = config.model.vision_model
    language_key = config.model.language_model

    # ------------------------------------------------------------- language
    if language_key and 'text_input_ids' in store.tables:
        model = build_language_encoder(language_key, dtype=dtype)
        ids_t = store.tables['text_input_ids']
        mask_t = store.tables['text_attention_mask']
        params = params_or_random(
            'language', language_key, model,
            (ids_t[:1].astype(np.int32), mask_t[:1].astype(np.int32)))
        # Params go through the jit boundary as an argument (not a closure
        # capture) so they are not baked into the compile payload.
        jit_pooled = jax.jit(
            lambda p, ids, mask: model.apply({'params': p}, ids, mask,
                                             method='pooled'))
        pooled_fn = lambda ids, mask: jit_pooled(params, ids, mask)
        t0 = time.time()
        table = _batched_pooled(
            pooled_fn, [], n, pooled_dim('language', language_key),
            batch_size, mesh,
            lambda idx: (jnp.asarray(ids_t[idx]), jnp.asarray(mask_t[idx])))
        store.set_embedding_table('language_emb', table)
        added.append('language_emb')
        print(f"language_emb: {n} items in {time.time() - t0:.1f}s")

    # --------------------------------------------------------------- vision
    if vision_key and store.image_folder:
        spec = PREPROCESS_SPECS[vision_key]
        model = build_vision_encoder(vision_key, dtype=dtype)
        example = jnp.zeros((1, 3, spec.crop_size, spec.crop_size),
                            jnp.float32)
        params = params_or_random('vision', vision_key, model, (example,))
        mean = jnp.asarray(spec.mean, jnp.float32).reshape(1, 1, 1, 3)
        std = jnp.asarray(spec.std, jnp.float32).reshape(1, 1, 1, 3)

        def forward(p, frames_u8):
            # Device-side normalize: uint8 HWC -> normalized CHW float.
            x = frames_u8.astype(jnp.float32) / 255.0
            x = ((x - mean) / std).transpose(0, 3, 1, 2)
            return model.apply({'params': p}, x, method='pooled')

        jit_forward = jax.jit(forward)
        pooled_fn = lambda frames: jit_forward(params, frames)
        t0 = time.time()
        table = _batched_pooled(
            pooled_fn, [], n, pooled_dim('vision', vision_key),
            batch_size, mesh,
            lambda idx: (jnp.asarray(store.image_batch_uint8(idx)),))
        store.set_embedding_table('vision_emb', table)
        added.append('vision_emb')
        print(f"vision_emb: {n} items in {time.time() - t0:.1f}s")

    # ------------------------------------------------------------ clip text
    if vision_key == 'clip' and 'clip_text_input_ids' in store.tables:
        model = build_clip_text_encoder(dtype=dtype)
        ids_t = store.tables['clip_text_input_ids']
        mask_t = store.tables['clip_text_attention_mask']
        params = params_or_random(
            'clip_text', 'clip', model, (ids_t[:1].astype(np.int32),))
        jit_pooled = jax.jit(
            lambda p, ids, mask: model.apply({'params': p}, ids, mask,
                                             method='pooled'))
        pooled_fn = lambda ids, mask: jit_pooled(params, ids, mask)
        t0 = time.time()
        table = _batched_pooled(
            pooled_fn, [], n, pooled_dim('clip_text', 'clip'),
            batch_size, mesh,
            lambda idx: (jnp.asarray(ids_t[idx]), jnp.asarray(mask_t[idx])))
        store.set_embedding_table('clip_text_emb', table)
        added.append('clip_text_emb')
        print(f"clip_text_emb: {n} items in {time.time() - t0:.1f}s")

    return added
