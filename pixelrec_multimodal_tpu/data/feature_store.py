# pixelrec_multimodal_tpu/data/feature_store.py
"""Catalog-aligned item feature tables — the device-resident feature store.

TPU-native replacement for the reference's per-item LRU/disk cache
(/root/reference/src/data/simple_cache.py:17-235) and the intent of its stale
FeatureCacheProcessor (feature_cache_processor.py:16-186). Instead of caching
per-item tensor dicts on the host and collating per sample, every item-side
feature lives in one table indexed by the item encoder's integer ids:

    tag_idx        int32  [n_items]
    numerical      float32[n_items, F]
    text tokens    int32  [n_items, L] (+ attention mask)
    clip tokens    int32  [n_items, 77] (+ mask, when vision == 'clip')
    vision_emb     float32[n_items, Dv]   (packed by encoders/precompute)
    language_emb   float32[n_items, Dl]
    clip_text_emb  float32[n_items, 512]
    images         uint8  [n_items, H, W, 3] (lazy decode, bounded cache)

Tables move to HBM once (optionally sharded over the mesh 'model' axis); the
compiled train/score step gathers rows by item index on device. Disk tier is a
single .npz per (vision, language) model combo under
``<cache_dir>/vision_<v>_lang_<l>/`` — the same directory contract as the
reference (simple_cache.py:51-61).
"""
from __future__ import annotations

import os
import threading
from collections import OrderedDict
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..config import MODEL_CONFIGS
from .processors.image_processor import (
    ImageProcessor,
    PREPROCESS_SPECS,
    normalize_chw,
)
from .processors.numerical_processor import NumericalProcessor
from .tokenization import (
    CLIP_TEXT_MAX_LENGTH,
    batch_encode,
    get_clip_tokenizer,
    get_tokenizer,
)


def cache_subdir_name(vision_model: Optional[str],
                      language_model: Optional[str]) -> str:
    """Model-combo cache directory name (reference simple_cache.py:51-61)."""
    return f"vision_{vision_model or 'none'}_lang_{language_model or 'none'}"


class ItemFeatureStore:
    """Immutable-after-build item feature tables plus a lazy image tier."""

    def __init__(self, n_items: int, item_ids: np.ndarray,
                 vision_model: Optional[str] = None,
                 language_model: Optional[str] = None,
                 image_folder: Optional[str] = None,
                 max_image_cache_items: int = 1000,
                 decode_workers: Optional[int] = None):
        self.n_items = n_items
        self.item_ids = np.asarray(item_ids).astype(str)  # idx -> original id
        self.vision_model = vision_model
        self.language_model = language_model
        self.image_folder = image_folder
        self.tables: Dict[str, np.ndarray] = {}
        self._image_processor = (
            ImageProcessor(model_name=vision_model) if vision_model else None)
        self._image_cache: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self._max_image_cache_items = max_image_cache_items
        self._hits = 0
        self._misses = 0
        # Concurrent JPEG decode for the raw-input (unfrozen-encoder) path:
        # PIL releases the GIL, so a thread pool overlaps decodes the way the
        # reference's DataLoader worker processes do (reference
        # scripts/train.py:105-126, workers = min(cfg, cpu, 8)).
        self._decode_workers = (decode_workers if decode_workers is not None
                                else min(8, os.cpu_count() or 1))
        self._image_lock = threading.Lock()
        self._decode_pool = None

    # -------------------------------------------------------- pickling/threads
    def __getstate__(self):
        state = self.__dict__.copy()
        state['_image_lock'] = None
        state['_decode_pool'] = None
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._image_lock = threading.Lock()
        self._decode_pool = None

    def _get_decode_pool(self):
        if self._decode_workers < 2:
            return None
        if self._decode_pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._decode_pool = ThreadPoolExecutor(
                max_workers=self._decode_workers,
                thread_name_prefix='pixelrec-decode')
        return self._decode_pool

    # ----------------------------------------------------------------- build
    @classmethod
    def build(cls, item_info_df, item_encoder, tag_encoder=None,
              vision_model: Optional[str] = None,
              language_model: Optional[str] = None,
              image_folder: Optional[str] = None,
              numerical_processor: Optional[NumericalProcessor] = None,
              text_column: str = 'description',
              tokenize_text: bool = True,
              max_text_length: Optional[int] = None,
              max_image_cache_items: int = 1000) -> 'ItemFeatureStore':
        """Pack all cheap modalities eagerly, aligned to the item encoder.

        Items in the encoder but missing from ``item_info_df`` get placeholder
        rows (tag 0, zero numerical, empty text) — the reference's
        placeholder-features fallback (dataset.py:306-322) expressed as table
        defaults.
        """
        item_ids = np.asarray(item_encoder.classes_).astype(str)
        n_items = len(item_ids)
        store = cls(n_items, item_ids, vision_model, language_model,
                    image_folder, max_image_cache_items)

        info = item_info_df.copy()
        info['item_id'] = info['item_id'].astype(str)
        info = info.drop_duplicates('item_id').set_index('item_id')
        present = info.index.intersection(item_ids)
        # Map catalog position -> row of info (or -1 for missing metadata).
        pos_of = {iid: i for i, iid in enumerate(item_ids)}
        rows = np.full(n_items, -1, dtype=np.int64)
        for iid in present:
            rows[pos_of[iid]] = info.index.get_loc(iid)

        # --- tag table
        tag_idx = np.zeros(n_items, dtype=np.int32)
        if tag_encoder is not None and 'tag' in info.columns:
            tags = info['tag'].fillna('unknown').astype(str).to_numpy()
            known = set(map(str, tag_encoder.classes_))
            safe = np.array([t if t in known else None for t in tags], dtype=object)
            enc = np.zeros(len(tags), dtype=np.int64)
            mask = np.array([s is not None for s in safe])
            if mask.any():
                enc[mask] = tag_encoder.transform(safe[mask].astype(str))
            valid = rows >= 0
            tag_idx[valid] = enc[rows[valid]].astype(np.int32)
        store.tables['tag_idx'] = tag_idx

        # --- numerical table
        if numerical_processor is not None and numerical_processor.numerical_cols:
            mat = numerical_processor.transform_matrix(info.reset_index())
            F = mat.shape[1]
            table = np.zeros((n_items, F), dtype=np.float32)
            valid = rows >= 0
            table[valid] = mat[rows[valid]]
            store.tables['numerical'] = table

        # --- token tables
        if language_model and tokenize_text:
            tok = get_tokenizer(language_model, max_length=max_text_length)
            texts = cls._texts_for(info, rows, text_column)
            enc = batch_encode(tok, texts)
            store.tables['text_input_ids'] = enc['input_ids']
            store.tables['text_attention_mask'] = enc['attention_mask']
        if vision_model == 'clip' and tokenize_text:
            ctok = get_clip_tokenizer()
            texts = cls._texts_for(info, rows, text_column)
            enc = batch_encode(ctok, texts, CLIP_TEXT_MAX_LENGTH)
            store.tables['clip_text_input_ids'] = enc['input_ids']
            store.tables['clip_text_attention_mask'] = enc['attention_mask']

        return store

    @staticmethod
    def _texts_for(info, rows: np.ndarray, text_column: str) -> List[str]:
        if text_column in info.columns:
            col = info[text_column].fillna('').astype(str).to_numpy()
        else:
            col = np.full(len(info), '', dtype=object)
        return ['' if r < 0 else str(col[r]) for r in rows]

    # ------------------------------------------------------------ embeddings
    def set_embedding_table(self, name: str, table: np.ndarray):
        """Install a precomputed encoder-output table
        ('vision_emb' | 'language_emb' | 'clip_text_emb')."""
        if table.shape[0] != self.n_items:
            raise ValueError(
                f"table rows {table.shape[0]} != n_items {self.n_items}")
        self.tables[name] = np.asarray(table)

    def has(self, name: str) -> bool:
        return name in self.tables

    # ---------------------------------------------------------------- images
    def get_image(self, item_pos: int) -> np.ndarray:
        """Normalized float32 CHW pixels for one catalog position (lazy,
        LRU-bounded). Zero placeholder when missing/undecodable."""
        if self._image_processor is None:
            raise RuntimeError("No vision model configured for this store.")
        with self._image_lock:
            if item_pos in self._image_cache:
                self._hits += 1
                self._image_cache.move_to_end(item_pos)
                return self._image_cache[item_pos]
            self._misses += 1
        path = f"{self.image_folder}/{self.item_ids[item_pos]}.jpg"
        img = self._image_processor.load_and_transform_image(path)
        self._cache_put(item_pos, img)
        return img

    def _cache_put(self, item_pos: int, img: np.ndarray):
        with self._image_lock:
            self._image_cache[item_pos] = img
            if len(self._image_cache) > self._max_image_cache_items:
                self._image_cache.popitem(last=False)

    def _ensure_images_cached(self, positions: List[int]):
        """Decode cache-missing positions concurrently."""
        with self._image_lock:
            missing = sorted({p for p in positions
                              if p not in self._image_cache})
        pool = self._get_decode_pool()
        if pool is None or len(missing) < 2:
            return

        def decode(p):
            return p, self._image_processor.load_and_transform_image(
                f"{self.image_folder}/{self.item_ids[p]}.jpg")

        for p, img in pool.map(decode, missing):
            self._misses += 1
            self._cache_put(p, img)

    def image_batch(self, item_pos: np.ndarray) -> np.ndarray:
        """Stacked normalized pixels for a batch of catalog positions.

        Cache misses decode in parallel on the thread pool before the
        (cache-hitting) stack pass.
        """
        positions = [int(i) for i in item_pos]
        self._ensure_images_cached(positions)
        return np.stack([self.get_image(i) for i in positions])

    def image_batch_uint8(self, item_pos: np.ndarray) -> np.ndarray:
        """Raw uint8 HWC frames (device-side normalization path); decodes
        run concurrently on the thread pool."""
        spec = PREPROCESS_SPECS[self.vision_model]
        positions = [int(i) for i in item_pos]
        out = np.zeros((len(positions), spec.crop_size, spec.crop_size, 3),
                       dtype=np.uint8)

        def decode(i):
            return self._image_processor.load_image_uint8(
                f"{self.image_folder}/{self.item_ids[i]}.jpg")

        pool = self._get_decode_pool()
        frames = (pool.map(decode, positions) if pool is not None
                  else map(decode, positions))
        for j, frame in enumerate(frames):
            if frame is not None:
                out[j] = frame
        return out

    def get_stats(self) -> Dict[str, float]:
        """Image-tier hit/miss statistics (reference simple_cache.py:207-226)."""
        total = self._hits + self._misses
        return {
            'memory_items': len(self._image_cache),
            'hits': self._hits,
            'misses': self._misses,
            'hit_rate': self._hits / total if total else 0.0,
        }

    # ------------------------------------------------------------- per-item
    def item_features(self, item_pos: int, include_image: bool = True
                      ) -> Dict[str, np.ndarray]:
        """Per-item feature dict in the reference's batch schema
        (dataset.py:243-303) — compatibility path for per-sample access."""
        out: Dict[str, np.ndarray] = {}
        if self.vision_model and include_image:
            out['image'] = self.get_image(item_pos)
        for key in ('text_input_ids', 'text_attention_mask',
                    'clip_text_input_ids', 'clip_text_attention_mask'):
            if key in self.tables:
                out[key] = self.tables[key][item_pos]
        if 'numerical' in self.tables:
            out['numerical_features'] = self.tables['numerical'][item_pos]
        out['tag_idx'] = self.tables['tag_idx'][item_pos]
        return out

    # ------------------------------------------------------------------ disk
    def save(self, cache_dir: str):
        """Persist packed tables as one .npz under the model-combo subdir."""
        d = Path(cache_dir) / cache_subdir_name(self.vision_model,
                                                self.language_model)
        d.mkdir(parents=True, exist_ok=True)
        np.savez(d / 'feature_tables.npz', item_ids=self.item_ids, **self.tables)

    def load_tables(self, cache_dir: str) -> bool:
        """Load previously packed tables if present and catalog-compatible."""
        path = Path(cache_dir) / cache_subdir_name(
            self.vision_model, self.language_model) / 'feature_tables.npz'
        if not path.exists():
            return False
        with np.load(path, allow_pickle=False) as z:
            if 'item_ids' not in z or len(z['item_ids']) != self.n_items or \
                    not np.array_equal(z['item_ids'].astype(str), self.item_ids):
                return False
            for k in z.files:
                if k != 'item_ids':
                    self.tables[k] = z[k]
        return True

    # ---------------------------------------------------------------- device
    def device_tables(self, keys: Optional[List[str]] = None, mesh=None,
                      shard_items: bool = False, pack: bool = False,
                      dtype=None) -> Dict[str, 'object']:
        """Put the requested tables on device (jnp arrays).

        With a mesh and ``shard_items``, the item axis is sharded over the
        'model' mesh axis; otherwise tables are replicated.

        ``pack=True`` concatenates the float feature tables along the
        feature axis into ONE ``packed::<a>+<b>+...`` table (layout carried
        in the key; see training/steps.py gather_feature_kwargs). TPU row
        gathers are per-row-cost-bound, so one wide gather beats one per
        table — measured 3x on the gather term of the frozen train step
        (scripts/profile_frozen_roofline.py). ``dtype`` casts the float
        tables at upload (bf16 is compile-identical for a bf16-dtype model:
        its first Dense casts the gathered f32 rows to bf16 anyway).
        """
        import jax
        import jax.numpy as jnp
        from ..parallel.mesh import item_table_sharding, replicated

        keys = keys if keys is not None else list(self.tables)
        host = {k: self.tables[k] for k in keys}
        if pack:
            float_keys = [k for k in ('vision_emb', 'language_emb',
                                      'numerical', 'clip_text_emb')
                          if k in host and host[k].ndim == 2]
            if len(float_keys) > 1:
                layout = '+'.join(
                    f'{k}={host[k].shape[1]}' for k in float_keys)
                packed = np.concatenate(
                    [host.pop(k).astype(np.float32) for k in float_keys],
                    axis=1)
                host['packed::' + layout] = packed

        out = {}
        for k, arr_np in host.items():
            arr = jnp.asarray(arr_np)
            if dtype is not None and arr.dtype == jnp.float32:
                arr = arr.astype(dtype)
            if mesh is not None:
                sh = item_table_sharding(mesh) if shard_items else replicated(mesh)
                arr = jax.device_put(arr, sh)
            out[k] = arr
        return out


def model_feature_dims(vision_model: Optional[str],
                       language_model: Optional[str]) -> Dict[str, int]:
    """Raw encoder output dims for a model combo."""
    out = {}
    if vision_model:
        out['vision'] = MODEL_CONFIGS['vision'][vision_model]['dim']
    if language_model:
        out['language'] = MODEL_CONFIGS['language'][language_model]['dim']
    return out
