# pixelrec_multimodal_tpu/data/dataset.py
"""The multimodal interaction dataset.

Parity target: /root/reference/src/data/dataset.py:32-476 (MultimodalDataset).
Same responsibilities — drop interactions without item metadata, fit/accept
sklearn LabelEncoders for user/item/tag, generate negative samples, expose
per-sample feature dicts and user histories — with a TPU-native data flow:

  * Samples are flat numpy arrays (user_idx, item_idx, label), not DataFrame
    rows; batches carry only these index triples.
  * All item-side features live in an :class:`ItemFeatureStore` table keyed by
    catalog position — the compiled step gathers them on device, replacing the
    reference's per-sample host collate + LRU cache.
  * Negative sampling is the vectorized whole-population sampler in
    negative_sampling.py rather than a per-user setdiff loop.

``__getitem__`` still returns the reference's per-sample dict schema
(dataset.py:243-249) for compatibility with per-item inference paths & tests.
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np
import pandas as pd
from sklearn.preprocessing import LabelEncoder

from ..config import MODEL_CONFIGS
from .feature_store import ItemFeatureStore
from .negative_sampling import sample_negatives
from .processors.numerical_processor import NumericalProcessor


class MultimodalDataset:
    """Interactions + catalog feature tables + encoders."""

    def __init__(
        self,
        interactions_df: pd.DataFrame,
        item_info_df: pd.DataFrame,
        image_folder: str,
        vision_model_name: Optional[str] = 'clip',
        language_model_name: Optional[str] = 'sentence-bert',
        create_negative_samples: bool = True,
        numerical_feat_cols: Optional[List[str]] = None,
        categorical_feat_cols: Optional[List[str]] = None,
        cache_features: bool = True,
        cache_max_items: int = 1000,
        cache_dir: Optional[str] = None,
        cache_to_disk: bool = False,
        user_encoder: Optional[LabelEncoder] = None,
        item_encoder: Optional[LabelEncoder] = None,
        tag_encoder: Optional[LabelEncoder] = None,
        **kwargs,
    ):
        self.image_folder = image_folder
        self.vision_enabled = vision_model_name is not None
        self.language_enabled = language_model_name is not None
        self.vision_model_name = vision_model_name
        self.language_model_name = language_model_name
        self.numerical_feat_cols = numerical_feat_cols or []
        self.numerical_enabled = len(self.numerical_feat_cols) > 0
        self.categorical_feat_cols = categorical_feat_cols or []

        self.negative_sampling_strategy = kwargs.get(
            'negative_sampling_strategy', 'random')
        self.negative_sampling_ratio = float(
            kwargs.get('negative_sampling_ratio', 1.0))
        self.numerical_normalization_method = kwargs.get(
            'numerical_normalization_method', 'none')
        self.numerical_scaler = kwargs.get('numerical_scaler', None)
        self.is_train_mode = kwargs.get('is_train_mode', False)
        self.text_augmentation_config = kwargs.get('text_augmentation_config')
        self.image_augmentation_config = kwargs.get('image_augmentation_config')
        self.max_text_length = kwargs.get('max_text_length')
        self.sample_seed = int(kwargs.get('sample_seed', 42))

        self.item_info_df_original = item_info_df.copy()
        self.item_info_df_original['item_id'] = \
            self.item_info_df_original['item_id'].astype(str)
        self.item_info = self.item_info_df_original.set_index('item_id')

        # Drop interactions lacking item metadata (reference dataset.py:91-98).
        inter = interactions_df.copy()
        inter['item_id'] = inter['item_id'].astype(str)
        inter['user_id'] = inter['user_id'].astype(str)
        valid = set(self.item_info_df_original['item_id'])
        before = len(inter)
        inter = inter[inter['item_id'].isin(valid)].reset_index(drop=True)
        if len(inter) < before:
            print(f"INFO: Dropped {before - len(inter)} interactions that had "
                  "no corresponding item metadata.")
        self.interactions = inter

        # --- label encoders (reference dataset.py:142-157)
        self.user_encoder = user_encoder if user_encoder is not None else LabelEncoder()
        self.item_encoder = item_encoder if item_encoder is not None else LabelEncoder()
        if not hasattr(self.user_encoder, 'classes_'):
            self.user_encoder.fit(self.interactions['user_id'])
        if not hasattr(self.item_encoder, 'classes_'):
            self.item_encoder.fit(
                self.item_info_df_original['item_id'].unique())

        self.tag_encoder = None
        self.n_tags = 1
        if 'tag' in self.categorical_feat_cols:
            self.item_info_df_original['tag'] = \
                self.item_info_df_original['tag'].fillna('unknown').astype(str)
            self.tag_encoder = tag_encoder if tag_encoder is not None else LabelEncoder()
            if not hasattr(self.tag_encoder, 'classes_'):
                self.tag_encoder.fit(self.item_info_df_original['tag'])
            self.n_tags = len(self.tag_encoder.classes_)

        self.n_users = len(getattr(self.user_encoder, 'classes_', []))
        self.n_items = len(getattr(self.item_encoder, 'classes_', []))

        # --- numerical processor
        self.numerical_processor = None
        if self.numerical_enabled:
            self.numerical_processor = NumericalProcessor(
                numerical_cols=self.numerical_feat_cols,
                normalization_method=self.numerical_normalization_method,
                scaler=self.numerical_scaler)
            if self.numerical_processor.scaler is not None and \
                    not hasattr(self.numerical_processor.scaler, 'scale_'):
                self.numerical_processor.fit_scaler(
                    self.item_info_df_original, self.numerical_feat_cols,
                    self.numerical_normalization_method)

        # --- feature store (the device-resident replacement for the cache)
        self.feature_store = ItemFeatureStore.build(
            self.item_info_df_original,
            self.item_encoder,
            tag_encoder=self.tag_encoder,
            vision_model=vision_model_name,
            language_model=language_model_name,
            image_folder=image_folder,
            numerical_processor=self.numerical_processor,
            max_text_length=self.max_text_length,
            max_image_cache_items=cache_max_items,
        )
        self.cache_dir = cache_dir
        if cache_to_disk and cache_dir:
            # Reuse packed tables if present, else persist what we built.
            if not self.feature_store.load_tables(cache_dir):
                self.feature_store.save(cache_dir)

        # --- index columns (reference dataset.py:170-174)
        if not self.interactions.empty:
            self.interactions['user_idx'] = self.user_encoder.transform(
                self.interactions['user_id'])
            self.interactions['item_idx'] = self.item_encoder.transform(
                self.interactions['item_id'])

        # --- samples (+ negatives)
        if create_negative_samples and not self.interactions.empty:
            self._build_samples_with_negatives()
        else:
            self.samples = {
                'user_idx': self.interactions.get(
                    'user_idx', pd.Series([], dtype=np.int64)
                ).to_numpy(dtype=np.int64, copy=True),
                'item_idx': self.interactions.get(
                    'item_idx', pd.Series([], dtype=np.int64)
                ).to_numpy(dtype=np.int64, copy=True),
            }
            if 'label' in self.interactions.columns:
                self.samples['label'] = self.interactions['label'].to_numpy(
                    dtype=np.float32, copy=True)
            else:
                self.samples['label'] = np.ones(
                    len(self.samples['user_idx']), dtype=np.float32)

        # `all_samples` DataFrame view for reference-API compatibility.
        self.all_samples = pd.DataFrame({
            'user_idx': self.samples['user_idx'],
            'item_idx': self.samples['item_idx'],
            'label': self.samples['label'],
        })
        if self.n_users:
            self.all_samples['user_id'] = self.user_encoder.inverse_transform(
                self.samples['user_idx']) if len(self.all_samples) else []
        if self.n_items:
            self.all_samples['item_id'] = self.item_encoder.inverse_transform(
                self.samples['item_idx']) if len(self.all_samples) else []

    # ---------------------------------------------------------------- samples
    def _build_samples_with_negatives(self):
        """Positives labeled 1 + sampled negatives labeled 0, shuffled with a
        fixed seed (reference dataset.py:326-403; final shuffle :403)."""
        pos_u = self.interactions['user_idx'].to_numpy(dtype=np.int64)
        pos_i = self.interactions['item_idx'].to_numpy(dtype=np.int64)
        rng = np.random.default_rng(self.sample_seed)
        neg_u, neg_i = sample_negatives(
            pos_u, pos_i, self.n_items,
            ratio=self.negative_sampling_ratio,
            strategy=self.negative_sampling_strategy,
            rng=rng)
        u = np.concatenate([pos_u, neg_u])
        i = np.concatenate([pos_i, neg_i])
        y = np.concatenate([np.ones(len(pos_u), np.float32),
                            np.zeros(len(neg_u), np.float32)])
        perm = np.random.default_rng(42).permutation(len(u))
        self.samples = {'user_idx': u[perm], 'item_idx': i[perm],
                        'label': y[perm]}

    # --------------------------------------------------------------- protocol
    def __len__(self) -> int:
        return len(self.samples['user_idx'])

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        """Per-sample dict in the reference batch schema (dataset.py:243-249)."""
        item_pos = int(self.samples['item_idx'][idx])
        out = {
            'user_idx': np.int64(self.samples['user_idx'][idx]),
            'item_idx': np.int64(item_pos),
            'label': np.float32(self.samples['label'][idx]),
        }
        out.update(self.feature_store.item_features(
            item_pos, include_image=self.vision_enabled))
        return out

    def _get_item_features(self, item_id: str) -> Dict[str, np.ndarray]:
        """Feature dict by original item id (reference dataset.py:255-303)."""
        item_id = str(item_id)
        classes = getattr(self.item_encoder, 'classes_', None)
        if classes is None or item_id not in set(map(str, classes)):
            return self._get_placeholder_features()
        pos = int(self.item_encoder.transform([item_id])[0])
        return self.feature_store.item_features(
            pos, include_image=self.vision_enabled)

    def _get_placeholder_features(self) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        if self.vision_enabled:
            out['image'] = np.zeros((3, 224, 224), np.float32)
        fs = self.feature_store
        for key in ('text_input_ids', 'text_attention_mask',
                    'clip_text_input_ids', 'clip_text_attention_mask'):
            if key in fs.tables:
                out[key] = np.zeros_like(fs.tables[key][0])
        if 'numerical' in fs.tables:
            out['numerical_features'] = np.zeros_like(fs.tables['numerical'][0])
        out['tag_idx'] = np.int64(0)
        return out

    # ----------------------------------------------------------------- batches
    def batches(self, batch_size: int, shuffle: bool = True,
                seed: int = 0, drop_remainder: bool = False,
                include_raw: tuple = ()
                ) -> Iterator[Dict[str, np.ndarray]]:
        """Iterate over index-triple batches for the compiled train step.

        Yields {'user_idx', 'item_idx', 'tag_idx', 'label', 'weight'} with a
        static ``batch_size`` leading dim; the trailing partial batch is padded
        and masked via 'weight'.

        ``include_raw`` adds raw per-item inputs for the end-to-end (unfrozen
        encoder) path: 'image' (normalized float CHW pixels), 'text' (token
        ids + mask), 'clip_text'. The frozen path never needs these — item
        features are gathered from device tables inside the step.
        """
        n = len(self)
        order = (np.random.default_rng(seed).permutation(n) if shuffle
                 else np.arange(n))
        tables = self.feature_store.tables
        tag_table = tables['tag_idx']
        for start in range(0, n, batch_size):
            idx = order[start:start + batch_size]
            valid = len(idx)
            if valid < batch_size:
                if drop_remainder:
                    return
                idx = np.concatenate(
                    [idx, np.zeros(batch_size - valid, dtype=idx.dtype)])
            items = self.samples['item_idx'][idx].astype(np.int32)
            batch = {
                'user_idx': self.samples['user_idx'][idx].astype(np.int32),
                'item_idx': items,
                'tag_idx': tag_table[items].astype(np.int32),
                'label': self.samples['label'][idx].astype(np.float32),
                'weight': (np.arange(batch_size) < valid).astype(np.float32),
            }
            if 'image' in include_raw:
                batch['image'] = self.feature_store.image_batch(items)
            if 'text' in include_raw and 'text_input_ids' in tables:
                batch['text_input_ids'] = tables['text_input_ids'][items]
                batch['text_attention_mask'] = \
                    tables['text_attention_mask'][items]
            if 'clip_text' in include_raw and 'clip_text_input_ids' in tables:
                batch['clip_text_input_ids'] = \
                    tables['clip_text_input_ids'][items]
                batch['clip_text_attention_mask'] = \
                    tables['clip_text_attention_mask'][items]
            yield batch

    def stacked_batches(self, batch_size: int, shuffle: bool = True,
                        seed: int = 0) -> Dict[str, np.ndarray]:
        """All of an epoch's batches stacked: dict of [num_batches, B, ...].

        Feeds the compiled whole-epoch scan (training/steps.py train_epoch).
        Batches are index triples, so a full epoch is a few MB regardless of
        modality configuration.
        """
        batches = list(self.batches(batch_size, shuffle=shuffle, seed=seed))
        return {k: np.stack([b[k] for b in batches]) for k in batches[0]}

    def num_batches(self, batch_size: int, drop_remainder: bool = False) -> int:
        n = len(self)
        return n // batch_size if drop_remainder else -(-n // batch_size)

    # ------------------------------------------------------------------ misc
    def get_user_history(self, user_id: str) -> set:
        """Items the user interacted with (reference dataset.py:462-476)."""
        classes = getattr(self.user_encoder, 'classes_', None)
        if classes is None or str(user_id) not in set(map(str, classes)):
            return set()
        uidx = int(self.user_encoder.transform([str(user_id)])[0])
        item_indices = self.interactions.loc[
            self.interactions['user_idx'] == uidx, 'item_idx'].tolist()
        return set(self.item_encoder.inverse_transform(item_indices))

    def user_history_matrix(self) -> 'np.ndarray':
        """CSR-style (indptr, indices) of each user's positive items, for
        vectorized filter-seen masks in the catalog scorer."""
        u = self.interactions['user_idx'].to_numpy(np.int64)
        i = self.interactions['item_idx'].to_numpy(np.int64)
        order = np.argsort(u, kind='stable')
        u, i = u[order], i[order]
        indptr = np.searchsorted(u, np.arange(self.n_users + 1))
        return indptr, i

    @property
    def num_numerical_features(self) -> int:
        return len(self.numerical_feat_cols)
