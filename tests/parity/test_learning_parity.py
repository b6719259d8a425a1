"""End-to-end learning parity: reference PyTorch training vs ours, ID-only.

Trains BOTH frameworks on the same synthetic dataset with planted structure
(two user groups preferring two disjoint item groups), evaluates both with
retrieval Recall/NDCG on held-out in-group items, and checks that (a) both
learn the structure (recall far above the random floor) and (b) their scores
land in the same band. Exact equality is impossible across frameworks (RNGs
differ); this validates BASELINE.json's config #1 end to end.

Marked slow: two full CPU training runs.
"""
import sys
import types
import importlib.machinery
import unittest.mock as mock
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REFERENCE = Path('/root/reference')
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REFERENCE.exists(),
                       reason='reference checkout not available'),
]

if REFERENCE.exists() and str(REFERENCE) not in sys.path:
    sys.path.insert(0, str(REFERENCE))

for _name in ('torchvision', 'torchvision.transforms', 'wandb', 'optuna'):
    if _name not in sys.modules:
        m = types.ModuleType(_name)
        m.__getattr__ = lambda k, _m=mock.MagicMock(): _m
        m.__spec__ = importlib.machinery.ModuleSpec(_name, loader=None)
        sys.modules[_name] = m
sys.modules['torchvision'].transforms = sys.modules['torchvision.transforms']

N_USERS, N_ITEMS = 24, 60
GROUP_ITEMS = N_ITEMS // 2
TOP_K = 10


def make_structured_data(seed=5):
    """Users 0..11 like items 0..29; users 12..23 like items 30..59."""
    rng = np.random.default_rng(seed)
    train_rows, test_rows = [], []
    for u in range(N_USERS):
        lo = 0 if u < N_USERS // 2 else GROUP_ITEMS
        liked = rng.choice(np.arange(lo, lo + GROUP_ITEMS), size=14,
                           replace=False)
        for it in liked[:10]:
            train_rows.append((f'u{u}', f'i{it}'))
        for it in liked[10:]:
            test_rows.append((f'u{u}', f'i{it}'))
    train = pd.DataFrame(train_rows, columns=['user_id', 'item_id'])
    test = pd.DataFrame(test_rows, columns=['user_id', 'item_id'])
    items = pd.DataFrame({'item_id': [f'i{j}' for j in range(N_ITEMS)],
                          'tag': ['g0' if j < GROUP_ITEMS else 'g1'
                                  for j in range(N_ITEMS)]})
    for df in (train, test, items):
        for c in df.columns:
            df[c] = df[c].astype(object)
    return train, test, items


def eval_metrics(recommender, test, top_k=TOP_K):
    """Mean (Recall@K, NDCG@K) over users, full-catalog ranking with
    filter_seen. NDCG uses the retrieval form (IDCG over min(|rel|, K)),
    matching both evaluators (reference tasks.py:718-747)."""
    recalls, ndcgs = [], []
    for user_id, grp in test.groupby('user_id'):
        positives = set(map(str, grp['item_id']))
        recs = recommender.get_recommendations(str(user_id), top_k=top_k,
                                               filter_seen=True)
        rec_ids = [str(i) for i, _ in recs]
        recalls.append(len(set(rec_ids) & positives) / len(positives))
        dcg = sum(1.0 / np.log2(rank + 1)
                  for rank, item in enumerate(rec_ids[:top_k], 1)
                  if item in positives)
        idcg = sum(1.0 / np.log2(r + 2)
                   for r in range(min(len(positives), top_k)))
        ndcgs.append(dcg / idcg if idcg else 0.0)
    return float(np.mean(recalls)), float(np.mean(ndcgs))


def train_reference(train_df, items_df, seed=0):
    import torch
    from torch.utils.data import DataLoader
    from src.data.dataset import MultimodalDataset as RefDataset
    from src.models.multimodal import MultimodalRecommender as RefModel
    from src.inference.recommender import Recommender as RefRecommender

    torch.manual_seed(seed)
    np.random.seed(seed)
    ds = RefDataset(
        interactions_df=train_df, item_info_df=items_df,
        image_folder='/nonexistent', vision_model_name=None,
        language_model_name=None, create_negative_samples=True,
        numerical_feat_cols=None, categorical_feat_cols=['tag'],
        cache_features=False, negative_sampling_ratio=2.0)
    loader = DataLoader(ds, batch_size=64, shuffle=True, num_workers=0)
    model = RefModel(
        n_users=ds.n_users, n_items=ds.n_items, n_tags=ds.n_tags,
        num_numerical_features=0, embedding_dim=16,
        vision_model_name=None, language_model_name=None,
        use_contrastive=False, dropout_rate=0.1,
        fusion_hidden_dims=[32, 16], use_batch_norm=True,
        fusion_type='concatenate')
    opt = torch.optim.AdamW(model.parameters(), lr=0.01, weight_decay=0.0)
    bce = torch.nn.BCELoss()
    model.train()
    for epoch in range(30):
        for batch in loader:
            opt.zero_grad()
            out = model(batch['user_idx'], batch['item_idx'],
                        batch['tag_idx']).squeeze(-1)
            loss = bce(out.clamp(1e-7, 1 - 1e-7), batch['label'])
            loss.backward()
            # Match the real reference Trainer (trainer.py:397) and our
            # Trainer's default gradient clip of 1.0.
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()
    model.eval()
    eval_ds = RefDataset(
        interactions_df=train_df, item_info_df=items_df,
        image_folder='/nonexistent', vision_model_name=None,
        language_model_name=None, create_negative_samples=False,
        numerical_feat_cols=None, categorical_feat_cols=['tag'],
        cache_features=False,
        user_encoder=ds.user_encoder, item_encoder=ds.item_encoder,
        tag_encoder=ds.tag_encoder)
    return RefRecommender(model, eval_ds, torch.device('cpu'))


def train_ours(train_df, items_df, seed=0):
    from pixelrec_multimodal_tpu.config import Config
    from pixelrec_multimodal_tpu.data.dataset import MultimodalDataset
    from pixelrec_multimodal_tpu.inference import Recommender
    from pixelrec_multimodal_tpu.models import build_model
    from pixelrec_multimodal_tpu.training import Trainer

    cfg = Config()
    cfg.model.vision_model = None
    cfg.model.language_model = None
    cfg.model.embedding_dim = 16
    cfg.model.fusion_hidden_dims = [32, 16]
    cfg.model.use_contrastive = False
    cfg.model.dropout_rate = 0.1
    ds = MultimodalDataset(
        train_df, items_df, image_folder='/nonexistent',
        vision_model_name=None, language_model_name=None,
        create_negative_samples=True, numerical_feat_cols=[],
        categorical_feat_cols=['tag'], negative_sampling_ratio=2.0,
        sample_seed=seed)
    model = build_model(cfg.model, ds.n_users, ds.n_items, ds.n_tags, 0)
    trainer = Trainer(model, config=cfg, checkpoint_dir='/tmp/parity_ckpt',
                      use_contrastive=False, seed=seed)
    trainer.train(ds, None, epochs=30, lr=0.01, weight_decay=0.0,
                  batch_size=64, use_lr_scheduler=False)
    variables = {'params': trainer.state.params}
    if trainer.state.batch_stats is not None:
        variables['batch_stats'] = trainer.state.batch_stats
    return Recommender(model, variables, ds, item_chunk=128, user_chunk=8)


SEEDS = (0, 1, 2)


def test_multi_seed_metric_parity(tmp_path):
    """Trained-model quality parity, BASELINE.json config #1 (ID-only).

    Both frameworks train on identical data across 3 seeds; seed-mean
    Recall@10 and NDCG@10 must agree within 0.05 (round-1 allowed 0.25 on a
    single seed — VERDICT weak #3). The planted structure caps achievable
    Recall@10 at ~0.5 (4 positives uniformly ranked within 20 unseen
    in-group items), so both frameworks saturating the structure should
    concentrate there.
    """
    train_df, test_df, items_df = make_structured_data()

    our_r, our_n, ref_r, ref_n = [], [], [], []
    for seed in SEEDS:
        r, n = eval_metrics(train_ours(train_df, items_df, seed=seed),
                            test_df)
        our_r.append(r)
        our_n.append(n)
        r, n = eval_metrics(train_reference(train_df, items_df, seed=seed),
                            test_df)
        ref_r.append(r)
        ref_n.append(n)

    our_recall, our_ndcg = np.mean(our_r), np.mean(our_n)
    ref_recall, ref_ndcg = np.mean(ref_r), np.mean(ref_n)
    print(f'recall@{TOP_K}: reference={ref_recall:.3f} (per-seed {ref_r}) '
          f'ours={our_recall:.3f} (per-seed {our_r})')
    print(f'ndcg@{TOP_K}:   reference={ref_ndcg:.3f} (per-seed {ref_n}) '
          f'ours={our_ndcg:.3f} (per-seed {our_n})')
    # Random-recommendation floor: K / (catalog - seen) = 10/50 = 0.2 per
    # positive; structure-aware models must far exceed it, every seed.
    assert min(ref_r) > 0.4, 'reference failed to learn planted structure'
    assert min(our_r) > 0.4, 'our framework failed to learn planted structure'
    assert abs(our_recall - ref_recall) <= 0.05, (ref_r, our_r)
    assert abs(our_ndcg - ref_ndcg) <= 0.05, (ref_n, our_n)


# --------------------------------------------------------------------------
# Config #2 geometry (ResNet-50 2048-dim vision + SBERT 384-dim language,
# concatenation fusion, frozen/cached features) on random-weight features.
#
# Both frameworks consume the SAME per-item feature tables: ours through the
# production frozen path (feature_store embedding tables), the reference
# through fixed encoder stand-ins that look up the same table by an item
# position smuggled in the cached 'image'/'text_input_ids' tensors — the
# same mocked-encoder technique the reference's own tests use
# (/root/reference/tests/unit/src/data/test_dataset.py:22-50), but
# numerically meaningful. Full-size pretrained fidelity remains untestable
# offline (no HF weights; see BASELINE.md).
# --------------------------------------------------------------------------
VIS_DIM, LANG_DIM = 2048, 384


def make_feature_tables(seed=9):
    """Group-discriminative random features: items of each planted group
    cluster around a group direction, so the multimodal towers carry signal
    the model must actually exploit. Rows are unit-L2-normalized — the
    realistic scale for encoder embeddings (raw ~sqrt(2048)-norm rows
    destabilize torch AdamW at this lr and just measure feature scaling,
    not framework quality)."""
    rng = np.random.default_rng(seed)
    mu_v = rng.standard_normal((2, VIS_DIM))
    mu_l = rng.standard_normal((2, LANG_DIM))
    g = (np.arange(N_ITEMS) >= GROUP_ITEMS).astype(int)
    V = mu_v[g] + 0.3 * rng.standard_normal((N_ITEMS, VIS_DIM))
    L = mu_l[g] + 0.3 * rng.standard_normal((N_ITEMS, LANG_DIM))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    L /= np.linalg.norm(L, axis=1, keepdims=True)
    return V.astype(np.float32), L.astype(np.float32)


def train_reference_mm(train_df, items_df, V, L, seed=0):
    import torch
    import torch.nn as nn
    from torch.utils.data import DataLoader

    class FixedOutput:
        def __init__(self, pooled):
            self.pooler_output = pooled

    class FixedVision(nn.Module):
        """Stands in for the HF resnet: pixel [B,3,h,w] whose [0,0,0] entry
        is the item position -> table row (pooler_output, dim 2048)."""
        def __init__(self, table):
            super().__init__()
            self.register_buffer('table', torch.from_numpy(table))

        def forward(self, pixel_values=None, **kw):
            idx = pixel_values[:, 0, 0, 0].long()
            return FixedOutput(self.table[idx])

    class FixedLang(nn.Module):
        def __init__(self, table):
            super().__init__()
            self.register_buffer('table', torch.from_numpy(table))

        def forward(self, input_ids=None, attention_mask=None, **kw):
            return FixedOutput(self.table[input_ids[:, 0].long()])

    def fake_auto_model(name, *a, **kw):
        return FixedVision(V) if 'resnet' in name else FixedLang(L)

    auto_model = mock.MagicMock()
    auto_model.from_pretrained.side_effect = fake_auto_model
    patches = [
        mock.patch('src.models.multimodal.AutoModel', auto_model),
        mock.patch('src.data.processors.image_processor.AutoImageProcessor',
                   mock.MagicMock()),
        mock.patch('src.data.processors.text_processor.AutoTokenizer',
                   mock.MagicMock()),
    ]
    from src.data.dataset import MultimodalDataset as RefDataset
    from src.models.multimodal import MultimodalRecommender as RefModel
    from src.inference.recommender import Recommender as RefRecommender

    with patches[0], patches[1], patches[2]:
        torch.manual_seed(seed)
        np.random.seed(seed)

        def build_ds(create_neg):
            return RefDataset(
                interactions_df=train_df, item_info_df=items_df,
                image_folder='/nonexistent', vision_model_name='resnet',
                language_model_name='sentence-bert',
                create_negative_samples=create_neg,
                numerical_feat_cols=None, categorical_feat_cols=['tag'],
                cache_features=True, cache_max_items=N_ITEMS + 8,
                negative_sampling_ratio=2.0)

        ds = build_ds(True)

        def fill_cache(dataset):
            for item_id in map(str, dataset.item_encoder.classes_):
                pos = int(dataset.item_encoder.transform([item_id])[0])
                tag = items_df.set_index('item_id').loc[item_id, 'tag']
                tag_pos = int(dataset.tag_encoder.transform([tag])[0])
                img = torch.zeros(3, 4, 4)
                img[0, 0, 0] = float(pos)
                dataset.feature_cache.set(item_id, {
                    'image': img,
                    'text_input_ids': torch.full((4,), pos,
                                                 dtype=torch.long),
                    'text_attention_mask': torch.ones(4, dtype=torch.long),
                    'tag_idx': torch.tensor(tag_pos, dtype=torch.long),
                })

        fill_cache(ds)
        model = RefModel(
            n_users=ds.n_users, n_items=ds.n_items, n_tags=ds.n_tags,
            num_numerical_features=0, embedding_dim=16,
            vision_model_name='resnet',
            language_model_name='sentence-bert',
            use_contrastive=False, dropout_rate=0.1,
            fusion_hidden_dims=[32, 16], use_batch_norm=True,
            fusion_type='concatenate')
        loader = DataLoader(ds, batch_size=64, shuffle=True, num_workers=0)
        trainable = [p for p in model.parameters() if p.requires_grad]
        opt = torch.optim.AdamW(trainable, lr=0.01, weight_decay=0.0)
        bce = torch.nn.BCELoss()
        model.train()
        for epoch in range(30):
            for batch in loader:
                opt.zero_grad()
                out = model(batch['user_idx'], batch['item_idx'],
                            batch['tag_idx'], image=batch['image'],
                            text_input_ids=batch['text_input_ids'],
                            text_attention_mask=batch['text_attention_mask'],
                            ).squeeze(-1)
                loss = bce(out.clamp(1e-7, 1 - 1e-7), batch['label'])
                loss.backward()
                # Match the real reference Trainer (trainer.py:397
                # clip_grad_norm_) and our Trainer's default clip of 1.0.
                torch.nn.utils.clip_grad_norm_(trainable, 1.0)
                opt.step()
        model.eval()
        eval_ds = RefDataset(
            interactions_df=train_df, item_info_df=items_df,
            image_folder='/nonexistent', vision_model_name='resnet',
            language_model_name='sentence-bert',
            create_negative_samples=False,
            numerical_feat_cols=None, categorical_feat_cols=['tag'],
            cache_features=True, cache_max_items=N_ITEMS + 8,
            user_encoder=ds.user_encoder, item_encoder=ds.item_encoder,
            tag_encoder=ds.tag_encoder)
        fill_cache(eval_ds)
        return RefRecommender(model, eval_ds, torch.device('cpu'))


def train_ours_mm(train_df, items_df, V, L, seed=0):
    from pixelrec_multimodal_tpu.config import Config
    from pixelrec_multimodal_tpu.data.dataset import MultimodalDataset
    from pixelrec_multimodal_tpu.inference import Recommender
    from pixelrec_multimodal_tpu.models import build_model
    from pixelrec_multimodal_tpu.training import Trainer

    cfg = Config()
    cfg.model.vision_model = 'resnet'
    cfg.model.language_model = 'sentence-bert'
    cfg.model.embedding_dim = 16
    cfg.model.fusion_hidden_dims = [32, 16]
    cfg.model.use_contrastive = False
    cfg.model.dropout_rate = 0.1
    ds = MultimodalDataset(
        train_df, items_df, image_folder='/nonexistent',
        vision_model_name='resnet', language_model_name='sentence-bert',
        create_negative_samples=True, numerical_feat_cols=[],
        categorical_feat_cols=['tag'], negative_sampling_ratio=2.0,
        sample_seed=seed)
    # Production frozen path: the same tables the precompute stage would
    # have packed.
    ds.feature_store.tables['vision_emb'] = V
    ds.feature_store.tables['language_emb'] = L
    model = build_model(cfg.model, ds.n_users, ds.n_items, ds.n_tags, 0)
    trainer = Trainer(model, config=cfg, checkpoint_dir='/tmp/parity_ckpt_mm',
                      use_contrastive=False, seed=seed)
    trainer.train(ds, None, epochs=30, lr=0.01, weight_decay=0.0,
                  batch_size=64, use_lr_scheduler=False)
    variables = {'params': trainer.state.params}
    if trainer.state.batch_stats is not None:
        variables['batch_stats'] = trainer.state.batch_stats
    return Recommender(model, variables, ds, item_chunk=128, user_chunk=8)


def test_multimodal_multi_seed_metric_parity(tmp_path):
    """BASELINE.json config #2 geometry on shared random-weight features."""
    train_df, test_df, items_df = make_structured_data()
    V, L = make_feature_tables()

    our_r, our_n, ref_r, ref_n = [], [], [], []
    for seed in SEEDS:
        r, n = eval_metrics(
            train_ours_mm(train_df, items_df, V, L, seed=seed), test_df)
        our_r.append(r)
        our_n.append(n)
        r, n = eval_metrics(
            train_reference_mm(train_df, items_df, V, L, seed=seed), test_df)
        ref_r.append(r)
        ref_n.append(n)

    our_recall, our_ndcg = np.mean(our_r), np.mean(our_n)
    ref_recall, ref_ndcg = np.mean(ref_r), np.mean(ref_n)
    print(f'mm recall@{TOP_K}: reference={ref_recall:.3f} (per-seed {ref_r}) '
          f'ours={our_recall:.3f} (per-seed {our_r})')
    print(f'mm ndcg@{TOP_K}:   reference={ref_ndcg:.3f} (per-seed {ref_n}) '
          f'ours={our_ndcg:.3f} (per-seed {our_n})')
    # Random floor is 0.2 (10 of 50 unseen); 0.35 = structure clearly learned.
    assert min(ref_r) > 0.35, 'reference failed to learn (features + ids)'
    assert min(our_r) > 0.35, 'ours failed to learn (features + ids)'
    assert abs(our_recall - ref_recall) <= 0.05, (ref_r, our_r)
    assert abs(our_ndcg - ref_ndcg) <= 0.05, (ref_n, our_n)
