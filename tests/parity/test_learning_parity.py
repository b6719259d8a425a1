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


def eval_recall(recommender, test, top_k=TOP_K):
    """Mean Recall@K over users, full-catalog ranking with filter_seen."""
    hits, total = 0, 0
    for user_id, grp in test.groupby('user_id'):
        positives = set(map(str, grp['item_id']))
        recs = recommender.get_recommendations(str(user_id), top_k=top_k,
                                               filter_seen=True)
        rec_ids = {str(i) for i, _ in recs}
        hits += len(rec_ids & positives)
        total += len(positives)
    return hits / total


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


def test_both_frameworks_learn_the_planted_structure(tmp_path):
    train_df, test_df, items_df = make_structured_data()

    ours = train_ours(train_df, items_df)
    our_recall = eval_recall(ours, test_df)

    ref = train_reference(train_df, items_df)
    ref_recall = eval_recall(ref, test_df)

    print(f'recall@{TOP_K}: reference={ref_recall:.3f} ours={our_recall:.3f}')
    # Random-recommendation floor: K / (catalog - seen) = 10/50 = 0.2 per
    # positive; structure-aware models should far exceed it.
    assert ref_recall > 0.45, 'reference failed to learn planted structure'
    assert our_recall > 0.45, 'our framework failed to learn planted structure'
    # Comparable learning quality (different RNG/initializers; wide band).
    assert abs(our_recall - ref_recall) < 0.25, \
        (ref_recall, our_recall)
