"""Mesh/sharding tests on the simulated 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pixelrec_multimodal_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    item_table_sharding,
    make_mesh,
    pad_to_multiple,
    shard_batch,
)
from pixelrec_multimodal_tpu.ops.topk import sharded_topk


@pytest.fixture(scope='module')
def devices():
    ds = jax.devices()
    if len(ds) < 8:
        pytest.skip('needs 8 simulated devices')
    return ds


class TestMesh:
    def test_1d_default(self, devices):
        mesh = make_mesh()
        assert mesh.devices.shape == (8, 1)
        assert mesh.axis_names == (DATA_AXIS, MODEL_AXIS)

    def test_2d(self, devices):
        mesh = make_mesh(model_parallel=2)
        assert mesh.devices.shape == (4, 2)

    def test_bad_factorization(self, devices):
        with pytest.raises(ValueError):
            make_mesh(model_parallel=3)

    def test_pad_to_multiple(self):
        assert pad_to_multiple(5, 8) == 8
        assert pad_to_multiple(8, 8) == 8
        assert pad_to_multiple(9, 8) == 16
        assert pad_to_multiple(0, 8) == 8

    def test_shard_batch_placement(self, devices):
        mesh = make_mesh()
        batch = {'x': np.arange(16, dtype=np.float32),
                 'y': np.ones((16, 3), np.float32)}
        sharded = shard_batch(batch, mesh)
        assert sharded['x'].sharding == batch_sharding(mesh)
        np.testing.assert_array_equal(np.asarray(sharded['x']), batch['x'])

    def test_sharded_table_gather(self, devices):
        """Gather from a model-axis-sharded table with replicated indices —
        the production access pattern of the feature store."""
        mesh = make_mesh(model_parallel=2)
        table = jax.device_put(
            jnp.arange(64, dtype=jnp.float32).reshape(16, 4),
            item_table_sharding(mesh))
        idx = jnp.asarray([3, 7, 11, 2], jnp.int32)

        @jax.jit
        def gather(t, i):
            return jnp.take(t, i, axis=0).sum(axis=1)

        out = np.asarray(gather(table, idx))
        expected = np.arange(64).reshape(16, 4)[np.asarray(idx)].sum(axis=1)
        np.testing.assert_allclose(out, expected)


class TestShardedTopK:
    def test_exact_global_topk(self, devices):
        """shard_map sharded_topk == dense lax.top_k over the full axis."""
        from jax import shard_map
        mesh = make_mesh(data_parallel=1, model_parallel=8)
        rng = np.random.default_rng(0)
        scores = rng.standard_normal((4, 64)).astype(np.float32)
        k = 5

        fn = shard_map(
            lambda s: sharded_topk(s, k, MODEL_AXIS),
            mesh=mesh,
            in_specs=P(None, MODEL_AXIS),
            out_specs=(P(None), P(None)),
            check_vma=False)
        v, i = jax.jit(fn)(jnp.asarray(scores))
        ref_v, ref_i = jax.lax.top_k(jnp.asarray(scores), k)
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))


class TestSimpleCacheCompat:
    def test_lru_and_stats(self, tmp_path):
        from pixelrec_multimodal_tpu.data.simple_cache import SimpleFeatureCache
        c = SimpleFeatureCache('resnet', 'bert', str(tmp_path),
                               max_memory_items=2)
        assert c.get('a') is None  # miss
        c.set('a', {'x': np.ones(3)})
        c.set('b', {'x': np.ones(3) * 2})
        c.set('c', {'x': np.ones(3) * 3})  # evicts 'a'
        assert c.get('a') is None
        assert c.get('b') is not None
        stats = c.get_stats()
        assert stats['memory_items'] == 2
        assert stats['hits'] == 1
        assert 'vision_resnet_lang_bert' in stats['cache_dir']

    def test_disk_tier_and_pickle(self, tmp_path):
        import pickle
        from pixelrec_multimodal_tpu.data.simple_cache import SimpleFeatureCache
        c = SimpleFeatureCache('clip', None, str(tmp_path), use_disk=True)
        c.set('i1', {'v': np.arange(4, dtype=np.float32)})
        # New instance reads back from disk.
        c2 = SimpleFeatureCache('clip', None, str(tmp_path), use_disk=True)
        got = c2.get('i1')
        np.testing.assert_array_equal(got['v'], np.arange(4, dtype=np.float32))
        # Pickle-safe (drops the lock).
        c3 = pickle.loads(pickle.dumps(c))
        assert c3.get('i1') is not None


class TestShardedTraining:
    def test_trainer_with_mesh(self, devices, tmp_path):
        """Full Trainer epoch with a (4, 2) mesh: dp batches + replicated
        params; XLA emits the gradient psums from the shardings."""
        import pandas as pd
        from pixelrec_multimodal_tpu.config import Config
        from pixelrec_multimodal_tpu.data.dataset import MultimodalDataset
        from pixelrec_multimodal_tpu.models import build_model
        from pixelrec_multimodal_tpu.training import Trainer

        rng = np.random.default_rng(0)
        rows = []
        for u in range(8):
            for it in rng.choice(24, size=5, replace=False):
                rows.append((f'u{u}', f'i{it}'))
        inter = pd.DataFrame(rows, columns=['user_id', 'item_id'])
        items = pd.DataFrame({
            'item_id': [f'i{j}' for j in range(24)],
            'tag': [f't{j % 2}' for j in range(24)],
            'views': rng.random(24),
        })
        ds = MultimodalDataset(
            inter, items, image_folder='/none',
            vision_model_name=None, language_model_name=None,
            numerical_feat_cols=['views'], categorical_feat_cols=['tag'],
            numerical_normalization_method='standardization')

        cfg = Config()
        cfg.model.vision_model = None
        cfg.model.language_model = None
        cfg.model.embedding_dim = 8
        cfg.model.fusion_hidden_dims = [16]
        cfg.model.use_contrastive = False
        cfg.checkpoint_dir = str(tmp_path)

        mesh = make_mesh(model_parallel=2)
        model = build_model(cfg.model, ds.n_users, ds.n_items, ds.n_tags, 1)
        trainer = Trainer(model, config=cfg, checkpoint_dir=str(tmp_path),
                          use_contrastive=False, mesh=mesh)
        losses, _ = trainer.train(ds, None, epochs=1, lr=0.01, batch_size=16)
        assert len(losses) == 1
        assert np.isfinite(losses[0])
