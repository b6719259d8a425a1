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


class TestParamShardings:
    def _params(self):
        return {
            'item_embedding': {'embedding': jnp.zeros((64, 16))},
            'proj': {'kernel': jnp.zeros((16, 32)), 'bias': jnp.zeros((32,))},
            'head': {'kernel': jnp.zeros((32, 1)), 'bias': jnp.zeros((1,))},
            'norm': {'scale': jnp.zeros((32,))},
        }

    def test_tensor_parallel_rules(self, devices):
        from pixelrec_multimodal_tpu.parallel import param_shardings
        mesh = make_mesh(model_parallel=2)
        sh = param_shardings(self._params(), mesh)
        assert sh['item_embedding']['embedding'].spec == P(MODEL_AXIS, None)
        assert sh['proj']['kernel'].spec == P(None, MODEL_AXIS)
        # Size-1 output dim and 1D leaves stay replicated.
        assert sh['head']['kernel'].spec == P()
        assert sh['proj']['bias'].spec == P()
        assert sh['norm']['scale'].spec == P()

    def test_non_divisible_dims_stay_replicated(self, devices):
        """device_put rejects uneven shards; odd vocab/out-dims replicate."""
        from pixelrec_multimodal_tpu.parallel import param_shardings
        mesh = make_mesh(model_parallel=2)
        params = {'emb': {'embedding': jnp.zeros((101, 16))},
                  'proj': {'kernel': jnp.zeros((16, 33))}}
        sh = param_shardings(params, mesh)
        assert sh['emb']['embedding'].spec == P()
        assert sh['proj']['kernel'].spec == P()
        placed = jax.device_put(params, sh)  # must not raise
        assert placed['emb']['embedding'].shape == (101, 16)

    def test_model_axis_one_replicates_everything(self, devices):
        from pixelrec_multimodal_tpu.parallel import param_shardings
        mesh = make_mesh(model_parallel=1)
        sh = param_shardings(self._params(), mesh)
        assert all(s.spec == P() for s in jax.tree.leaves(
            sh, is_leaf=lambda x: isinstance(x, NamedSharding)))

    def test_tp_step_matches_replicated(self, devices):
        """A train step on TP-sharded params produces the same metrics as
        the replicated run (GSPMD collectives preserve the math)."""
        from pixelrec_multimodal_tpu.models.multimodal import (
            MultimodalRecommender)
        from pixelrec_multimodal_tpu.parallel import (
            param_shardings, replicated)
        from pixelrec_multimodal_tpu.training.optimizers import build_optimizer
        from pixelrec_multimodal_tpu.training.steps import (
            init_train_state, make_step_fns)

        model = MultimodalRecommender(
            n_users=32, n_items=64, n_tags=4, num_numerical_features=0,
            embedding_dim=16, vision_feature_dim=0, language_feature_dim=0,
            use_contrastive=False, fusion_hidden_dims=(32,),
            fusion_type='concatenate', use_batch_norm=False, dropout_rate=0.0)
        tx = build_optimizer('adamw', 1e-3, 0.01, gradient_clip=1.0)
        rng = np.random.default_rng(0)
        batch = {
            'user_idx': jnp.asarray(rng.integers(0, 32, 16), jnp.int32),
            'item_idx': jnp.asarray(rng.integers(0, 64, 16), jnp.int32),
            'tag_idx': jnp.asarray(rng.integers(0, 4, 16), jnp.int32),
            'label': jnp.asarray(rng.integers(0, 2, 16), jnp.float32),
            'weight': jnp.ones((16,), jnp.float32),
        }
        key = jax.random.PRNGKey(3)

        def run(mesh):
            state = init_train_state(model, tx, jax.random.PRNGKey(0))
            if mesh is not None:
                state = jax.device_put(state, replicated(mesh))
                p = jax.device_put(state.params,
                                   param_shardings(state.params, mesh))
                state = state.replace(params=p, opt_state=jax.jit(tx.init)(p))
            train_step, _ = make_step_fns(model, {}, use_contrastive=False)
            state, metrics = train_step(state, dict(batch), key)
            state, metrics = train_step(state, dict(batch), key)
            return jax.device_get(metrics)

        base = run(None)
        tp = run(make_mesh(model_parallel=2))
        for k in ('total_loss', 'correct', 'count'):
            np.testing.assert_allclose(tp[k], base[k], rtol=1e-5, atol=1e-6,
                                       err_msg=k)


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
