"""Mesh-sharded contrastive InfoNCE == single-device (VERDICT r2 item 2).

The reference's contrastive loss is batch-GLOBAL symmetric InfoNCE
(/root/reference/src/models/losses.py:38-79): the similarity matrix covers
every pair in the batch. Under data-parallel sharding a naive per-shard
implementation would silently compute shard-local matrices — wrong negatives,
wrong loss, silently degraded Recall for config #3. Our implementation relies
on GSPMD: ``img @ txt.T`` inside jit with 'data'-sharded inputs is partitioned
by XLA with the collectives needed to keep the matmul global. These tests pin
that down numerically on the simulated 8-device CPU mesh.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pixelrec_multimodal_tpu.models.losses import contrastive_loss
from pixelrec_multimodal_tpu.models.multimodal import MultimodalRecommender
from pixelrec_multimodal_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
)
from pixelrec_multimodal_tpu.training.optimizers import build_optimizer
from pixelrec_multimodal_tpu.training.steps import (
    init_train_state,
    make_step_fns,
)


@pytest.fixture(scope='module')
def devices():
    ds = jax.devices()
    if len(ds) < 8:
        pytest.skip('needs 8 simulated devices')
    return ds


B, VIS_DIM, TXT_DIM = 32, 48, 24
D = 32  # shared contrastive-embedding dim for the direct-loss tests


def _pairs(seed=0):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((B, D)).astype(np.float32)
    txt = rng.standard_normal((B, D)).astype(np.float32)
    return img, txt


class TestShardedInfoNCE:
    def test_dp_sharded_equals_single_device(self, devices):
        """jit(contrastive_loss) on 'data'-sharded rows == unsharded value."""
        img, txt = _pairs()
        base = float(jax.jit(contrastive_loss)(jnp.asarray(img),
                                               jnp.asarray(txt)))

        mesh = make_mesh()  # (8, 1)
        sh = batch_sharding(mesh)
        img_s = jax.device_put(jnp.asarray(img), sh)
        txt_s = jax.device_put(jnp.asarray(txt), sh)
        sharded = float(jax.jit(contrastive_loss)(img_s, txt_s))
        np.testing.assert_allclose(sharded, base, rtol=1e-6)

    def test_dp_sharded_masked_tail(self, devices):
        """Padded-row masking (static-shape batches) stays global under dp."""
        img, txt = _pairs(1)
        w = np.ones(B, np.float32)
        w[-5:] = 0.0  # masked pad tail
        base = float(jax.jit(contrastive_loss)(
            jnp.asarray(img), jnp.asarray(txt), 0.07, jnp.asarray(w)))
        # Ground truth: loss over only the live rows, computed unsharded.
        live = float(jax.jit(contrastive_loss)(
            jnp.asarray(img[:-5]), jnp.asarray(txt[:-5])))
        np.testing.assert_allclose(base, live, rtol=1e-5)

        mesh = make_mesh()
        sh = batch_sharding(mesh)
        sharded = float(jax.jit(contrastive_loss)(
            jax.device_put(jnp.asarray(img), sh),
            jax.device_put(jnp.asarray(txt), sh), 0.07,
            jax.device_put(jnp.asarray(w), sh)))
        np.testing.assert_allclose(sharded, base, rtol=1e-6)

    def test_global_not_shard_local(self, devices):
        """The sharded value must differ from the shard-local average —
        proof the negatives really span the whole batch."""
        img, txt = _pairs(2)
        n_shards = 8
        per = B // n_shards
        local = np.mean([
            float(contrastive_loss(jnp.asarray(img[i * per:(i + 1) * per]),
                                   jnp.asarray(txt[i * per:(i + 1) * per])))
            for i in range(n_shards)])
        mesh = make_mesh()
        sh = batch_sharding(mesh)
        sharded = float(jax.jit(contrastive_loss)(
            jax.device_put(jnp.asarray(img), sh),
            jax.device_put(jnp.asarray(txt), sh)))
        # Shard-local InfoNCE sees 4 candidates/row instead of 32; its loss is
        # structurally smaller (log 4 vs log 32 scale). They must not agree.
        assert abs(sharded - local) > 0.3, (sharded, local)


def _clip_model():
    """CLIP-geometry flagship (config #3 shape, scaled down): contrastive
    heads + learnable temperature active."""
    return MultimodalRecommender(
        n_users=64, n_items=128, n_tags=8, num_numerical_features=4,
        embedding_dim=16, vision_feature_dim=VIS_DIM,
        language_feature_dim=TXT_DIM, clip_text_feature_dim=TXT_DIM,
        use_contrastive=True, fusion_hidden_dims=(32, 16),
        fusion_type='gated', use_batch_norm=True, dropout_rate=0.0)


def _tables(n_items=128, seed=3):
    rng = np.random.default_rng(seed)
    return {
        'vision_emb': jnp.asarray(
            rng.standard_normal((n_items, VIS_DIM)), jnp.float32),
        'language_emb': jnp.asarray(
            rng.standard_normal((n_items, TXT_DIM)), jnp.float32),
        'numerical': jnp.asarray(
            rng.standard_normal((n_items, 4)), jnp.float32),
        'clip_text_emb': jnp.asarray(
            rng.standard_normal((n_items, TXT_DIM)), jnp.float32),
    }


def _batch(seed=4):
    rng = np.random.default_rng(seed)
    return {
        'user_idx': jnp.asarray(rng.integers(0, 64, B), jnp.int32),
        'item_idx': jnp.asarray(rng.integers(0, 128, B), jnp.int32),
        'tag_idx': jnp.asarray(rng.integers(0, 8, B), jnp.int32),
        'label': jnp.asarray(rng.integers(0, 2, B), jnp.float32),
        'weight': jnp.ones((B,), jnp.float32),
    }


class TestContrastiveTrainStepUnderMesh:
    def _run(self, mesh, tp=False, steps=2):
        model = _clip_model()
        tx = build_optimizer('adamw', 1e-3, 0.01, gradient_clip=1.0)
        state = init_train_state(model, tx, jax.random.PRNGKey(0))
        tables = _tables()
        if mesh is not None:
            state = jax.device_put(state, replicated(mesh))
            if tp:
                p = jax.device_put(state.params,
                                   param_shardings(state.params, mesh))
                state = state.replace(params=p,
                                      opt_state=jax.jit(tx.init)(p))
            tables = {k: jax.device_put(v, replicated(mesh))
                      for k, v in tables.items()}
        train_step, _ = make_step_fns(model, tables)
        key = jax.random.PRNGKey(7)
        for i in range(steps):
            batch = _batch(seed=10 + i)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            state, metrics = train_step(state, batch, key)
        return jax.device_get(metrics)

    def test_dp_metrics_match_single_device(self, devices):
        base = self._run(None)
        assert float(base['contrastive_loss']) > 0.0  # the path is live
        dp = self._run(make_mesh())
        for k in ('total_loss', 'bce_loss', 'contrastive_loss', 'correct'):
            np.testing.assert_allclose(dp[k], base[k], rtol=1e-5, atol=1e-6,
                                       err_msg=k)

    def test_dp_tp_metrics_match_single_device(self, devices):
        base = self._run(None)
        dptp = self._run(make_mesh(model_parallel=2), tp=True)
        for k in ('total_loss', 'bce_loss', 'contrastive_loss', 'correct'):
            np.testing.assert_allclose(dptp[k], base[k], rtol=1e-5, atol=1e-6,
                                       err_msg=k)
