"""Gradient accumulation (optax.MultiSteps) — the feature the reference
README advertises (README.md:310-315) but its trainer never implemented."""
import jax
import jax.numpy as jnp
import numpy as np

from pixelrec_multimodal_tpu.training.optimizers import (
    build_optimizer,
    get_learning_rate,
    set_learning_rate,
)


def _params():
    return {'w': jnp.asarray([1.0, -2.0, 0.5]), 'b': jnp.asarray(0.25)}


def _grad(seed):
    r = np.random.default_rng(seed)
    return {'w': jnp.asarray(r.standard_normal(3), jnp.float32),
            'b': jnp.asarray(float(r.standard_normal()), jnp.float32)}


class TestGradientAccumulation:
    def test_k_microbatches_equal_one_averaged_step(self):
        """SGD with accumulation over k micro-grads == one step on their
        mean (momentum state identical too)."""
        k = 4
        grads = [_grad(i) for i in range(k)]
        mean_grad = jax.tree.map(
            lambda *gs: sum(gs) / len(gs), *grads)

        tx_acc = build_optimizer('sgd', learning_rate=0.1, weight_decay=0.0,
                                 gradient_clip=None,
                                 gradient_accumulation_steps=k)
        tx_ref = build_optimizer('sgd', learning_rate=0.1, weight_decay=0.0,
                                 gradient_clip=None)

        p_acc, p_ref = _params(), _params()
        s_acc, s_ref = tx_acc.init(p_acc), tx_ref.init(p_ref)

        for g in grads:
            up, s_acc = tx_acc.update(g, s_acc, p_acc)
            p_acc = jax.tree.map(lambda p, u: p + u, p_acc, up)
        up, s_ref = tx_ref.update(mean_grad, s_ref, p_ref)
        p_ref = jax.tree.map(lambda p, u: p + u, p_ref, up)

        for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_no_update_until_kth_microbatch(self):
        tx = build_optimizer('adamw', learning_rate=0.01,
                             gradient_accumulation_steps=3)
        p = _params()
        s = tx.init(p)
        for i in range(2):
            up, s = tx.update(_grad(i), s, p)
            assert all(np.all(np.asarray(u) == 0.0)
                       for u in jax.tree.leaves(up))
        up, s = tx.update(_grad(2), s, p)
        assert any(np.any(np.asarray(u) != 0.0)
                   for u in jax.tree.leaves(up))

    def test_lr_get_set_through_multisteps(self):
        tx = build_optimizer('adamw', learning_rate=0.003,
                             gradient_accumulation_steps=2)
        s = tx.init(_params())
        assert np.isclose(get_learning_rate(s), 0.003)
        s2 = set_learning_rate(s, 0.0005)
        assert np.isclose(get_learning_rate(s2), 0.0005)
        # State must remain usable (NamedTuple types preserved).
        up, s3 = tx.update(_grad(0), s2, _params())
        assert np.isclose(get_learning_rate(s3), 0.0005)

    def test_accumulation_one_is_identity_wrapper(self):
        tx = build_optimizer('adamw', learning_rate=0.01,
                             gradient_accumulation_steps=1)
        s = tx.init(_params())
        # No MultiSteps wrapper: first update applies immediately.
        up, _ = tx.update(_grad(0), s, _params())
        assert any(np.any(np.asarray(u) != 0.0)
                   for u in jax.tree.leaves(up))

    def test_trainer_accepts_accumulation(self, tmp_path):
        """Smoke: Trainer.train(gradient_accumulation_steps=2) runs and
        learns on a tiny ID-only problem."""
        import pandas as pd
        from pixelrec_multimodal_tpu.config import Config
        from pixelrec_multimodal_tpu.data.dataset import MultimodalDataset
        from pixelrec_multimodal_tpu.models import build_model
        from pixelrec_multimodal_tpu.training import Trainer

        rng = np.random.default_rng(0)
        rows = [(f'u{u}', f'i{i}', int(rng.integers(0, 100)))
                for u in range(6) for i in rng.choice(12, 4, replace=False)]
        inter = pd.DataFrame(rows, columns=['user_id', 'item_id', 'timestamp'])
        items = pd.DataFrame({'item_id': [f'i{j}' for j in range(12)],
                              'tag': ['t0'] * 12})
        cfg = Config()
        cfg.model.vision_model = None
        cfg.model.language_model = None
        cfg.model.embedding_dim = 8
        cfg.model.fusion_hidden_dims = [16]
        cfg.model.use_contrastive = False
        cfg.checkpoint_dir = str(tmp_path)
        ds = MultimodalDataset(inter, items, image_folder='/nonexistent',
                               vision_model_name=None,
                               language_model_name=None,
                               create_negative_samples=True,
                               categorical_feat_cols=['tag'])
        model = build_model(cfg.model, ds.n_users, ds.n_items, ds.n_tags,
                            num_numerical_features=0)
        trainer = Trainer(model, config=cfg, checkpoint_dir=str(tmp_path),
                          use_contrastive=False)
        losses, _ = trainer.train(ds, None, epochs=2, lr=0.05, batch_size=8,
                                  gradient_accumulation_steps=2)
        assert len(losses) == 2 and all(np.isfinite(losses))
