"""Live-dependency branch tests: optuna and wandb (VERDICT r4 #3).

The reference's HPO *is* Optuna (/root/reference/scripts/
hyperparameter_search.py:445-480) and its trainer logs + uploads
checkpoints to wandb (/root/reference/src/training/trainer.py:539-558,
666-671). Neither library is installed here, so those branches of OUR
code had zero test coverage — exactly how the reference's
FeatureCacheProcessor rotted (SURVEY.md §2.3). These tests install
minimal in-tree stubs and EXECUTE the live branches:

* optuna: a stub package whose surface delegates to the native engine
  (the two are API-compatible by design) plus a plotly-figure stand-in,
  injected before importing scripts/hyperparameter_search.py in a fresh
  subprocess — study creation, TPESampler/MedianPruner construction
  through the optuna names, storage + --resume, best_params artifacts,
  and the optuna.visualization HTML path all run.
* wandb: a recording fake driving utils/logging's init/log/finish and
  the trainer's best-checkpoint upload (maybe_wandb_save_checkpoint).
"""
import json
import subprocess
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]

_DRIVER = r"""
import json, sys, types, importlib.machinery
from pathlib import Path

import jax
jax.config.update('jax_platforms', 'cpu')

REPO = sys.argv[1]
ROOT = Path(sys.argv[2])
sys.path.insert(0, REPO)
sys.path.insert(0, REPO + '/scripts')

# ---- stub optuna package, backed by the API-compatible native engine
from pixelrec_multimodal_tpu import hpo as native


def mod(name):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = m
    return m


optuna = mod('optuna')
optuna.TrialPruned = native.TrialPruned
optuna.create_study = native.create_study
trial_m = mod('optuna.trial')
trial_m.TrialState = native.TrialState
optuna.trial = trial_m
samplers = mod('optuna.samplers')
samplers.TPESampler = native.TPESampler
samplers.RandomSampler = native.RandomSampler
optuna.samplers = samplers
pruners = mod('optuna.pruners')
pruners.MedianPruner = native.MedianPruner
optuna.pruners = pruners


class _Fig:
    def write_html(self, path):
        Path(path).write_text('<html>stub figure</html>')


vis = mod('optuna.visualization')
vis.plot_optimization_history = lambda study: _Fig()
vis.plot_param_importances = lambda study: _Fig()
vis.plot_parallel_coordinate = lambda study: _Fig()
optuna.visualization = vis

# ---- tiny ID-only workspace
import numpy as np, pandas as pd, yaml
rng = np.random.default_rng(5)
processed = ROOT / 'data/processed'; processed.mkdir(parents=True)
items = pd.DataFrame({
    'item_id': [f'i{j}' for j in range(40)],
    'title': [f'title {j}' for j in range(40)],
    'tag': [f'tag{j % 4}' for j in range(40)],
    'view_number': rng.integers(0, 100, 40).astype(float),
})
items.to_csv(processed / 'item_info.csv', index=False)
rows = [(f'u{u}', f'i{it}') for u in range(15)
        for it in rng.choice(40, 6, replace=False)]
inter = pd.DataFrame(rows, columns=['user_id', 'item_id'])
inter.to_csv(processed / 'interactions.csv', index=False)
splits = ROOT / 'data/splits/split_1'; splits.mkdir(parents=True)
perm = rng.permutation(len(inter))
inter.iloc[perm[:60]].to_csv(splits / 'train.csv', index=False)
inter.iloc[perm[60:75]].to_csv(splits / 'val.csv', index=False)
inter.iloc[perm[75:]].to_csv(splits / 'test.csv', index=False)
cfg = {
    'model': {'vision_model': None, 'language_model': None,
              'embedding_dim': 8, 'fusion_hidden_dims': [16],
              'use_contrastive': False, 'use_batch_norm': False},
    'training': {'batch_size': 32, 'epochs': 1, 'learning_rate': 0.01,
                 'patience': 3},
    'data': {
        'processed_item_info_path': str(processed / 'item_info.csv'),
        'processed_interactions_path': str(processed / 'interactions.csv'),
        'image_folder': str(ROOT / 'none'),
        'scaler_path': str(processed / 'numerical_scaler.pkl'),
        'split_data_path': str(splits),
        'train_data_path': str(splits / 'train.csv'),
        'val_data_path': str(splits / 'val.csv'),
        'test_data_path': str(splits / 'test.csv'),
        'numerical_features_cols': ['view_number'],
        'categorical_features_cols': ['tag'],
        'cache_config': {'enabled': False},
        'splitting': {'random_state': 42},
    },
    'recommendation': {'top_k': 5},
    'checkpoint_dir': str(ROOT / 'models/checkpoints'),
    'results_dir': str(ROOT / 'results'),
}
cfg_path = ROOT / 'config.yaml'
cfg_path.write_text(yaml.dump(cfg))

import hyperparameter_search as hs
assert hs._BACKEND == 'optuna', hs._BACKEND
assert hs.create_study is native.create_study
assert hs.MedianPruner is native.MedianPruner

out = ROOT / 'optuna_trials'
storage = str(ROOT / 'study.json')
study = hs.main(['--config', str(cfg_path), '--n_trials', '2',
                 '--output_dir', str(out), '--study_name', 'live_stub',
                 '--storage', storage, '--pruning'])
n_first = len(study.trials)
assert n_first == 2, n_first
assert (out / 'best_params.json').exists()
assert (out / 'study_results.json').exists()
# the optuna.visualization branch ran (stub figures -> HTML files)
assert (out / 'optimization_history.html').exists()
assert (out / 'parallel_coordinate.html').exists()

# storage + --resume accumulates into the same study
study2 = hs.main(['--config', str(cfg_path), '--n_trials', '1',
                  '--output_dir', str(out), '--study_name', 'live_stub',
                  '--storage', storage, '--resume'])
assert len(study2.trials) == 3, len(study2.trials)
best = json.loads((out / 'best_params.json').read_text())
assert 'learning_rate' in best['params']
print('OPTUNA_BRANCH_OK')
"""


@pytest.mark.slow
def test_optuna_branch_end_to_end(tmp_path):
    """scripts/hyperparameter_search.py's `import optuna` branch executes
    (stubbed by the native engine under the optuna names): study creation
    + TPE/MedianPruner via optuna names, 2 trials, storage, --resume,
    best_params + HTML visualization artifacts."""
    driver = tmp_path / 'driver.py'
    driver.write_text(_DRIVER)
    res = subprocess.run(
        [sys.executable, str(driver), str(REPO), str(tmp_path / 'ws')],
        capture_output=True, text=True, timeout=900, cwd=str(REPO))
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    assert 'OPTUNA_BRANCH_OK' in res.stdout


class _FakeRun:
    pass


class _FakeWandb(types.ModuleType):
    def __init__(self):
        super().__init__('wandb')
        self.run = None
        self.calls = []

    def init(self, **kw):
        self.run = _FakeRun()
        self.calls.append(('init', kw))

    def log(self, data, step=None):
        self.calls.append(('log', data, step))

    def save(self, glob_str, base_path=None, **kw):
        self.calls.append(('save', glob_str, base_path))

    def finish(self):
        self.calls.append(('finish',))
        self.run = None


@pytest.fixture
def fake_wandb(monkeypatch):
    from pixelrec_multimodal_tpu.utils import logging as ulog
    fake = _FakeWandb()
    monkeypatch.setattr(ulog, 'wandb', fake)
    monkeypatch.setattr(ulog, '_HAS_WANDB', True)
    return fake


class TestWandbBranch:
    def test_init_log_finish(self, fake_wandb):
        from pixelrec_multimodal_tpu.utils.logging import (
            maybe_wandb_finish,
            maybe_wandb_init,
            maybe_wandb_log,
        )
        assert maybe_wandb_init(project='p', name='r')
        maybe_wandb_log({'loss': 1.0}, {'loss': 0.9, 'auc': float('nan')},
                        epoch=3, lr=1e-3)
        maybe_wandb_finish()
        kinds = [c[0] for c in fake_wandb.calls]
        assert kinds == ['init', 'log', 'finish']
        _, data, step = fake_wandb.calls[1]
        assert data['train/loss'] == 1.0 and data['val/loss'] == 0.9
        assert 'val/auc' not in data  # NaN vals dropped (reference parity)
        assert data['train/learning_rate'] == 1e-3 and step == 3

    def test_trainer_best_checkpoint_upload(self, tmp_path, fake_wandb):
        """Trainer.save_checkpoint(is_best=True) uploads the Orbax
        checkpoint dir to the active wandb run (reference
        trainer.py:666-671); non-best saves do not."""
        import jax
        import optax
        from pixelrec_multimodal_tpu.models.multimodal import (
            MultimodalRecommender,
        )
        from pixelrec_multimodal_tpu.training.steps import init_train_state
        from pixelrec_multimodal_tpu.training.trainer import Trainer
        from pixelrec_multimodal_tpu.utils.logging import maybe_wandb_init

        model = MultimodalRecommender(
            n_users=4, n_items=8, n_tags=2, num_numerical_features=0,
            embedding_dim=4, vision_feature_dim=0, language_feature_dim=0,
            use_contrastive=False, fusion_hidden_dims=(8,),
            fusion_type='concatenate', use_batch_norm=False)
        trainer = Trainer(model, checkpoint_dir=str(tmp_path),
                          use_contrastive=False)
        trainer.state = init_train_state(model, optax.adam(1e-3),
                                         jax.random.PRNGKey(0))
        maybe_wandb_init(project='p')
        trainer.save_checkpoint('last_model')
        assert not any(c[0] == 'save' for c in fake_wandb.calls)
        trainer.save_checkpoint('best_model', is_best=True)
        saves = [c for c in fake_wandb.calls if c[0] == 'save']
        assert len(saves) == 1
        _, glob_str, base = saves[0]
        assert 'best_model' in glob_str and glob_str.endswith('**')
        assert base == str(trainer.model_checkpoint_dir)

    def test_no_run_is_noop(self, fake_wandb, tmp_path):
        from pixelrec_multimodal_tpu.utils.logging import (
            maybe_wandb_log,
            maybe_wandb_save_checkpoint,
        )
        maybe_wandb_log({'a': 1.0}, {}, 0, 0.1)   # no active run
        assert not maybe_wandb_save_checkpoint(tmp_path)
        assert fake_wandb.calls == []
