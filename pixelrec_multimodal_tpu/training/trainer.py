# pixelrec_multimodal_tpu/training/trainer.py
"""Host-side training orchestration.

Parity target: /root/reference/src/training/trainer.py:23-845 (Trainer). The
epoch loop, metric bookkeeping, generic-metric early stopping with direction,
per-epoch last/best checkpoints, scheduler stepping, and wandb-gated logging
all match the reference; the per-batch work runs as the compiled steps in
training/steps.py. The host only shuffles indices, feeds batches, reads one
small metrics dict per step, and makes control decisions between epochs.
"""
from __future__ import annotations

import math
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.checkpointing import load_checkpoint, save_checkpoint
from ..utils.logging import maybe_wandb_log, maybe_wandb_save_checkpoint
from .optimizers import (
    LRScheduler,
    build_optimizer,
    get_learning_rate,
    set_learning_rate,
)
from .steps import TrainState, dropout_key, init_train_state, make_step_fns

_METRIC_KEYS = ('total_loss', 'bce_loss', 'contrastive_loss', 'accuracy',
                'precision', 'recall', 'f1_score')


def _finalize_epoch_metrics(loss_sums: Dict[str, float], valid_batches: int,
                            sums: Dict[str, float]) -> Dict[str, float]:
    """Batch-mean losses + epochwise precision/recall/F1 from count sums
    (reference trainer.py:421-439)."""
    nb = max(valid_batches, 1) if valid_batches else None
    tp, fp, fn = sums['tp'], sums['fp'], sums['fn']
    count = sums['count']
    precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if (precision + recall) > 0 else 0.0)
    return {
        'total_loss': loss_sums['total_loss'] / nb if nb else float('nan'),
        'bce_loss': loss_sums['bce_loss'] / nb if nb else float('nan'),
        'contrastive_loss': loss_sums['contrastive_loss'] / nb if nb else float('nan'),
        'accuracy': sums['correct'] / count if count > 0 else 0.0,
        'precision': precision,
        'recall': recall,
        'f1_score': f1,
    }


class Trainer:
    """Drives compiled train/eval steps over a MultimodalDataset."""

    def __init__(self, model, config=None,
                 checkpoint_dir: str = 'models/checkpoints',
                 use_contrastive: bool = True,
                 trial_info: Optional[Dict[str, Any]] = None,
                 mesh=None, seed: int = 0, compiled_epochs: bool = True):
        self.model = model
        self.config = config
        self.mesh = mesh
        self.seed = seed
        self.base_checkpoint_dir = Path(checkpoint_dir)
        if config is not None and hasattr(config, 'model'):
            combo = f"{config.model.vision_model}_{config.model.language_model}"
            self.model_checkpoint_dir = self.base_checkpoint_dir / combo
        else:
            self.model_checkpoint_dir = self.base_checkpoint_dir
            print("Warning: No model config provided to Trainer. "
                  "Using base checkpoint directory.")
        self.encoders_dir = self.base_checkpoint_dir / 'encoders'
        self.model_checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.encoders_dir.mkdir(parents=True, exist_ok=True)
        print("Trainer initialized:")
        print(f"  → Model checkpoints: {self.model_checkpoint_dir}")
        print(f"  → Shared encoders: {self.encoders_dir}")

        self.use_contrastive = use_contrastive
        self.trial_info = trial_info
        # Whole-epoch compiled scans (one device call per epoch). Possible
        # because batches are index triples gathered against device tables.
        self.compiled_epochs = compiled_epochs
        self.epoch = 0
        self.patience_counter = 0
        self.best_early_stopping_score: Optional[float] = None
        self.state: Optional[TrainState] = None
        self.scheduler: Optional[LRScheduler] = None
        self.training_history: Dict[str, Any] = {
            'train_losses': [], 'val_losses': [],
            'train_metrics': [], 'val_metrics': [], 'best_metrics': {},
        }

    # ------------------------------------------------------------------ train
    def train(self, train_dataset, val_dataset, epochs: int = 10,
              lr: float = 0.001, weight_decay: float = 0.01, patience: int = 3,
              gradient_clip: float = 1.0, optimizer_type: str = 'adamw',
              adam_beta1: float = 0.9, adam_beta2: float = 0.999,
              adam_eps: float = 1e-8, use_lr_scheduler: bool = True,
              lr_scheduler_type: str = 'reduce_on_plateau',
              lr_scheduler_patience: int = 2, lr_scheduler_factor: float = 0.5,
              lr_scheduler_min_lr: float = 1e-6,
              batch_size: int = 64,
              gradient_accumulation_steps: int = 1,
              ) -> Tuple[List[float], List[float]]:
        """Run the epoch loop; returns (train_losses, val_losses)."""
        tx = build_optimizer(optimizer_type, lr, weight_decay, adam_beta1,
                             adam_beta2, adam_eps, gradient_clip,
                             gradient_accumulation_steps)
        rng = jax.random.PRNGKey(self.seed)
        if self.state is None:
            self.state = init_train_state(self.model, tx, rng)
        if use_lr_scheduler:
            self.scheduler = LRScheduler(
                lr_scheduler_type, base_lr=lr, patience=lr_scheduler_patience,
                factor=lr_scheduler_factor, min_lr=lr_scheduler_min_lr,
                total_epochs=epochs)

        # Packed float tables (one wide row gather per batch) + bf16 upload
        # for a bf16 model: both value-identical in the compiled step
        # (tests/unit/test_packed_tables.py) and together the frozen path's
        # measured gather lever (scripts/profile_frozen_roofline.py).
        table_dtype = (self.model.dtype
                       if self.model.dtype == jnp.bfloat16 else None)
        tables = train_dataset.feature_store.device_tables(
            mesh=self.mesh, pack=True, dtype=table_dtype)
        cw = bw = None
        if self.config is not None:
            cw = self.config.training.contrastive_weight
            bw = self.config.training.bce_weight
        train_step, eval_step, train_epoch, eval_epoch = make_step_fns(
            self.model, tables,
            bce_weight=1.0 if bw is None else bw,
            contrastive_weight=0.1 if cw is None else cw,
            use_contrastive=self.use_contrastive,
            return_epoch_fns=True)
        self._eval_step = eval_step
        self._train_epoch_fn = train_epoch if self.compiled_epochs else None
        self._eval_epoch_fn = eval_epoch if self.compiled_epochs else None

        train_losses: List[float] = []
        val_losses: List[float] = []
        dropout_rng = dropout_key(self.seed + 1)

        for epoch_num in range(self.epoch, epochs):
            self.epoch = epoch_num

            train_metrics = self._run_epoch(
                train_step, train_dataset, batch_size, epoch_num, dropout_rng,
                training=True)
            self.training_history['train_metrics'].append(train_metrics)
            self.training_history['train_losses'].append(
                train_metrics['total_loss'])
            train_losses.append(train_metrics['total_loss'])

            validated = False
            if val_dataset is not None and len(val_dataset) > 0:
                val_metrics = self._run_epoch(
                    eval_step, val_dataset, batch_size, epoch_num, None,
                    training=False)
                validated = not math.isnan(val_metrics['total_loss'])
                val_losses.append(val_metrics['total_loss'])
                if validated:
                    self.training_history['val_metrics'].append(val_metrics)
                    self.training_history['val_losses'].append(
                        val_metrics['total_loss'])
                    self._update_best_metrics(val_metrics)
            else:
                print(f"Epoch {self.epoch + 1}: Validation skipped "
                      "(no validation data).")
                val_metrics = {k: (float('nan') if 'loss' in k else 0.0)
                               for k in _METRIC_KEYS}
                val_losses.append(float('nan'))

            maybe_wandb_log(train_metrics, val_metrics, self.epoch,
                            self.get_learning_rate())

            # Scheduler stepping (reference trainer.py:276-281): plateau steps
            # on val loss, others step unconditionally.
            if self.scheduler is not None:
                if self.scheduler.kind == 'reduce_on_plateau':
                    if validated:
                        new_lr = self.scheduler.step(val_metrics['total_loss'])
                        self._apply_lr(new_lr)
                else:
                    self._apply_lr(self.scheduler.step())

            if self.best_early_stopping_score is None and validated:
                direction = self._direction()
                self.best_early_stopping_score = (
                    float('inf') if direction == 'minimize' else float('-inf'))

            if validated:
                score = self._early_stopping_score(val_metrics)
                if score is not None and not math.isnan(score):
                    if self._check_early_stopping(score, patience):
                        print(f"Early stopping at epoch {self.epoch + 1} "
                              f"based on {self._monitor_name()}")
                        self.save_checkpoint('last_model')
                        break

            self.save_checkpoint('last_model')
            self._print_epoch_summary(epoch_num, epochs, train_metrics,
                                      val_metrics)

        return train_losses, val_losses

    # ------------------------------------------------------------ inner loops
    def _run_epoch(self, step_fn, dataset, batch_size: int, epoch: int,
                   dropout_rng, training: bool) -> Dict[str, float]:
        epoch_fn = self._train_epoch_fn if training else self._eval_epoch_fn
        if epoch_fn is not None:
            return self._run_epoch_compiled(epoch_fn, dataset, batch_size,
                                            epoch, dropout_rng, training)
        loss_sums = {'total_loss': 0.0, 'bce_loss': 0.0, 'contrastive_loss': 0.0}
        sums = {'correct': 0.0, 'tp': 0.0, 'fp': 0.0, 'fn': 0.0, 'count': 0.0}
        valid_batches = 0

        from ..data.loader import PrefetchLoader
        sharding = None
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding
            sharding = batch_sharding(self.mesh)
        loader = PrefetchLoader(
            dataset.batches(batch_size, shuffle=training,
                            seed=self.seed + epoch),
            prefetch=2, sharding=sharding)
        for bidx, batch in enumerate(loader):
            if training:
                step_rng = jax.random.fold_in(dropout_rng, epoch * 100000 + bidx)
                self.state, metrics = step_fn(self.state, batch, step_rng)
            else:
                metrics = step_fn(self.state, batch)
            metrics = jax.device_get(metrics)
            total = float(metrics['total_loss'])
            if math.isfinite(total):
                for k in loss_sums:
                    loss_sums[k] += float(metrics[k])
                valid_batches += 1
                for k in sums:
                    sums[k] += float(metrics[k])
            else:
                print(f"WARNING: Skipping metrics for batch {bidx} due to "
                      "non-finite loss (NaN or Inf).")
                sums['count'] += float(metrics['count'])
        return _finalize_epoch_metrics(loss_sums, valid_batches, sums)

    def _run_epoch_compiled(self, epoch_fn, dataset, batch_size: int,
                            epoch: int, dropout_rng, training: bool
                            ) -> Dict[str, float]:
        """One compiled scan for the whole epoch; one metrics transfer."""
        stacked = dataset.stacked_batches(batch_size, shuffle=training,
                                          seed=self.seed + epoch)
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding
            sh = batch_sharding(self.mesh)
            # Leading axis is the scan (batch-count) axis; shard axis 1.
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import DATA_AXIS
            sh = NamedSharding(self.mesh, P(None, DATA_AXIS))
            stacked = {k: jax.device_put(v, sh) for k, v in stacked.items()}
        if training:
            rng = jax.random.fold_in(dropout_rng, epoch)
            self.state, metrics = epoch_fn(self.state, stacked, rng)
        else:
            metrics = epoch_fn(self.state, stacked)
        metrics = jax.device_get(metrics)

        # Reproduce per-batch accounting: skip non-finite batches.
        totals = np.asarray(metrics['total_loss'])
        finite = np.isfinite(totals)
        n_valid = int(finite.sum())
        if n_valid < len(totals):
            print(f"WARNING: {len(totals) - n_valid} batches skipped due to "
                  "non-finite loss (NaN or Inf).")
        loss_sums = {k: float(np.asarray(metrics[k])[finite].sum())
                     for k in ('total_loss', 'bce_loss', 'contrastive_loss')}
        sums = {k: float(np.asarray(metrics[k])[finite].sum())
                for k in ('correct', 'tp', 'fp', 'fn', 'count')}
        sums['count'] += float(np.asarray(metrics['count'])[~finite].sum())
        return _finalize_epoch_metrics(loss_sums, n_valid, sums)

    # --------------------------------------------------------- early stopping
    def _monitor_name(self) -> str:
        if self.config is not None:
            return self.config.training.early_stopping_metric
        return 'val_loss'

    def _direction(self) -> str:
        if self.config is not None:
            return self.config.training.early_stopping_direction
        return 'minimize'

    def _early_stopping_score(self, val_metrics: Dict[str, float]
                              ) -> Optional[float]:
        """Resolve the configured metric against the val dict (reference
        trainer.py:291-309: strip 'val_', 'loss' -> 'total_loss',
        fall back to val loss)."""
        key = self._monitor_name().replace('val_', '')
        if key == 'loss':
            key = 'total_loss'
        score = val_metrics.get(key)
        if score is None:
            print(f"Warning: Early stopping metric '{self._monitor_name()}' "
                  f"(lookup key: '{key}') not found. Defaulting to val_loss.")
            score = val_metrics.get('total_loss')
            if self.config is not None:
                self.config.training.early_stopping_direction = 'minimize'
        return score

    def _check_early_stopping(self, score: float, patience: int) -> bool:
        if math.isnan(score):
            print("Warning: Early stopping score is NaN. "
                  "Skipping check for this epoch.")
            return False
        if self._direction() == 'minimize':
            improved = score < self.best_early_stopping_score
        else:
            improved = score > self.best_early_stopping_score
        if improved:
            self.best_early_stopping_score = score
            self.patience_counter = 0
            self.save_checkpoint('best_model', is_best=True)
            return False
        self.patience_counter += 1
        return self.patience_counter >= patience

    def _update_best_metrics(self, val_metrics: Dict[str, float]):
        best = self.training_history['best_metrics']
        for key, value in val_metrics.items():
            name = f'val_{key}'
            if name not in best:
                best[name] = value
            elif 'loss' in key:
                best[name] = min(best[name], value)
            else:
                best[name] = max(best[name], value)

    # ------------------------------------------------------------ checkpoints
    def save_checkpoint(self, filename: str, is_best: bool = False,
                        additional_info: Optional[Dict[str, Any]] = None):
        """Persist train state + metadata (reference trainer.py:625-671)."""
        if self.state is None:
            return
        state = {'params': self.state.params,
                 'opt_state': self.state.opt_state,
                 'step': self.state.step}
        if self.state.batch_stats is not None:
            state['batch_stats'] = self.state.batch_stats
        meta = {
            'epoch': self.epoch,
            'best_early_stopping_score': self.best_early_stopping_score,
            'early_stopping_metric': self._monitor_name(),
            'early_stopping_direction': self._direction(),
            'training_history': self.training_history,
            'best_metrics': self.get_all_best_metrics(),
            'scheduler_state': (self.scheduler.state_dict()
                                if self.scheduler else None),
        }
        if self.config is not None:
            meta['model_config'] = {
                'vision_model': self.config.model.vision_model,
                'language_model': self.config.model.language_model,
            }
        if self.trial_info:
            meta['trial_info'] = self.trial_info
        if additional_info:
            meta['additional_info'] = additional_info
        path = save_checkpoint(self.model_checkpoint_dir, filename, state, meta)
        if is_best:
            print(f"Saved best model checkpoint to {path}")
            # Reference parity: best checkpoints upload to the active
            # wandb run (reference trainer.py:666-671); no-op when wandb
            # is absent or no run is active.
            maybe_wandb_save_checkpoint(path)

    def load_checkpoint(self, filename: str):
        """Restore train state + metadata (reference trainer.py:674-716)."""
        target = None
        if self.state is not None:
            target = {'params': self.state.params,
                      'opt_state': self.state.opt_state,
                      'step': self.state.step}
            if self.state.batch_stats is not None:
                target['batch_stats'] = self.state.batch_stats
        restored = load_checkpoint(self.model_checkpoint_dir, filename, target)
        if restored is None:
            print(f"Warning: Checkpoint file not found at "
                  f"{self.model_checkpoint_dir / filename}")
            return
        state, meta = restored['state'], restored['meta']
        if self.state is not None:
            self.state = self.state.replace(
                params=state['params'],
                opt_state=state.get('opt_state', self.state.opt_state),
                batch_stats=state.get('batch_stats', self.state.batch_stats),
                step=state.get('step', self.state.step))
        else:
            self._pending_state = state
        self.epoch = meta.get('epoch', 0)
        self.best_early_stopping_score = meta.get(
            'best_early_stopping_score', meta.get('best_val_loss'))
        if 'training_history' in meta:
            self.training_history = meta['training_history']
        if 'trial_info' in meta:
            self.trial_info = meta['trial_info']
        if meta.get('scheduler_state') and self.scheduler is not None:
            self.scheduler.load_state_dict(meta['scheduler_state'])
        print(f"Loaded checkpoint from {self.model_checkpoint_dir / filename} "
              f"(epoch {self.epoch})")

    # ----------------------------------------------------------------- helpers
    def _apply_lr(self, lr: float):
        self.state = self.state.replace(
            opt_state=set_learning_rate(self.state.opt_state, lr))

    def get_learning_rate(self) -> float:
        if self.state is None:
            return 0.0
        try:
            return get_learning_rate(self.state.opt_state)
        except Exception:
            return 0.0

    def get_model_checkpoint_dir(self) -> Path:
        return self.model_checkpoint_dir

    def get_encoders_dir(self) -> Path:
        return self.encoders_dir

    def get_best_metric(self, metric_name: str = 'val_loss') -> float:
        """Best value seen for a metric (reference trainer.py:749-798)."""
        best = self.training_history['best_metrics']
        if metric_name in best:
            return best[metric_name]
        for prefix, hist_key in (('val_', 'val_metrics'),
                                 ('train_', 'train_metrics')):
            if metric_name.startswith(prefix):
                key = metric_name[len(prefix):]
                rows = self.training_history[hist_key]
                values = [m.get(key) for m in rows if key in m]
                if values:
                    return (min(values) if 'loss' in metric_name
                            else max(values))
        return float('inf') if 'loss' in metric_name else float('-inf')

    def get_all_best_metrics(self) -> Dict[str, float]:
        out = {}
        for name in ('total_loss', 'bce_loss', 'contrastive_loss', 'accuracy',
                     'f1_score', 'precision', 'recall'):
            v = self.get_best_metric(f'val_{name}')
            if math.isfinite(v):
                out[f'val_{name}'] = v
        for name in ('total_loss', 'bce_loss', 'contrastive_loss', 'accuracy',
                     'f1_score'):
            v = self.get_best_metric(f'train_{name}')
            if math.isfinite(v):
                out[f'train_{name}'] = v
        return out

    def get_trial_number(self) -> Optional[int]:
        if self.trial_info and 'trial_number' in self.trial_info:
            return self.trial_info['trial_number']
        return None

    def update_trial_info(self, info: Dict[str, Any]):
        if self.trial_info is None:
            self.trial_info = {}
        self.trial_info.update(info)

    def _print_epoch_summary(self, epoch: int, total_epochs: int,
                             train_metrics, val_metrics):
        def fmt(x):
            return f"{x:.4f}" if isinstance(x, float) and math.isfinite(x) else "N/A"
        print(f"\nEpoch {epoch + 1}/{total_epochs}")
        print(f"Train Loss: {fmt(train_metrics['total_loss'])} "
              f"(BCE: {fmt(train_metrics['bce_loss'])}, "
              f"Contrastive: {fmt(train_metrics['contrastive_loss'])})")
        print(f"Train Acc: {fmt(train_metrics['accuracy'])} | "
              f"Train F1: {fmt(train_metrics['f1_score'])}")
        print(f"Val Loss: {fmt(val_metrics['total_loss'])} "
              f"(BCE: {fmt(val_metrics['bce_loss'])}, "
              f"Contrastive: {fmt(val_metrics['contrastive_loss'])})")
        print(f"Val Acc: {fmt(val_metrics['accuracy'])} | "
              f"Val F1: {fmt(val_metrics['f1_score'])}")
        print(f"Learning Rate: {self.get_learning_rate():.6f}")
        print("-" * 50)
