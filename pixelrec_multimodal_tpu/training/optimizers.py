# pixelrec_multimodal_tpu/training/optimizers.py
"""Optimizer and LR-schedule factories (optax).

Parity targets: the reference's optimizer factory
(/root/reference/src/training/trainer.py:99-130 — adamw / adam / sgd with the
torch coupling semantics) and scheduler factory (:132-163 — reduce_on_plateau /
cosine / step). All schedulers are host-driven per-epoch LR updates, exactly
as the reference steps them between epochs (:276-281): the compiled train step
reads the LR from an ``optax.inject_hyperparams`` slot the host mutates.
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import optax


def build_optimizer(optimizer_type: str = 'adamw',
                    learning_rate: float = 1e-3,
                    weight_decay: float = 0.01,
                    adam_beta1: float = 0.9,
                    adam_beta2: float = 0.999,
                    adam_eps: float = 1e-8,
                    gradient_clip: Optional[float] = 1.0,
                    gradient_accumulation_steps: int = 1
                    ) -> optax.GradientTransformation:
    """Global-norm clip -> optimizer, with a host-mutable learning rate.

    torch semantics preserved: AdamW decouples weight decay; Adam and SGD fold
    ``weight_decay`` into the gradient as an L2 penalty before the update;
    SGD uses momentum 0.9 (reference trainer.py:122-130).

    ``gradient_accumulation_steps`` > 1 wraps the whole chain in
    ``optax.MultiSteps``: gradients average over k micro-batches and the
    update (including clipping, measured on the averaged gradient) applies
    every k-th step — the feature the reference README advertises
    (README.md:310-315) without implementing.
    """
    kind = optimizer_type.lower()
    if kind == 'adamw':
        inner = optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, b1=adam_beta1, b2=adam_beta2,
            eps=adam_eps, weight_decay=weight_decay)
    elif kind == 'adam':
        def _adam(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.adam(learning_rate, b1=adam_beta1, b2=adam_beta2,
                           eps=adam_eps))
        inner = optax.inject_hyperparams(_adam)(learning_rate=learning_rate)
    elif kind == 'sgd':
        def _sgd(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.sgd(learning_rate, momentum=0.9))
        inner = optax.inject_hyperparams(_sgd)(learning_rate=learning_rate)
    else:
        print(f"Unknown optimizer type: {optimizer_type}. Using AdamW.")
        inner = optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, weight_decay=weight_decay)

    if gradient_clip is not None and gradient_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(gradient_clip), inner)
    else:
        tx = optax.chain(optax.identity(), inner)
    if gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=gradient_accumulation_steps)
    return tx


def with_frozen(tx: optax.GradientTransformation,
                trainable_mask) -> optax.GradientTransformation:
    """Apply ``tx`` only to trainable leaves; frozen leaves get zero updates.

    ``trainable_mask`` is a pytree of bools matching the params. Used for the
    reference's freeze_vision/freeze_language semantics
    (/root/reference/src/models/multimodal.py:230-250) — frozen encoder
    subtrees receive neither gradients nor (crucially, for AdamW) decoupled
    weight decay.
    """
    import jax

    frozen_mask = jax.tree.map(lambda b: not b, trainable_mask)
    return optax.chain(
        optax.masked(tx, trainable_mask),
        optax.masked(optax.set_to_zero(), frozen_mask),
    )


def _find_inject(node):
    """Locate the InjectHyperparamsState anywhere in an opt-state tree
    (it may be wrapped by chain tuples or optax.masked states)."""
    if hasattr(node, 'hyperparams'):
        return node
    if hasattr(node, 'inner_state'):
        return _find_inject(node.inner_state)
    if hasattr(node, 'inner_opt_state'):  # optax.MultiStepsState
        return _find_inject(node.inner_opt_state)
    if isinstance(node, (tuple, list)):
        for child in node:
            found = _find_inject(child)
            if found is not None:
                return found
    return None


def get_learning_rate(opt_state) -> float:
    inject = _find_inject(opt_state)
    if inject is None:
        raise ValueError("No inject-hyperparams state found in opt_state")
    return float(inject.hyperparams['learning_rate'])


def set_learning_rate(opt_state, lr: float):
    """Return a copy of opt_state with the LR hyperparameter replaced."""
    target = _find_inject(opt_state)
    if target is None:
        raise ValueError("No inject-hyperparams state found in opt_state")

    def rebuild(node):
        if node is target:
            hp = dict(node.hyperparams)
            hp['learning_rate'] = jnp.asarray(lr, jnp.float32)
            return node._replace(hyperparams=hp)
        if hasattr(node, 'inner_state'):
            return node._replace(inner_state=rebuild(node.inner_state))
        if hasattr(node, 'inner_opt_state'):  # optax.MultiStepsState
            return node._replace(inner_opt_state=rebuild(node.inner_opt_state))
        if isinstance(node, tuple):
            if hasattr(node, '_fields'):  # preserve NamedTuple states
                return type(node)(*(rebuild(c) for c in node))
            return tuple(rebuild(c) for c in node)
        if isinstance(node, list):
            return [rebuild(c) for c in node]
        return node

    return rebuild(opt_state)


class LRScheduler:
    """Host-side per-epoch LR controller.

    reduce_on_plateau: multiply by ``factor`` after ``patience`` epochs without
    val-loss improvement (torch ReduceLROnPlateau mode='min'). cosine:
    CosineAnnealingLR over ``total_epochs``. step: StepLR with
    step_size=``patience``, gamma=``factor``.
    """

    def __init__(self, scheduler_type: str = 'reduce_on_plateau',
                 base_lr: float = 1e-3, patience: int = 2, factor: float = 0.5,
                 min_lr: float = 1e-6, total_epochs: int = 10):
        self.kind = scheduler_type.lower()
        if self.kind not in ('reduce_on_plateau', 'cosine', 'step'):
            print(f"Unknown scheduler type: {scheduler_type}. "
                  "Using ReduceLROnPlateau.")
            self.kind = 'reduce_on_plateau'
        self.base_lr = base_lr
        self.patience = patience
        self.factor = factor
        self.min_lr = min_lr
        self.total_epochs = max(total_epochs, 1)
        self._lr = base_lr
        self._best = math.inf
        self._bad_epochs = 0
        self._epoch = 0

    @property
    def lr(self) -> float:
        return self._lr

    def step(self, val_loss: Optional[float] = None) -> float:
        """Advance one epoch; returns the LR for the next epoch."""
        self._epoch += 1
        if self.kind == 'reduce_on_plateau':
            if val_loss is not None and not math.isnan(val_loss):
                # torch default threshold 1e-4 (rel mode 'rel' on 'min').
                if val_loss < self._best * (1 - 1e-4):
                    self._best = val_loss
                    self._bad_epochs = 0
                else:
                    self._bad_epochs += 1
                    if self._bad_epochs > self.patience:
                        self._lr = max(self._lr * self.factor, self.min_lr)
                        self._bad_epochs = 0
        elif self.kind == 'cosine':
            t = self._epoch % (2 * self.total_epochs)
            self._lr = self.min_lr + 0.5 * (self.base_lr - self.min_lr) * (
                1 + math.cos(math.pi * t / self.total_epochs))
        elif self.kind == 'step':
            self._lr = self.base_lr * (
                self.factor ** (self._epoch // max(self.patience, 1)))
        return self._lr

    def state_dict(self) -> dict:
        return {'kind': self.kind, 'lr': self._lr, 'best': self._best,
                'bad_epochs': self._bad_epochs, 'epoch': self._epoch}

    def load_state_dict(self, d: dict):
        self._lr = d.get('lr', self._lr)
        self._best = d.get('best', self._best)
        self._bad_epochs = d.get('bad_epochs', 0)
        self._epoch = d.get('epoch', 0)
