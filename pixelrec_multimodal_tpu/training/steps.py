# pixelrec_multimodal_tpu/training/steps.py
"""Compiled train/eval steps.

The whole of the reference's per-batch work — feature fetch, forward, loss,
backward, clip, update, metric accumulation
(/root/reference/src/training/trainer.py:326-525) — compiles here into single
XLA programs. Item-side features are gathered from device-resident tables by
item index inside the graph; classification metrics accumulate as in-graph
sums (a single small transfer per step instead of per-batch ``.item()``
syncs). The non-finite-loss skip (reference trainer.py:394-412) is a
``lax.cond`` on the loss value, so bad batches leave optimizer state and
batch stats untouched without host round-trips.

Under a sharded batch (parallel/mesh.py), jit partitions these steps over the
mesh: gradient psums and metric reductions are emitted by XLA from the
sharding annotations.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import core, struct


class TrainState(struct.PyTreeNode):
    """Minimal train state: params + BN stats + optimizer state."""
    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: Any
    opt_state: optax.OptState
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, apply_fn, params, batch_stats, tx):
        return cls(step=jnp.asarray(0), params=params, batch_stats=batch_stats,
                   opt_state=tx.init(params), apply_fn=apply_fn, tx=tx)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt_state)


def dropout_key(seed: int):
    """Dropout PRNG key (threefry).

    threefry mask generation measures 32% of the frozen train epoch on a
    v5e (scripts/profile_frozen_roofline.py). rbg keys were measured as
    the obvious lever and are a recorded DEAD END on this backend: the
    same rbg epoch program runs bimodally — 87-91 ms in some processes,
    480-3900 ms in others (5 runs, identical HLO; threefry stays at
    ~126 ms throughout, so it is not tunnel load) — i.e. the rbg
    primitive's runtime performance is not dependable here. Revisit if
    the backend's rbg lowering stabilizes.
    """
    return jax.random.PRNGKey(seed)


# kwarg name + model-dim attribute for each float feature table
_FEATURE_TABLE_SPEC = {
    'vision_emb': ('vision_features', 'vision_feature_dim'),
    'language_emb': ('language_features', 'language_feature_dim'),
    'numerical': ('numerical_features', 'num_numerical_features'),
    'clip_text_emb': ('clip_text_features', 'clip_text_feature_dim'),
}
PACKED_PREFIX = 'packed::'


def gather_feature_kwargs(model, tables: Dict[str, jnp.ndarray],
                          batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Item-index gathers from the feature tables -> model kwargs.

    This is the device-side replacement for the reference's per-sample cache
    lookup + collate (dataset.py:217-249). A modality the model declares but
    whose table is absent (e.g. encoder precompute not run) degrades to zero
    features — the reference's placeholder-tensor semantics for missing
    features (dataset.py:306-322) — so the compiled graph shape always matches
    the model configuration.

    A key of the form ``packed::<name>=<width>+<name>=<width>+...`` holds
    the listed float tables concatenated along the feature axis; ONE row
    gather replaces one per table (measured: TPU gathers are
    per-row-cost-bound, not byte-bound — scripts/profile_frozen_roofline.py),
    and the slices recover each modality. The layout lives in the KEY
    (static pytree structure), so the packed table still rides the
    jit-argument path instead of being baked into the executable as a
    constant.
    """
    it = batch['item_idx']
    B = it.shape[0]

    kw: Dict[str, jnp.ndarray] = {}
    packed_key = next((k for k in tables if k.startswith(PACKED_PREFIX)), None)
    if packed_key is not None:
        row = jnp.take(tables[packed_key], it, axis=0)
        off = 0
        for part in packed_key[len(PACKED_PREFIX):].split('+'):
            name, _, width = part.partition('=')
            width = int(width)
            kwarg, dim_attr = _FEATURE_TABLE_SPEC[name]
            wanted = (int(getattr(model, dim_attr) or 0) > 0
                      if name != 'clip_text_emb' else model.contrastive_active)
            if wanted:
                kw[kwarg] = jax.lax.slice_in_dim(row, off, off + width, axis=1)
            off += width

    def take_or_zeros(name, dim):
        if name in tables:
            return jnp.take(tables[name], it, axis=0)
        return jnp.zeros((B, dim), jnp.float32)

    for name, (kwarg, dim_attr) in _FEATURE_TABLE_SPEC.items():
        if kwarg in kw:
            continue
        dim = int(getattr(model, dim_attr) or 0)
        needed = (dim > 0 if name != 'clip_text_emb'
                  else model.contrastive_active)
        if needed:
            kw[kwarg] = take_or_zeros(name, dim)
    return kw


def _classification_sums(preds: jnp.ndarray, labels: jnp.ndarray,
                         weight: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Weighted tp/fp/fn/correct/count sums at threshold 0.5
    (reference trainer.py:405-410)."""
    hard = (preds > 0.5).astype(jnp.float32)
    pos = labels > 0.5
    return {
        'correct': jnp.sum(weight * (hard == labels)),
        'tp': jnp.sum(weight * ((hard == 1) & pos)),
        'fp': jnp.sum(weight * ((hard == 1) & ~pos)),
        'fn': jnp.sum(weight * ((hard == 0) & pos)),
        'count': jnp.sum(weight),
    }


def make_step_fns(model, tables: Dict[str, jnp.ndarray],
                  bce_weight: float = 1.0,
                  contrastive_weight: float = 0.1,
                  use_contrastive: Optional[bool] = None,
                  extra_features_fn: Optional[Callable] = None,
                  return_epoch_fns: bool = False):
    """Build jitted (train_step, eval_step) closures over model + tables;
    with ``return_epoch_fns`` also (train_epoch, eval_epoch) that run a whole
    epoch of stacked batches in one compiled scan.

    ``extra_features_fn(batch) -> kwargs`` lets end-to-end (unfrozen encoder)
    training inject pixel/token-derived features; default is table gathers.
    """
    from ..models.losses import recommender_loss

    contrastive = (model.contrastive_active if use_contrastive is None
                   else use_contrastive and model.contrastive_active)

    def forward(params, batch_stats, tables_in, batch, rng, train: bool):
        kw = gather_feature_kwargs(model, tables_in, batch)
        if extra_features_fn is not None:
            kw.update(extra_features_fn(batch))
        variables = {'params': params}
        if batch_stats is not None:
            variables['batch_stats'] = batch_stats
        mutable = ['batch_stats'] if (train and batch_stats is not None) else False
        rngs = {'dropout': rng} if train else None
        out = model.apply(
            variables, batch['user_idx'], batch['item_idx'], batch['tag_idx'],
            train=train, return_embeddings=contrastive, rngs=rngs,
            mutable=mutable, **kw)
        new_stats = None
        if mutable:
            out, mutated = out
            new_stats = mutated.get('batch_stats')
        if contrastive:
            scores, vis_c, txt_c, _ = out
        else:
            scores, vis_c, txt_c = out, None, None
        temp = params['temperature'] if contrastive and 'temperature' in params \
            else model.contrastive_temperature
        loss = recommender_loss(
            scores.squeeze(-1), batch['label'], vis_c, txt_c, temp,
            use_contrastive=contrastive, contrastive_weight=contrastive_weight,
            bce_weight=bce_weight, weight=batch.get('weight'))
        return scores, loss, new_stats

    def train_step(state: TrainState, tables_in, batch, rng):
        def loss_fn(params):
            scores, loss, new_stats = forward(params, state.batch_stats,
                                              tables_in, batch, rng,
                                              train=True)
            return loss['total'], (scores, loss, new_stats)

        grads, (scores, loss, new_stats) = jax.grad(
            loss_fn, has_aux=True)(state.params)

        finite = jnp.isfinite(loss['total'])

        def do_update(_):
            s = state.apply_gradients(grads)
            if new_stats is not None:
                s = s.replace(batch_stats=new_stats)
            return s

        new_state = jax.lax.cond(finite, do_update, lambda _: state, None)
        weight = batch.get('weight', jnp.ones_like(batch['label']))
        metrics = {
            'total_loss': loss['total'], 'bce_loss': loss['bce'],
            'contrastive_loss': loss['contrastive'],
            **_classification_sums(scores.squeeze(-1), batch['label'], weight),
        }
        return new_state, metrics

    def eval_step(state: TrainState, tables_in, batch):
        scores, loss, _ = forward(state.params, state.batch_stats, tables_in,
                                  batch, rng=None, train=False)
        weight = batch.get('weight', jnp.ones_like(batch['label']))
        return {
            'total_loss': loss['total'], 'bce_loss': loss['bce'],
            'contrastive_loss': loss['contrastive'],
            **_classification_sums(scores.squeeze(-1), batch['label'], weight),
        }

    def train_epoch(state: TrainState, tables_in, batches, rng):
        """A WHOLE epoch as one compiled program.

        ``batches``: dict of arrays with a leading [num_batches] axis (cheap —
        training batches are index triples, so an epoch of batches is a few
        MB). The scan keeps optimizer state on device for the entire epoch;
        the host sees one metrics transfer per epoch instead of one per step.
        This is only possible because of the table-based data design — the
        reference's per-batch host collate forces a host round-trip per step.

        Per-batch metric sums are returned stacked ([num_batches]) so the
        host can reproduce the reference's skip-non-finite-batch accounting
        (trainer.py:394-412) exactly.
        """
        def body(carry, batch):
            st, step_rng = carry
            step_rng, use = jax.random.split(step_rng)
            st, metrics = train_step(st, tables_in, batch, use)
            return (st, step_rng), metrics

        (state, _), metrics = jax.lax.scan(body, (state, rng), batches)
        return state, metrics

    def eval_epoch(state: TrainState, tables_in, batches):
        """Whole-epoch validation as one compiled program."""
        def body(carry, batch):
            return carry, eval_step(state, tables_in, batch)

        _, metrics = jax.lax.scan(body, None, batches)
        return metrics

    # Route the (potentially huge) feature tables through the jit boundary
    # as arguments rather than closure captures: captured device arrays are
    # baked into the executable as constants (duplicating HBM, and on
    # remote-compile backends shipped inside the compile request).
    jit_train_step = jax.jit(train_step, donate_argnums=(0,))
    jit_eval_step = jax.jit(eval_step)
    jit_train_epoch = jax.jit(train_epoch, donate_argnums=(0,))
    jit_eval_epoch = jax.jit(eval_epoch)

    fns = (lambda state, batch, rng: jit_train_step(state, tables, batch, rng),
           lambda state, batch: jit_eval_step(state, tables, batch),
           lambda state, batches, rng: jit_train_epoch(state, tables,
                                                       batches, rng),
           lambda state, batches: jit_eval_epoch(state, tables, batches))
    # The raw jitted fns (tables as explicit args) for profilers that need
    # .lower().compile().cost_analysis() without baking tables as constants.
    for wrapper, jitted in zip(fns, (jit_train_step, jit_eval_step,
                                     jit_train_epoch, jit_eval_epoch)):
        wrapper.jitted = jitted
    return fns[:2] if not return_epoch_fns else fns


def init_train_state(model, tx, rng, batch_size: int = 2,
                     tables: Optional[Dict[str, jnp.ndarray]] = None
                     ) -> TrainState:
    """Initialize parameters with dummy static-shaped inputs."""
    dummy_idx = jnp.zeros((batch_size,), jnp.int32)
    kw = {}
    if model.vision_feature_dim:
        kw['vision_features'] = jnp.zeros((batch_size, model.vision_feature_dim),
                                          jnp.float32)
    if model.language_feature_dim:
        kw['language_features'] = jnp.zeros(
            (batch_size, model.language_feature_dim), jnp.float32)
    if model.num_numerical_features > 0:
        kw['numerical_features'] = jnp.zeros(
            (batch_size, model.num_numerical_features), jnp.float32)
    if model.contrastive_active:
        kw['clip_text_features'] = jnp.zeros(
            (batch_size, model.clip_text_feature_dim), jnp.float32)
    variables = model.init({'params': rng}, dummy_idx, dummy_idx, dummy_idx,
                           train=False, return_embeddings=model.contrastive_active,
                           **kw)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables['params'],
        batch_stats=variables.get('batch_stats'),
        tx=tx)
