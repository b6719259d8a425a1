# pixelrec_multimodal_tpu/parallel/mesh.py
"""Device mesh construction and sharding helpers.

The reference is single-device (SURVEY.md §2.2: no torch.distributed anywhere);
this module is the scale-out layer the TPU build adds. The framework uses a 2D
``(data, model)`` mesh:

  * ``data``  — batch axis for data-parallel training / per-user scoring rows.
  * ``model`` — catalog axis: large item feature/embedding tables and the item
    dimension of the full-catalog score matrix are sharded here; XLA emits the
    ICI collectives (psum for loss/metric reductions, all-gathers for top-K
    candidate merges) from the sharding annotations.

No hand-written communication backend: sharding declarations + jit are the
entire "distributed runtime".
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              data_parallel: Optional[int] = None,
              model_parallel: int = 1,
              axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS)) -> Mesh:
    """Build a 2D (data, model) mesh over the available devices.

    By default all devices go on the data axis. ``model_parallel`` splits off
    a catalog-sharding dimension (devices must factor evenly).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        if n % model_parallel:
            raise ValueError(
                f"{n} devices not divisible by model_parallel={model_parallel}")
        data_parallel = n // model_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            f"data_parallel({data_parallel}) * model_parallel({model_parallel}) "
            f"!= device count ({n})")
    grid = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(grid, axis_names)


def mesh_from_flags(data_parallel: Optional[int] = None,
                    model_parallel: int = 1) -> Optional[Mesh]:
    """Build the production mesh from CLI flags; None when trivial.

    Default policy for the scripts (--data_parallel/--model_parallel): use
    every visible device on the data axis unless an explicit factorization is
    given. Returns None for a 1x1 mesh so single-chip runs keep the
    zero-overhead unsharded code paths.
    """
    devices = jax.devices()
    model_parallel = max(int(model_parallel or 1), 1)
    if data_parallel is None:
        data_parallel = max(len(devices) // model_parallel, 1)
    data_parallel = max(int(data_parallel), 1)
    if data_parallel * model_parallel == 1:
        return None
    n = data_parallel * model_parallel
    if n > len(devices):
        raise ValueError(
            f"requested {data_parallel}x{model_parallel} mesh but only "
            f"{len(devices)} device(s) visible")
    return make_mesh(devices[:n], data_parallel=data_parallel,
                     model_parallel=model_parallel)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for per-example arrays: leading axis split over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def item_table_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for item-major tables: leading (item) axis over 'model'."""
    return NamedSharding(mesh, P(MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def score_matrix_sharding(mesh: Mesh) -> NamedSharding:
    """[users, items] score matrices: rows over 'data', columns over 'model'."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, leading axis over 'data'.

    Pads are the caller's responsibility: per-example array lengths must be
    divisible by the data-axis size (static shapes keep XLA happy).
    """
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m that is >= n (and >= m)."""
    return max(m, ((n + m - 1) // m) * m)


def param_shardings(params, mesh: Mesh):
    """Tensor-parallel shardings for a Flax param tree over 'model'.

    Rules (a standard Megatron-style column split, expressed as GSPMD
    annotations — XLA inserts the all-gathers/reduce-scatters):

      * embedding tables ``(vocab, dim)`` — vocab rows over 'model'
        (user/item vocabularies are the large tensors in this workload);
      * dense kernels ``(in, out)`` — output features over 'model';
      * everything else (biases, norms, scalars, tiny dims) replicated.

    A dimension is only sharded when it is at least the model-axis size.
    Returns a pytree of NamedShardings matching ``params``; pass the result
    to ``jax.device_put``. Optimizer moments inherit the layout by running
    ``tx.init`` under jit on the sharded params (GSPMD propagation).
    """
    size = mesh.shape[MODEL_AXIS]

    def rule(path, leaf):
        name = getattr(path[-1], 'key', None) if path else None
        ndim = getattr(leaf, 'ndim', 0)
        shape = getattr(leaf, 'shape', ())
        # device_put requires the sharded dim to divide evenly; non-divisible
        # (or too-small) dims stay replicated.
        if size > 1 and ndim == 2:
            if name == 'embedding' and shape[0] % size == 0:
                return NamedSharding(mesh, P(MODEL_AXIS, None))
            if name == 'kernel' and shape[1] % size == 0 and shape[1] >= size:
                return NamedSharding(mesh, P(None, MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
