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
