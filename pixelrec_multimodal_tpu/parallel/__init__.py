"""Mesh/sharding layer — the framework's entire 'distributed backend'."""
from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    item_table_sharding,
    make_mesh,
    mesh_from_flags,
    pad_to_multiple,
    param_shardings,
    replicated,
    score_matrix_sharding,
    shard_batch,
)
