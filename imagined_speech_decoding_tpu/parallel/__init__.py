"""Parallelism layer: meshes, shard_map data parallelism, model-axis
sharding for the stacked CV engine."""

from .mesh import (  # noqa: F401
    batch_spec,
    make_mesh,
    replicate,
    replicated_spec,
    shard_leading_axis,
)
from .dp import DPTrainState, make_dp_eval_step, make_dp_train_step  # noqa: F401
