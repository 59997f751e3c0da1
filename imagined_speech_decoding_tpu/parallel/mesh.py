"""Device-mesh helpers.

The reference has no in-process distribution at all (single-GPU
Lightning; multi-GPU = two shell processes over disjoint subjects —
``deprecated/BCIC2020Track3_run.sh:6-8``). The TPU-native replacements:

  * ``('data',)`` mesh — batch-parallel training over ICI with gradient
    ``psum`` (see ``parallel.dp``);
  * ``('model',)`` mesh — the fold/subject-stacked CV engine sharded
    along its model axis: each chip trains its slice of the stack with
    ZERO inter-chip collectives (the TPU analogue of the reference's
    process-per-GPU subject sharding, but inside one program);
  * 2-D ``('model', 'data')`` — both at once.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: 1-D mesh over all devices. ``shape`` reshapes the device
    list (product must equal the device count used).
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def replicate(mesh: Mesh, tree):
    """Place a pytree fully-replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_leading_axis(mesh: Mesh, tree, axis_name: str = "data"):
    """Shard every leaf's leading axis across ``axis_name``."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_spec(axis_name: str = "data") -> P:
    return P(axis_name)


def replicated_spec() -> P:
    return P()
