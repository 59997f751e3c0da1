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


def shard_model_stack(
    mesh_axis: str, m_count: int, stacked_trees, replicated_trees=(), mesh=None
):
    """Place a stacked-model workload on a device mesh.

    Pads every stacked tree's leading (model) axis to a multiple of the
    mesh axis size with replicas of the last model (sharded axes must
    divide the mesh), shards them along ``mesh_axis``, and replicates
    the rest. Pass ``mesh`` to reuse an existing (possibly multi-axis)
    mesh. Returns ``(padded_stacked, replicated, m_padded)`` — slice
    results back to ``m_count`` afterwards.
    """
    import jax.numpy as jnp

    if mesh is None:
        mesh = make_mesh((mesh_axis,))
    n_dev = int(mesh.shape[mesh_axis])
    m_pad = (-m_count) % n_dev
    if m_pad:
        stacked_trees = [
            jax.tree.map(
                lambda v: jnp.concatenate(
                    [v, jnp.broadcast_to(v[-1:], (m_pad,) + v.shape[1:])], axis=0
                ),
                t,
            )
            for t in stacked_trees
        ]
    stacked = NamedSharding(mesh, P(mesh_axis))
    repl = NamedSharding(mesh, P())
    put = lambda t, s: jax.tree.map(lambda v: jax.device_put(v, s), t)
    return (
        [put(t, stacked) for t in stacked_trees],
        [put(t, repl) for t in replicated_trees],
        m_count + m_pad,
    )


def mesh_strategy(mesh_axis: Optional[str]):
    """Resolve a CLI mesh strategy name into concrete placement pieces.

    Returns ``(batch_sharding, stack_axis, stack_mesh)``:
      * ``batch_sharding`` — NamedSharding for per-model batches (GSPMD
        DP with automatic grad all-reduce), or None;
      * ``stack_axis`` — mesh axis name to shard the model stack along
        (see ``shard_model_stack``), or None;
      * ``stack_mesh`` — the mesh to use for stack sharding (None =
        build a fresh 1-D mesh).
    """
    if not mesh_axis:
        return None, None, None
    if mesh_axis == "model":
        return None, "model", None
    if mesh_axis == "data":
        return NamedSharding(make_mesh(("data",)), P("data")), None, None
    if mesh_axis == "2d":
        n_dev = len(jax.devices())
        shape = (max(n_dev // 2, 1), 2 if n_dev > 1 else 1)
        used = shape[0] * shape[1]
        if used < n_dev:
            import warnings

            warnings.warn(
                f"mesh strategy '2d' uses {used} of {n_dev} devices "
                f"(shape {shape}); an odd device count idles the rest — "
                "prefer --mesh model or an even slice",
                stacklevel=2,
            )
        mesh2d = make_mesh(("model", "data"), shape=shape)
        return NamedSharding(mesh2d, P("data")), "model", mesh2d
    raise ValueError(f"unknown mesh strategy {mesh_axis!r} (use model/data/2d)")


def batch_spec(axis_name: str = "data") -> P:
    return P(axis_name)


def replicated_spec() -> P:
    return P()
