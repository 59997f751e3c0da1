"""Data-parallel training over ICI: ``shard_map`` + gradient ``psum``.

Explicit SPMD data parallelism (SURVEY §2.5 build obligation): the batch
axis is sharded across a ``('data',)`` mesh; every device computes
grads/metrics on its shard and all-reduces them over ICI with ``psum``.
Params/optimizer state are replicated; the optimizer update is computed
identically on every device (no broadcast needed).

The weighted-loss contract makes the math exact under sharding: each
shard contributes ``sum(w * nll)`` and ``sum(w)``; after ``psum`` of
both, loss and gradients are identical to the unsharded computation —
including ragged final batches (padded rows carry weight 0).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..train.metrics import confusion_matrix


class DPTrainState(NamedTuple):
    params: any
    model_state: any
    opt_state: any
    step: jnp.ndarray


def _weighted_ce_sums(logits, labels, weights):
    """Per-shard (sum of weighted nll, sum of weights) — psum-ready."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    w = weights.astype(jnp.float32)
    return jnp.sum(nll * w), jnp.sum(w)


def make_dp_train_step(
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    n_classes: int,
    mesh: Mesh,
    axis_name: str = "data",
) -> Callable:
    """Build the jitted data-parallel train step.

    Signature: ``step(state, x (B, ...), y (B,), w (B,), rng) ->
    (state, metrics)`` with ``B`` divisible by the mesh size. ``x/y/w``
    are sharded along ``axis_name``; params are replicated.
    """

    def local_step(params, mstate, opt_state, step, x, y, w, rng):
        # rng is replicated; fold in the device index so per-device
        # dropout masks differ (per-example randomness under DP).
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))

        def local_sum_loss(p):
            # Differentiate the LOCAL weighted nll sum only — keeping the
            # collective out of autodiff makes the gradient math explicit
            # (psum's transpose is itself a psum, which would otherwise
            # silently all-reduce inside backward).
            logits, new_ms = apply_fn(p, mstate, x, train=True, rng=rng)
            num, den_local = _weighted_ce_sums(logits, y, w)
            return num, (logits, new_ms, den_local)

        (num, (logits, new_ms, den_local)), grads = jax.value_and_grad(
            local_sum_loss, has_aux=True
        )(params)
        den = jnp.maximum(jax.lax.psum(den_local, axis_name), 1.0)
        loss = jax.lax.psum(num, axis_name) / den
        # grad of the global weighted mean = psum of local sum-grads / den
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axis_name) / den, grads)
        # BN running stats: average the per-shard updates.
        new_ms = jax.tree.map(
            lambda a: jax.lax.pmean(a, axis_name) if jnp.issubdtype(a.dtype, jnp.floating) else a,
            new_ms,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        cm = jax.lax.psum(confusion_matrix(logits, y, n_classes, w), axis_name)
        return params, new_ms, opt_state, step + 1, loss, cm

    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis_name), P(axis_name), P(axis_name), P()),
        out_specs=(P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state: DPTrainState, x, y, w, rng):
        params, mstate, opt_state, count, loss, cm = mapped(
            state.params, state.model_state, state.opt_state, state.step, x, y, w, rng
        )
        metrics = {
            "loss": loss,
            "acc": jnp.trace(cm) / jnp.maximum(cm.sum(), 1.0),
        }
        return DPTrainState(params, mstate, opt_state, count), metrics

    return step


def make_dp_eval_step(
    apply_fn: Callable, n_classes: int, mesh: Mesh, axis_name: str = "data"
) -> Callable:
    """Jitted data-parallel eval step → psum'd (loss_sum, weight_sum, cm)."""

    def local_eval(params, mstate, x, y, w):
        logits, _ = apply_fn(params, mstate, x, train=False, rng=None)
        num, den = _weighted_ce_sums(logits, y, w)
        cm = confusion_matrix(logits, y, n_classes, w)
        return (
            jax.lax.psum(num, axis_name),
            jax.lax.psum(den, axis_name),
            jax.lax.psum(cm, axis_name),
        )

    mapped = shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)
