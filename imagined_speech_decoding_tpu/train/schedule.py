"""Learning-rate schedules.

Reproduces the reference ``cosine_scheduler`` (``src/fast/train/
trainer.py:15-27``): a per-*step* multiplier table — linear warmup from
0 to ``base`` over ``warmup_epochs``, then cosine decay from ``base`` to
``final``. The reference precomputes a numpy list and indexes it from a
``LambdaLR``; here the same table is a device array indexed by the step
counter inside the jitted update (or wrapped as an optax schedule fn).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def cosine_scheduler(
    base_value: float,
    final_value: float,
    epochs: int,
    niter_per_ep: int,
    warmup_epochs: int = 0,
    start_warmup_value: float = 0.0,
) -> np.ndarray:
    """Per-step value table of length ``epochs * niter_per_ep``."""
    warmup_iters = min(warmup_epochs * niter_per_ep, epochs * niter_per_ep)
    warmup = (
        np.linspace(start_warmup_value, base_value, warmup_iters)
        if warmup_iters > 0
        else np.array([])
    )
    n = epochs * niter_per_ep - warmup_iters
    iters = np.arange(n)
    main = final_value + 0.5 * (base_value - final_value) * (1 + np.cos(np.pi * iters / max(n, 1)))
    schedule = np.concatenate((warmup, main))
    assert len(schedule) == epochs * niter_per_ep
    return schedule


def warmup_cosine_lr(
    learning_rate: float,
    epochs: int,
    niter_per_ep: int,
    warmup_epochs: int = 10,
    final_scale: float = 0.1,
):
    """Optax-compatible schedule fn: step -> lr.

    Matches the reference training setup: AdamW base lr x a (1 -> 0.1)
    cosine multiplier table (``trainer.py:38,49-54``). Steps beyond the
    table clamp to the final value.
    """
    table = jnp.asarray(
        learning_rate
        * cosine_scheduler(1.0, final_scale, epochs, niter_per_ep, warmup_epochs=warmup_epochs)
    )

    def schedule(step):
        idx = jnp.clip(step, 0, table.shape[0] - 1)
        return table[idx]

    return schedule
