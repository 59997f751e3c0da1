"""Model factory: bind configs into the generic ``ModelDef`` interface
consumed by the training engine."""

from __future__ import annotations

import jax.numpy as jnp

from ..config import FASTConfig
from ..train.engine import ModelDef
from .fast import fast_apply, fast_init


def make_fast_model(
    cfg: FASTConfig,
    forward_mode: str = "default",
    compute_dtype=jnp.float32,
    remat: bool = False,
    head_micro_batch=None,
) -> ModelDef:
    """FAST as a ``ModelDef``. ``compute_dtype=bfloat16`` reproduces the
    reference's ``bf16-mixed`` policy (``scripts/train_fast.py:135``):
    f32 master params, bf16 activations (casts happen inside the layers
    via ``astype(x.dtype)``), f32 loss. ``remat=True`` recomputes head
    activations in backward — required when stacking many models per
    chip (see ``heads.head_apply``)."""

    def init(key):
        return fast_init(key, cfg)

    def apply(params, state, x, *, train=False, rng=None, sample_weight=None):
        return fast_apply(
            params,
            state,
            x.astype(compute_dtype),
            cfg,
            forward_mode=forward_mode,
            train=train,
            rng=rng,
            remat=remat,
            head_micro_batch=head_micro_batch,
            sample_weight=sample_weight,
        )

    return ModelDef(init=init, apply=apply)
