"""Model factory: bind configs into the generic ``ModelDef`` interface
consumed by the training engine."""

from __future__ import annotations

import jax
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


def make_augmented_model(
    model: ModelDef, noise_sigma: float = 0.1, ch_drop: float = 0.1
) -> ModelDef:
    """Wrap a raw-EEG model with train-time augmentation (BASELINE.json
    config #4: "subject-dependent training with augmentation (noise,
    channel dropout)").

    The augmentation runs INSIDE the jitted train step: the engine's
    per-step PRNG key is split into (augment, model) halves, the batch
    gets per-trial Gaussian noise + whole-channel dropout
    (``ops.augment.augment_batch``), and the wrapped apply sees the
    augmented batch. Eval paths (``train=False``) are bit-identical to
    the unwrapped model — augmentation never touches validation, test,
    or serving forwards.
    """
    from ..ops.augment import augment_batch

    def apply(params, state, x, *, train=False, rng=None, sample_weight=None):
        if train:
            if rng is None:
                raise ValueError("augmented model needs an rng in train mode")
            k_aug, rng = jax.random.split(rng)
            x = augment_batch(k_aug, x, noise_sigma, ch_drop)
        return model.apply(
            params, state, x, train=train, rng=rng, sample_weight=sample_weight
        )

    return ModelDef(init=model.init, apply=apply)
