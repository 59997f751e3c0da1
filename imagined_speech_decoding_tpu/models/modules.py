"""Core neural-net building blocks as pure init/apply functions.

A deliberately small functional layer system: every module is a pair of
``init(key, ...) -> params`` and ``apply(params, x, ...) -> y`` pure
functions over explicit pytrees. This keeps the whole model stack
transparent to ``vmap`` (fold/subject-stacked training), ``shard_map``
(data parallelism) and ``jax.grad`` — no framework state to thread.

Initializer distributions follow torch defaults so training dynamics are
comparable to the reference:
  * Conv/Linear: Kaiming-uniform(a=√5) ⇒ U(±1/√fan_in) for both weight
    and bias (torch ``nn.Linear``/``nn.Conv2d`` reset_parameters);
  * MultiheadAttention: Xavier-uniform packed in-proj, zero biases;
  * LayerNorm: ones/zeros.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# Initializers (torch-default distributions)
# ---------------------------------------------------------------------------

def uniform_fan_in(key: jax.Array, shape: Tuple[int, ...], fan_in: int, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_uniform(key: jax.Array, shape: Tuple[int, ...], fan_in: int, fan_out: int, dtype=jnp.float32):
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_init(key: jax.Array, d_in: int, d_out: int, bias: bool = True, dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    p = {"w": uniform_fan_in(kw, (d_in, d_out), d_in, dtype)}
    if bias:
        p["b"] = uniform_fan_in(kb, (d_out,), d_in, dtype)
    return p


def linear(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, params["w"].astype(x.dtype), preferred_element_type=x.dtype)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Conv2d (NCHW x OIHW), optionally grouped — matches torch.nn.Conv2d
# ---------------------------------------------------------------------------

def conv2d_init(
    key: jax.Array,
    c_in: int,
    c_out: int,
    kernel: Tuple[int, int],
    bias: bool = True,
    groups: int = 1,
    dtype=jnp.float32,
) -> Params:
    kw, kb = jax.random.split(key)
    fan_in = (c_in // groups) * kernel[0] * kernel[1]
    p = {"w": uniform_fan_in(kw, (c_out, c_in // groups, kernel[0], kernel[1]), fan_in, dtype)}
    if bias:
        p["b"] = uniform_fan_in(kb, (c_out,), fan_in, dtype)
    return p


def conv2d(
    params: Params,
    x: jnp.ndarray,
    stride: Tuple[int, int] = (1, 1),
    padding="VALID",
    groups: int = 1,
) -> jnp.ndarray:
    """``x (B, C, H, W)`` -> ``(B, F, H', W')``; padding is lax-style
    ('VALID'/'SAME' or explicit [(lo,hi),(lo,hi)])."""
    w = params["w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if "b" in params:
        y = y + params["b"].astype(x.dtype)[None, :, None, None]
    return y


def temporal_conv(
    x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None, pad: int = 0
) -> jnp.ndarray:
    """1-D conv over the last axis as K shifted batched GEMMs.

    ``x (..., C, T)``, ``w (O, C, K)`` → ``(..., O, T + 2*pad - K + 1)``.

    Rationale: under ``vmap`` over stacked per-model/per-zone weights,
    ``conv_general_dilated`` lowers to a grouped conv with one group per
    (model, zone) instance — on TPU that pads the channel dimension per
    group, blowing activation memory ~(models·zones)× and starving the
    MXU. A sum of K slice-shifted ``dot_general``s instead vmaps into
    clean batched GEMMs: the slice fuses into the operand read and each
    GEMM contracts the true channel dimension with no group padding.
    """
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
    k = w.shape[-1]
    t_out = x.shape[-1] - k + 1
    w = w.astype(x.dtype)
    out = None
    for i in range(k):
        xi = jax.lax.slice_in_dim(x, i, i + t_out, axis=-1)
        term = jnp.einsum("...ct,oc->...ot", xi, w[..., i], preferred_element_type=x.dtype)
        out = term if out is None else out + term
    if b is not None:
        out = out + b.astype(x.dtype)[..., :, None]
    return out


def avg_pool(x: jnp.ndarray, window: Tuple[int, int], stride: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """Average pool over the trailing two axes of ``(B, C, H, W)``."""
    stride = stride or window
    y = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, 1) + window, (1, 1) + stride, "VALID",
    )
    return y / (window[0] * window[1])


def max_pool(x: jnp.ndarray, window: Tuple[int, int], stride: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    stride = stride or window
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, 1) + window, (1, 1) + stride, "VALID",
    )


def adaptive_avg_pool_1(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d((1, 1)): mean over the trailing two axes."""
    return jnp.mean(x, axis=(-2, -1))


# ---------------------------------------------------------------------------
# LayerNorm
# ---------------------------------------------------------------------------

def layernorm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm(params: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["scale"].astype(x.dtype) + params["bias"].astype(x.dtype)


# ---------------------------------------------------------------------------
# Multi-head self-attention (torch nn.MultiheadAttention semantics)
# ---------------------------------------------------------------------------

def mha_init(key: jax.Array, embed_dim: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "in_w": xavier_uniform(k1, (embed_dim, 3 * embed_dim), embed_dim, 3 * embed_dim, dtype),
        "in_b": jnp.zeros((3 * embed_dim,), dtype),
        "out_w": uniform_fan_in(k2, (embed_dim, embed_dim), embed_dim, dtype),
        "out_b": jnp.zeros((embed_dim,), dtype),
    }


def mha(
    params: Params,
    x: jnp.ndarray,
    num_heads: int,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    """Batch-first self-attention: ``(B, N, D) -> (B, N, D)``."""
    b, n, d = x.shape
    hd = d // num_heads
    qkv = jnp.dot(x, params["in_w"].astype(x.dtype)) + params["in_b"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)  # (B, H, N, hd)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(hd)
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    if train and dropout > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout, attn.shape)
        attn = attn * keep.astype(attn.dtype) / (1.0 - dropout)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
    return jnp.dot(o, params["out_w"].astype(x.dtype)) + params["out_b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------

def dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array], train: bool) -> jnp.ndarray:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return x * keep.astype(x.dtype) / (1.0 - rate)


def split_rng(rng: Optional[jax.Array], n: int):
    """Split an optional rng into n optional rngs (None stays None)."""
    if rng is None:
        return (None,) * n
    return tuple(jax.random.split(rng, n))
