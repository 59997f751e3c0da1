"""FAST — Functional Areas Spatio-Temporal Transformer, TPU-native.

Functional re-design of the reference model (``src/fast/models/fast.py:
213-284``): sliding-window tokenizer → zone-batched CNN encoders →
pre-LN transformer over (n_tokens + CLS) tokens → CLS classifier.

Differences from the reference that matter for TPU efficiency:
  * the 8 per-zone encoders run as ONE vmapped kernel over a dense
    ``(Z, C_max)`` zone layout (see ``models.heads``) instead of a
    Python loop over ragged modules;
  * window extraction + zone gather are a single static-index gather
    (``ops.sliding_window`` + ``ops.zone_gather``) that XLA fuses with
    the first conv;
  * everything is a pure function of ``(params, state, x, rng)`` —
    trivially jit/vmap/shard_map-able; batch-norm state (only present
    for the CVBlock/EEGNet/HeadConv head variants) threads explicitly.

All three reference forward modes are provided: ``default``,
``train_head`` (per-token logits, averaged — ``fast.py:273-278``) and
``train_transformer`` (frozen head via stop_gradient — ``fast.py:
279-282``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import FASTConfig
from ..data.constants import zone_layout
from ..ops.windowing import sliding_window, zone_gather
from . import modules as nn
from .heads import head_apply, head_init

Params = Dict[str, Any]
State = Dict[str, Any]

# Pallas fused-head toggle. None = auto = currently OFF everywhere:
# measured on the available (virtualized) v5e slice, Mosaic-emitted
# matmuls run at ~2.5-5 TFLOP/s (VPU-emulated) while XLA reaches
# ~60 TFLOP/s on the same chip, so the XLA einsum path wins despite its
# extra HBM traffic. The kernel (ops/pallas/conv4head.py) is kept as the
# fused design for environments with native Mosaic MXU lowering; flip
# PALLAS_HEAD=True (or ISD_PALLAS_HEAD=1) to use it.
PALLAS_HEAD: Optional[bool] = None


def _pallas_head_enabled() -> bool:
    if PALLAS_HEAD is not None:
        return PALLAS_HEAD
    import os

    return os.environ.get("ISD_PALLAS_HEAD", "") == "1"


# ---------------------------------------------------------------------------
# Attention block (pre-LN; reference fast.py:10-29)
# ---------------------------------------------------------------------------

def attention_block_init(key, embed_dim: int, hidden_dim: int, dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "ln1": nn.layernorm_init(embed_dim, dtype),
        "attn": nn.mha_init(k1, embed_dim, dtype),
        "ln2": nn.layernorm_init(embed_dim, dtype),
        "fc1": nn.linear_init(k2, embed_dim, hidden_dim, dtype=dtype),
        "fc2": nn.linear_init(k3, hidden_dim, embed_dim, dtype=dtype),
    }


def attention_block_apply(
    params: Params,
    x: jnp.ndarray,
    num_heads: int,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    r1, r2, r3, r4 = nn.split_rng(rng, 4)
    inp = nn.layernorm(params["ln1"], x)
    x = x + nn.mha(params["attn"], inp, num_heads, dropout=dropout, rng=r1, train=train)
    h = nn.layernorm(params["ln2"], x)
    h = jax.nn.gelu(nn.linear(params["fc1"], h), approximate=False)
    h = nn.dropout(h, dropout, r2, train)
    h = nn.linear(params["fc2"], h)
    h = nn.dropout(h, dropout, r3, train)
    return x + h


# ---------------------------------------------------------------------------
# FAST
# ---------------------------------------------------------------------------

def fast_init(key: jax.Array, cfg: FASTConfig, dtype=jnp.float32) -> Tuple[Params, State]:
    """Initialize FAST params/state (reference __init__, fast.py:216-240)."""
    layout = zone_layout(cfg.electrodes, cfg.zone_dict)
    kh, ki, kt, kp, kc, kl = jax.random.split(key, 6)

    head_params, head_state = head_init(
        kh, cfg.head, layout.n_zones, layout.c_max, cfg.dim_cnn, cfg.window_len, dtype
    )
    blocks = [
        attention_block_init(k, cfg.dim_token, cfg.dim_token * 2, dtype)
        for k in jax.random.split(kt, cfg.num_layers)
    ]
    params = {
        "head": head_params,
        "input_layer": nn.linear_init(ki, cfg.dim_cnn * layout.n_zones, cfg.dim_token, dtype=dtype),
        "blocks": blocks,
        "pos_embedding": jax.random.normal(kp, (1, cfg.n_tokens + 1, cfg.dim_token), dtype),
        "cls_token": jax.random.normal(kc, (1, 1, cfg.dim_token), dtype),
        "last_layer": nn.linear_init(kl, cfg.dim_token, cfg.n_classes, dtype=dtype),
    }
    return params, {"head": head_state}


def fast_forward_head(
    params: Params,
    state: State,
    x: jnp.ndarray,
    cfg: FASTConfig,
    *,
    step_override: Optional[int] = None,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
    head_micro_batch: Optional[int] = None,
    sample_weight: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, State]:
    """Tokenize + encode: ``(B, C, T) -> (B, N, Z, F)``.

    ``sample_weight (B,)`` flags ragged-batch padding trials (weight 0);
    BN-bearing heads exclude their windows from batch statistics so the
    padded static batch trains identically to the reference's short
    final DataLoader batch. The default Conv4Layers path is BN-free and
    ignores it.

    Reference ``forward_head`` (fast.py:242-252): unfold into overlapping
    windows, flatten windows into the batch, run the zone encoders.
    ``step_override`` densifies tokens at inference (static arg).

    ``head_micro_batch``: process the flattened ``B*N`` window axis in
    sequential chunks via a differentiable ``lax.map`` — caps peak
    activation memory at one chunk's conv chain (the lever, together
    with ``remat``, that fits ~75 stacked models per chip). Requires a
    stateless, dropout-free head (the default ``Conv4Layers``) and
    ``(B*N) % micro_batch == 0``; otherwise the unchunked path is used.
    """
    layout = zone_layout(cfg.electrodes, cfg.zone_dict)
    step = step_override if step_override is not None else cfg.slide_step
    b = x.shape[0]
    n = (x.shape[-1] - cfg.window_len) // step + 1

    from .heads import conv4layers_fused_all_zones_fullseq, get_head

    if cfg.head == "Conv4Layers":
        if _pallas_head_enabled():
            # The hot path on TPU: one fused Pallas kernel per batch block
            # (windowing + all convs in VMEM, in-kernel-recompute VJP) —
            # no remat or micro-batching needed, HBM traffic is one read
            # of x and one write of feat.
            from ..ops.pallas.conv4head import fused_conv4_head
            from .heads import conv4layers_prepare_fused_weights

            w12r, b12r, w3r, w4r = conv4layers_prepare_fused_weights(
                params["head"], layout.indices, layout.mask, x.shape[1]
            )
            feat = fused_conv4_head(
                x, w12r, b12r, w3r, w4r, cfg.window_len, step
            ).astype(x.dtype)
            feat = feat.reshape(b, n, layout.n_zones, cfg.dim_cnn)
            return feat, {"head": state["head"]}

        # Gather-free fast path: zone selection folded into conv weights,
        # the (shift-invariant) first conv run once over the full sequence
        # with windows sliced from its output, tails as batched GEMMs
        # (see heads.conv4layers_fused_all_zones_fullseq).
        def head_of(xc):  # (B', C, T) -> (B', n, Z, F)
            return conv4layers_fused_all_zones_fullseq(
                params["head"], xc, layout.indices, layout.mask, cfg.window_len, step,
                train=train,
            )

        if remat:
            # Checkpoint at the raw batch: backward stores only x (+feat)
            # and recomputes the window/conv chain — the lever that fits
            # ~75 stacked models per chip. ``ISD_REMAT_SAVE`` (comma list
            # of checkpoint_name tags, e.g. "tails_h4") trades HBM for
            # recompute: tagged intermediates are SAVED across the
            # chunk map instead of recomputed in backward (see
            # heads._conv4_tails tags + docs/PERFORMANCE.md).
            import os

            save = os.environ.get("ISD_REMAT_SAVE")
            if save:
                head_of = jax.checkpoint(
                    head_of,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        *save.split(",")
                    ),
                )
            else:
                head_of = jax.checkpoint(head_of)

        if head_micro_batch:
            # trials per chunk: largest divisor of b within the window budget
            budget = max(head_micro_batch // n, 1)
            tpc = max(d for d in range(1, budget + 1) if b % d == 0)
        else:
            tpc = 0
        if tpc and b > tpc:
            chunks = x.reshape(b // tpc, tpc, *x.shape[1:])
            feat = jax.lax.map(head_of, chunks)
        else:
            feat = head_of(x)
        feat = feat.reshape(b, n, layout.n_zones, cfg.dim_cnn)
        return feat, {"head": state["head"]}

    w = sliding_window(x, cfg.window_len, step)  # (B, C, N, W)
    w = jnp.moveaxis(w, 2, 1).reshape(b * n, x.shape[1], cfg.window_len)  # (B*N, C, W)
    xz, zmask = zone_gather(w, layout.indices, layout.mask)  # (B*N, Z, C_max, W)

    # Each trial's n windows inherit the trial's sample weight (window
    # row order is trial-major, matching the reshape above).
    window_mask = (
        None if sample_weight is None else jnp.repeat(sample_weight, n)
    )
    enc = get_head(cfg.head)
    stateless = not jax.tree.leaves(state["head"])
    if (
        head_micro_batch
        and stateless
        and not enc.stochastic  # head ignores rng → chunks need no keys
        and (b * n) % head_micro_batch == 0
        and (b * n) > head_micro_batch
    ):
        chunks = xz.reshape(b * n // head_micro_batch, head_micro_batch, *xz.shape[1:])

        def one_chunk(ch):
            f, _ = head_apply(
                cfg.head, params["head"], state["head"], ch, zmask,
                train=train, rng=None, remat=remat,
            )
            return f

        feat = jax.lax.map(one_chunk, chunks).reshape(b * n, layout.n_zones, cfg.dim_cnn)
        new_head_state = state["head"]
    else:
        feat, new_head_state = head_apply(
            cfg.head, params["head"], state["head"], xz, zmask, train=train, rng=rng,
            remat=remat, sample_mask=window_mask,
        )  # (B*N, Z, F)
    feat = feat.reshape(b, n, layout.n_zones, cfg.dim_cnn)
    return feat, {"head": new_head_state}


def fast_batched_forward_head(
    params: Params,
    state: State,
    x: jnp.ndarray,
    cfg: FASTConfig,
    step: Optional[int] = None,
    micro_batch: int = 64,
) -> jnp.ndarray:
    """Micro-batched head forward for memory-bounded dense tokenization
    (reference ``batched_forward_head``, fast.py:254-258). Eval-mode only
    (state is not updated). Requires ``B % micro_batch == 0`` under jit;
    otherwise falls back to one chunk."""
    b = x.shape[0]
    if b % micro_batch != 0:
        feat, _ = fast_forward_head(params, state, x, cfg, step_override=step, train=False)
        return feat
    chunks = x.reshape(b // micro_batch, micro_batch, *x.shape[1:])

    def one(chunk):
        feat, _ = fast_forward_head(params, state, chunk, cfg, step_override=step, train=False)
        return feat

    out = jax.lax.map(one, chunks)
    return out.reshape(b, *out.shape[2:])


def fast_forward_transformer(
    params: Params,
    feat: jnp.ndarray,
    cfg: FASTConfig,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Transformer trunk + CLS classifier: ``(B, N, Z, F) -> (B, K)``.

    Reference ``forward_transformer`` (fast.py:260-268). The learned
    positional table has ``cfg.n_tokens + 1`` slots; shorter token
    sequences use its prefix (same slicing semantics as the reference).
    """
    b, n = feat.shape[:2]
    rngs = nn.split_rng(rng, cfg.num_layers + 2)
    h = feat.reshape(b, n, -1)
    h = jax.nn.gelu(nn.linear(params["input_layer"], h), approximate=False)
    cls = jnp.broadcast_to(params["cls_token"].astype(h.dtype), (b, 1, h.shape[-1]))
    h = jnp.concatenate([cls, h], axis=1)
    h = h + params["pos_embedding"][:, : n + 1].astype(h.dtype)
    for i, block in enumerate(params["blocks"]):
        h = attention_block_apply(
            block, h, cfg.num_heads, dropout=cfg.dropout, rng=rngs[i], train=train
        )
    cls_out = nn.dropout(h[:, 0], cfg.dropout, rngs[-1], train)
    return nn.linear(params["last_layer"], cls_out)


def fast_apply(
    params: Params,
    state: State,
    x: jnp.ndarray,
    cfg: FASTConfig,
    *,
    forward_mode: str = "default",
    train: bool = False,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
    head_micro_batch: Optional[int] = None,
    sample_weight: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, State]:
    """Full forward pass with the reference's 3 modes (fast.py:270-284).

    Returns ``(logits (B, n_classes), new_state)``.
    """
    r_head, r_tr = nn.split_rng(rng, 2)
    if forward_mode == "default":
        feat, new_state = fast_forward_head(
            params, state, x, cfg, train=train, rng=r_head, remat=remat,
            head_micro_batch=head_micro_batch, sample_weight=sample_weight,
        )
        logits = fast_forward_transformer(params, feat, cfg, train=train, rng=r_tr)
        return logits, new_state
    if forward_mode == "train_head":
        feat, new_state = fast_forward_head(
            params, state, x, cfg, train=train, rng=r_head, remat=remat,
            head_micro_batch=head_micro_batch, sample_weight=sample_weight,
        )
        b, n = feat.shape[:2]
        h = feat.reshape(b, n, -1)
        tokens = jax.nn.gelu(nn.linear(params["input_layer"], h), approximate=False)
        logits = nn.linear(params["last_layer"], tokens).mean(axis=1)
        return logits, new_state
    if forward_mode == "train_transformer":
        feat, new_state = fast_forward_head(
            params, state, x, cfg, train=train, rng=r_head, remat=remat,
            head_micro_batch=head_micro_batch, sample_weight=sample_weight,
        )
        feat = jax.lax.stop_gradient(feat)  # frozen feature extractor
        logits = fast_forward_transformer(params, feat, cfg, train=train, rng=r_tr)
        return logits, new_state
    raise NotImplementedError(f"unknown forward_mode {forward_mode!r}")


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
