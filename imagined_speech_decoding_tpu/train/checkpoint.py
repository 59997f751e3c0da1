"""Checkpointing: orbax for full train-state trees, flat ``.npz`` for
portable "state_dict"-style model weights.

Reference parity (SURVEY §5 checkpoint/resume): (1) best-by-val_acc
snapshots are selected *inside* the jitted fit (see ``engine.make_fit``)
— the Lightning ``ModelCheckpoint`` equivalent; (2) ``save_state_dict``
mirrors the raw ``torch.save(state_dict)`` export of ``best_subject.pth``
(``scripts/train_fast.py:196-197``); (3) ``load_state_dict`` accepts a
``model.``-key prefix and strips it, like the SHAP scripts' loader
(``scripts/explain_fast.py:41-49``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Flat-key .npz "state dict" (portable, torch.save-analogue)
# ---------------------------------------------------------------------------

def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)) and not hasattr(tree, "_fields"):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    elif hasattr(tree, "_fields"):  # NamedTuple (e.g. BNState)
        for k in tree._fields:
            out.update(_flatten(getattr(tree, k), f"{prefix}{k}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_into(template: Any, flat: Dict[str, np.ndarray], prefix: str = "") -> Any:
    if isinstance(template, dict):
        return {k: _unflatten_into(v, flat, f"{prefix}{k}.") for k, v in template.items()}
    if isinstance(template, (list, tuple)) and not hasattr(template, "_fields"):
        seq = [
            _unflatten_into(v, flat, f"{prefix}{i}.") for i, v in enumerate(template)
        ]
        return type(template)(seq)
    if hasattr(template, "_fields"):
        return type(template)(
            *(_unflatten_into(getattr(template, k), flat, f"{prefix}{k}.") for k in template._fields)
        )
    key = prefix[:-1]
    if key not in flat:
        raise KeyError(f"missing weight {key!r} in checkpoint")
    arr = flat[key]
    tmpl = np.asarray(template)
    if arr.shape != tmpl.shape:
        raise ValueError(f"shape mismatch for {key!r}: {arr.shape} vs {tmpl.shape}")
    return jnp.asarray(arr, dtype=tmpl.dtype)


def save_state_dict(path: str, tree: Any) -> str:
    """Save a param/state pytree as a flat-key ``.npz``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path, **_flatten(tree))
    return path


def load_state_dict(path: str, template: Any, strip_prefix: str = "model.") -> Any:
    """Load a flat-key ``.npz`` into the structure of ``template``.

    Keys carrying ``strip_prefix`` (a wrapper-module artifact) are
    accepted and stripped.
    """
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    if strip_prefix and any(k.startswith(strip_prefix) for k in flat):
        flat = {
            (k[len(strip_prefix):] if k.startswith(strip_prefix) else k): v
            for k, v in flat.items()
        }
    return _unflatten_into(template, flat)


# ---------------------------------------------------------------------------
# Orbax full-tree checkpoints (train-state incl. optimizer)
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, tree: Any) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(np.asarray, tree), force=True)
    return path


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    if template is not None:
        restored = jax.tree.map(
            lambda t, r: jnp.asarray(r, dtype=np.asarray(t).dtype), template, restored
        )
    return restored


def save_model_npz(path: str, params: Any, state: Any) -> str:
    """Persist a model as params + mutable state (BN running stats) in one
    flat ``.npz`` — the analogue of a torch ``state_dict``, which carries
    buffers alongside weights."""
    return save_state_dict(path, {"params": params, "state": state})


def load_model_npz(path: str, params_template: Any, state_template: Any):
    """Load ``save_model_npz`` output; also accepts legacy params-only
    files (state falls back to the template — only exact for stateless
    heads, so callers should warn when the template state is non-empty).
    Returns ``(params, state, had_state)``."""
    with np.load(path) as data:
        keys = set(data.files)
    if any(k.startswith("params.") for k in keys):
        tree = load_state_dict(
            path, {"params": params_template, "state": state_template}, strip_prefix=""
        )
        return tree["params"], tree["state"], True
    return load_state_dict(path, params_template), state_template, False


def select_model(result_tree: Any, index: int) -> Any:
    """Slice one model out of a stacked (vmapped) result pytree."""
    return jax.tree.map(lambda v: v[index], result_tree)


# ---------------------------------------------------------------------------
# Segment-boundary checkpoints for fit_many_segmented (mid-run persistence)
# ---------------------------------------------------------------------------

def save_segment_checkpoint(path: str, carry: Any, histories: list, next_segment: int) -> str:
    """Atomically persist a segmented-fit carry + per-segment histories.

    One flat ``.npz``: the carry pytree (params, model state, optimizer
    state incl. step counts, best snapshot, epoch counter), each
    segment's history dict, and the resume cursor. tmp+rename makes a
    crash mid-save keep the previous valid checkpoint.
    """
    flat = _flatten(carry, "carry.")
    for i, h in enumerate(histories):
        flat.update(_flatten(h, f"hist.{i}."))
    flat["meta.next_segment"] = np.asarray(next_segment, np.int64)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)
    return path


def load_segment_checkpoint(path: str, carry_template: Any):
    """Restore ``(carry, histories, next_segment)`` saved by
    ``save_segment_checkpoint``; dtypes/shapes follow the template."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    next_segment = int(flat.pop("meta.next_segment"))
    carry_flat = {k[len("carry."):]: v for k, v in flat.items() if k.startswith("carry.")}
    carry = _unflatten_into(carry_template, carry_flat)
    histories = []
    for i in range(next_segment):
        pre = f"hist.{i}."
        hist = {k[len(pre):]: jnp.asarray(v) for k, v in flat.items() if k.startswith(pre)}
        if hist:
            histories.append(hist)
    return carry, histories, next_segment
