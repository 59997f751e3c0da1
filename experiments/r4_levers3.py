"""Dense-tails chunk ladder tail: does the dense formulation fit
UNCHUNKED (grouped-conv conv tails OOM'd unchunked at 17.3/15.75 GB in
r2 — the dense conv needs no pre-conv relayout copies, so its live
memory differs)? One point: head_micro_batch >= 320 == unchunked."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from imagined_speech_decoding_tpu._hostid import enable_persistent_cache

enable_persistent_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import r4_levers as L  # noqa: E402


def main():
    from imagined_speech_decoding_tpu.config import FASTConfig
    from imagined_speech_decoding_tpu.data.synthetic import synthetic_trials_device
    from imagined_speech_decoding_tpu.models.api import make_fast_model
    from imagined_speech_decoding_tpu.profiling import sync_scalar

    L.log("device:", jax.devices()[0])
    cfg = FASTConfig.default()
    x, y = jax.jit(
        lambda k: synthetic_trials_device(
            k, L.N_SUBJECTS * L.N_TRIALS, cfg.n_channels, cfg.seq_len, cfg.n_classes
        )
    )(jax.random.PRNGKey(0))
    sync_scalar(x)

    os.environ["ISD_CONV4_TAILS"] = "dense"
    for chunk in (1024,):
        model = make_fast_model(
            cfg, compute_dtype=jnp.bfloat16, remat=True, head_micro_batch=chunk
        )
        stack = L.build_stack(cfg, model)
        try:
            out = L.timed_whole_run(model, cfg, stack, x, y)
        except Exception as e:  # noqa: BLE001
            out = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(json.dumps({"variant": f"dense_chunk{chunk}", **out}), flush=True)
    os.environ.pop("ISD_CONV4_TAILS", None)


if __name__ == "__main__":
    main()
