"""Round-4 follow-up: dense-tails interactions (chunk size, sparse val)
and a donation noise re-measure. See r4_levers.py for the harness."""

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

    def mk(chunk=256):
        return make_fast_model(
            cfg, compute_dtype=jnp.bfloat16, remat=True, head_micro_batch=chunk
        )

    variants = [
        ("dense_val_every_4", {"ISD_CONV4_TAILS": "dense"}, 256,
         lambda m, s: L.timed_whole_run(m, cfg, s, x, y, val_every=4)),
        ("dense_chunk512", {"ISD_CONV4_TAILS": "dense"}, 512,
         lambda m, s: L.timed_whole_run(m, cfg, s, x, y)),
        ("segmented_donated_rerun", {}, 256,
         lambda m, s: L.timed_segmented(m, cfg, s, x, y)),
        ("segmented_no_donate_rerun", {"ISD_NO_DONATE": "1"}, 256,
         lambda m, s: L.timed_segmented(m, cfg, s, x, y)),
    ]
    knob_keys = ["ISD_CONV4_TAILS", "ISD_CONV4_FIRST", "ISD_NO_DONATE"]
    for name, env, chunk, fn in variants:
        for k in knob_keys:
            os.environ.pop(k, None)
        os.environ.update(env)
        model = mk(chunk)
        stack = L.build_stack(cfg, model)
        try:
            out = fn(model, stack)
        except Exception as e:  # noqa: BLE001
            out = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(json.dumps({"variant": name, **out}), flush=True)
    for k in knob_keys:
        os.environ.pop(k, None)


if __name__ == "__main__":
    main()
