"""Export a trained FAST checkpoint as a deployable serving artifact.

Packs the full online-decoding chain (notch + band-pass zero-phase IIR
→ FAST forward → softmax, weights baked in) into ONE self-contained
StableHLO file via ``jax.export`` (``serving.export_decoder_artifact``).
Deployment then needs only jax — no model code, no checkpoint loading:

    isd-export-decoder --checkpoint results/.../sub-01/best_subject.npz \
        --out decoder.stablehlo
    # later, anywhere:
    decode = serving.load_decoder_artifact("decoder.stablehlo")

The reference has no serving story beyond re-instantiating the torch
model and loading a ``state_dict`` with prefix surgery at analysis time
(``scripts/explain_fast.py:32-54``); this is its TPU-native deployment
equivalent.
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description="Export a serving artifact (StableHLO)")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="best_subject.npz (omit for freshly initialized weights)")
    p.add_argument("--config", type=str, default="configs/default.yaml")
    p.add_argument("--out", type=str, default="decoder.stablehlo")
    p.add_argument("--batch_size", type=int, default=None,
                   help="fixed serving batch; default exports a symbolic "
                        "batch dimension (one artifact serves any B)")
    p.add_argument("--platforms", type=str, nargs="+", default=["tpu", "cpu"])
    p.add_argument("--notch", type=float, default=60.0,
                   help="notch frequency in Hz; 0 disables the stage")
    p.add_argument("--band", type=float, nargs=2, default=[4.0, 40.0],
                   metavar=("LO", "HI"), help="band-pass edges in Hz; 0 0 disables")
    p.add_argument("--seed", type=int, default=0, help="init seed when no checkpoint")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from imagined_speech_decoding_tpu.cli import enable_cache

    enable_cache()

    import jax

    from imagined_speech_decoding_tpu.config import load_config
    from imagined_speech_decoding_tpu.data.constants import SFREQ
    from imagined_speech_decoding_tpu.models.api import make_fast_model
    from imagined_speech_decoding_tpu.serving import export_decoder_artifact
    from imagined_speech_decoding_tpu.train.checkpoint import load_model_npz

    cfg = load_config(args.config if os.path.exists(args.config) else None).model
    model = make_fast_model(cfg)
    params, state = model.init(jax.random.PRNGKey(args.seed))
    if args.checkpoint:
        params, state, _ = load_model_npz(args.checkpoint, params, state)
    elif args.out:
        print("note: no --checkpoint given; exporting freshly initialized weights")

    band = tuple(args.band) if args.band and args.band[0] > 0 else None
    path = export_decoder_artifact(
        args.out, model.apply, params, state,
        n_channels=cfg.n_channels, seq_len=cfg.seq_len, sfreq=SFREQ,
        notch_hz=args.notch or None, band=band,
        batch_size=args.batch_size, platforms=tuple(args.platforms),
    )
    size = os.path.getsize(path)
    b = args.batch_size if args.batch_size is not None else "b (symbolic)"
    print(
        f"exported {path} ({size / 1e6:.2f} MB): "
        f"({b}, {cfg.n_channels}, {cfg.seq_len}) f32 -> "
        f"({b}, {cfg.n_classes}) posteriors, platforms={args.platforms}"
    )
    return path


if __name__ == "__main__":
    main()
