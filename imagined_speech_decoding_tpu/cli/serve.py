"""Serve a trained decoder over TCP (``isd-serve``).

Two sources:

  * ``--artifact decoder.stablehlo`` — the AOT export from
    ``isd-export-decoder``: immutable, needs no config, serves the exact
    compiled graph (filters + FAST + softmax, weights baked in);
  * ``--checkpoint best_subject.npz --config cfg.yaml`` — live weights
    through ``serving.make_online_decoder``: clients may hot-swap a new
    checkpoint with a RELOAD request (no recompile);
  * ``--checkpoint-dir results/FAST`` — fleet mode: every
    ``sub-*/best_subject.npz`` vmapped into ONE graph
    (``serving.make_fleet_decoder``); DECODE answers the ensemble
    soft-vote, DECODE_ALL the per-subject posteriors.

    isd-serve --artifact decoder.stablehlo --port 9333
    isd-serve --checkpoint results/FAST/sub-01/best_subject.npz --port 9333
    isd-serve --checkpoint-dir results/FAST --port 9333

Protocol and client: ``imagined_speech_decoding_tpu.server``
(``DecoderClient``). The reference has no deployment path — models are
re-instantiated from ``state_dict`` files inside each consumer script
(``/root/reference/scripts/explain_fast.py:32-54``).
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description="Serve a decoder over TCP")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--artifact", type=str, help="StableHLO file from isd-export-decoder")
    src.add_argument("--checkpoint", type=str,
                     help="best_subject.npz (live mode; supports RELOAD)")
    src.add_argument("--checkpoint-dir", type=str,
                     help="results dir with sub-*/best_subject.npz: serve the whole "
                          "fleet as one vmapped graph (DECODE = ensemble soft-vote, "
                          "DECODE_ALL = per-subject posteriors)")
    p.add_argument("--config", type=str, default="configs/default.yaml",
                   help="model config YAML (live mode)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=9333, help="0 picks a free port")
    p.add_argument("--notch", type=float, default=60.0,
                   help="live mode: notch Hz; 0 disables")
    p.add_argument("--band", type=float, nargs=2, default=[4.0, 40.0],
                   metavar=("LO", "HI"), help="live mode: band edges; 0 0 disables")
    p.add_argument("--max-requests", type=int, default=None,
                   help="exit after N decode requests (smoke tests)")
    p.add_argument("--reload-root", type=str, default=None,
                   help="live mode: directory RELOAD paths are confined to "
                        "(default: the served checkpoint's results tree)")
    p.add_argument("--auth-token", type=str, default=None,
                   help="shared secret required on RELOAD/SHUTDOWN requests "
                        "(read-only requests stay open)")
    return p


def build_server(args):
    """Construct the (unstarted) ``DecoderServer`` for ``args``."""
    from imagined_speech_decoding_tpu.server import DecoderServer, artifact_meta

    if args.artifact:
        from jax import export as jax_export

        import jax

        with open(args.artifact, "rb") as f:
            exported = jax_export.deserialize(f.read())
        meta = artifact_meta(exported)
        return DecoderServer(
            jax.jit(exported.call),
            host=args.host, port=args.port,
            info_extra={"source": os.path.abspath(args.artifact), "mode": "artifact"},
            max_requests=args.max_requests,
            auth_token=args.auth_token,
            **meta,
        )

    import jax

    from imagined_speech_decoding_tpu.config import load_config
    from imagined_speech_decoding_tpu.models.api import make_fast_model
    from imagined_speech_decoding_tpu.serving import make_online_decoder
    from imagined_speech_decoding_tpu.train.checkpoint import load_model_npz

    cfg = load_config(args.config if os.path.exists(args.config) else None).model
    model = make_fast_model(cfg)
    band = tuple(args.band) if args.band and args.band[0] > 0 else None

    if args.checkpoint_dir:
        import glob

        from imagined_speech_decoding_tpu.serving import (
            make_fleet_decoder,
            stack_checkpoints,
        )

        paths = sorted(
            glob.glob(os.path.join(args.checkpoint_dir, "sub-*", "best_subject.npz"))
        )
        if not paths:
            raise SystemExit(
                f"no sub-*/best_subject.npz under {args.checkpoint_dir}"
            )
        params, state = stack_checkpoints(paths, model)
        fleet = make_fleet_decoder(
            model.apply, params, state, notch_hz=args.notch or None, band=band
        )
        subjects = [os.path.basename(os.path.dirname(p)) for p in paths]
        return DecoderServer(
            fleet.ensemble,
            decode_all_fn=fleet,
            n_channels=cfg.n_channels, seq_len=cfg.seq_len, n_classes=cfg.n_classes,
            host=args.host, port=args.port,
            info_extra={
                "source": os.path.abspath(args.checkpoint_dir),
                "mode": "fleet",
                "n_models": fleet.n_models,
                "subjects": subjects,
            },
            max_requests=args.max_requests,
            auth_token=args.auth_token,
        )

    params, state = model.init(jax.random.PRNGKey(0))
    params, state, _ = load_model_npz(args.checkpoint, params, state)
    decode = make_online_decoder(
        model.apply, params, state, notch_hz=args.notch or None, band=band
    )

    def reload_weights(path: str) -> None:
        p0, s0 = model.init(jax.random.PRNGKey(0))
        p, s, _ = load_model_npz(path, p0, s0)
        decode.swap_weights(p, s)

    # RELOAD confinement: default to the results tree that contains the
    # served checkpoint (…/results/FAST for …/results/FAST/sub-01/
    # best_subject.npz), so sibling subjects' checkpoints stay loadable
    # while the rest of the filesystem is off-limits.
    reload_root = args.reload_root or os.path.dirname(
        os.path.dirname(os.path.abspath(args.checkpoint))
    )
    return DecoderServer(
        decode,
        n_channels=cfg.n_channels, seq_len=cfg.seq_len, n_classes=cfg.n_classes,
        host=args.host, port=args.port,
        reload_fn=reload_weights,
        reload_root=reload_root,
        info_extra={
            "source": os.path.abspath(args.checkpoint), "mode": "live",
            "reload_root": os.path.realpath(reload_root),
        },
        max_requests=args.max_requests,
        auth_token=args.auth_token,
    )


def _warn_if_exposed_unauthenticated(args) -> None:
    """Without --auth-token, RELOAD and SHUTDOWN are open to any peer
    that can reach the socket — fine on loopback, a footgun on a
    routable interface. Warn loudly rather than refuse: single-tenant
    lab networks are the common non-loopback deployment, and read-only
    DECODE is intentionally always open."""
    import ipaddress
    import sys

    if args.auth_token is not None:
        return
    try:
        loopback = ipaddress.ip_address(args.host).is_loopback
    except ValueError:  # hostname: "localhost" is the loopback spelling
        loopback = args.host == "localhost"
    if not loopback:
        print(
            f"WARNING: serving on non-loopback {args.host} with no "
            "--auth-token: any network peer can RELOAD or SHUT DOWN this "
            "daemon. Set --auth-token (or bind 127.0.0.1).",
            file=sys.stderr,
            flush=True,
        )


def main(argv=None):
    args = build_parser().parse_args(argv)
    from imagined_speech_decoding_tpu.cli import enable_cache

    enable_cache()
    _warn_if_exposed_unauthenticated(args)
    server = build_server(args)
    host, port = server.address
    meta = server.info
    print(
        f"serving {meta['mode']} decoder on {host}:{port} — "
        f"({meta['n_channels']}, {meta['seq_len']}) f32 windows -> "
        f"{meta['n_classes']} posteriors"
        + (" (reloadable)" if meta["reloadable"] else "")
        + (f" (fleet of {meta['n_models']})" if meta.get("fleet") else ""),
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
    return server


if __name__ == "__main__":
    main()
