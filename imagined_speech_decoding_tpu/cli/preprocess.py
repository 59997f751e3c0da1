"""Preprocess CLI: raw dataset → standardized HDF5 caches.

Parity with ``scripts/preprocess.py`` (official-splits cache with
metadata attrs, per-split failure tolerance) plus the per-subject-group
cache of ``src/fast/data/preprocess.py:214-224``, and an optional jitted
filtering pass (notch + band-pass) applied on-device before writing —
the reference's downstream scripts filter per-trial on the host; here
the whole corpus filters in one XLA program.
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Build BCIC2020Track3 HDF5 caches")
    p.add_argument("--data_folder", type=str, default="BCIC2020Track3")
    p.add_argument("--excel_path", type=str, default=None)
    p.add_argument("--output", type=str, default="data/processed/BCIC2020Track3.h5")
    p.add_argument(
        "--layout", choices=["official", "subjects"], default="official",
        help="official: X_train/..., subjects: per-subject groups",
    )
    p.add_argument("--notch", type=float, default=None, help="notch frequency (e.g. 60)")
    p.add_argument("--bandpass", type=float, nargs=2, default=None, metavar=("LO", "HI"))
    p.add_argument("--no-compress", action="store_true")
    p.add_argument(
        "--no-strict", action="store_true",
        help="disable strict schema validation of the raw files (strict "
        "is the default: a present-but-deviating .mat/.xlsx fails loudly "
        "with the expected schema instead of caching silently wrong arrays)",
    )
    return p


def _filter_h5(path: str, notch, bandpass):
    """Apply jitted filtering to every dataset in the cache, in place."""
    import h5py
    import jax
    import jax.numpy as jnp

    from imagined_speech_decoding_tpu.data.constants import SFREQ
    from imagined_speech_decoding_tpu.ops import (
        butter_sos,
        filtfilt,
        notch_ba,
        sosfiltfilt,
    )

    @jax.jit
    def proc(x):
        if notch is not None:
            b, a = notch_ba(SFREQ, notch)
            x = filtfilt(b, a, x)
        if bandpass is not None:
            x = sosfiltfilt(butter_sos(SFREQ, bandpass[0], bandpass[1]), x)
        return x

    with h5py.File(path, "r+") as f:
        def visit(name, obj):
            if isinstance(obj, h5py.Dataset) and name.split("/")[-1].startswith("X"):
                obj[...] = proc(jnp.asarray(obj[...]))

        f.visititems(visit)


def main(argv=None):
    args = build_parser().parse_args(argv)
    from imagined_speech_decoding_tpu.cli import enable_cache

    enable_cache()
    from imagined_speech_decoding_tpu.data import (
        build_official_cache,
        build_subject_cache,
        resolve_data_folder,
    )

    base = resolve_data_folder(args.data_folder)
    os.makedirs(os.path.dirname(os.path.abspath(args.output)) or ".", exist_ok=True)

    strict = not args.no_strict
    if args.layout == "official":
        path = build_official_cache(
            base, args.output, excel_path=args.excel_path,
            compression=None if args.no_compress else "gzip", strict=strict,
        )
    else:
        path = build_subject_cache(base, args.output, strict=strict)

    if args.notch is not None or args.bandpass is not None:
        print(f"filtering cache on device (notch={args.notch}, bandpass={args.bandpass})")
        _filter_h5(path, args.notch, args.bandpass)

    if strict:
        from imagined_speech_decoding_tpu.data.cache import manifest_check

        manifest_check(path)

    print(f"cache written: {path} ({os.path.getsize(path) / 1e6:.1f} MB)")
    return path


if __name__ == "__main__":
    main()
