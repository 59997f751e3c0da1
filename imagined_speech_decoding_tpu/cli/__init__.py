"""Command-line entry points (reference ``scripts/`` parity).

Every entry point that runs jitted code calls :func:`enable_cache` at
the top of its ``main()``: the CLIs compile the same Pallas IIR kernels
as ``bench.py``, and on remote backends the first Mosaic compile of a
fresh process costs minutes without the persistent cache
(docs/PERFORMANCE.md, "Compile-cost anatomy"). The call lives in
``main()`` rather than at package import so that merely importing a CLI
module (parser introspection, docs generation) has no side effects —
``salted_cache_dir`` prunes sibling cache directories on disk.
"""

from imagined_speech_decoding_tpu._hostid import enable_persistent_cache


def enable_cache() -> None:
    """Turn on the host-salted persistent compilation cache (no-op if
    one is already configured, e.g. by pytest's conftest)."""
    enable_persistent_cache()
