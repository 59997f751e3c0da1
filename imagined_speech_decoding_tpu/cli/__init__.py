"""Command-line entry points (reference ``scripts/`` parity).

Importing this package turns on the host-salted persistent compilation
cache (no-op if one is already configured, e.g. by pytest's conftest):
every CLI compiles the same Pallas IIR kernels as ``bench.py``, and on
remote backends the first Mosaic compile of a fresh process costs
minutes without the cache (docs/PERFORMANCE.md, "Compile-cost anatomy").
"""

from imagined_speech_decoding_tpu._hostid import enable_persistent_cache

enable_persistent_cache()
