"""Pallas TPU kernels for the hot ops, behind the same call signatures
as their XLA counterparts in ``ops``. CPU tests run them in interpret
mode; on TPU they are drop-in accelerations (the IIR kernel is ~8x the
``lax.scan`` path at corpus scale and bit-identical to it)."""

from .iir import sosfilt_pallas, sosfiltfilt_pallas, sosfilt_time_major  # noqa: F401
