"""Pallas TPU kernels for the hot, latency-bound inner loops.

XLA compiles each ``lax.scan`` iteration and each small elementwise op
into its own device kernel; on the v5e the fixed per-kernel cost
(~0.3-0.5 ms at framework sizes) dominates the DG workloads (PERF.md
"kernel-latency bound").  These modules fuse whole sequential sweeps
(tridiagonal column solves, Krylov iterations) into single Pallas
launches.  Every kernel has a pure-jnp fallback used automatically on
non-TPU backends (the CPU test suite) and for shapes the kernel does
not support.
"""
from .tridiag import tridiag_solve  # noqa: F401
