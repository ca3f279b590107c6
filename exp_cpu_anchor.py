"""Measured CPU anchor for BASELINE.md: run the EXACT 3D benchmark
workload (bench.build_workload_3d, f32) on one CPU core of this box and
report DOF*steps/s/core.  Because this stack's matrix-free XLA-CPU path
is itself heavily vectorized, 64 x this number is a *conservative*
(hard) stand-in for the '64-core CPU run' in the north-star target —
an assembled PETSc/Firedrake run pays per-step Python + assembly +
sparse-solver overheads this code does not.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"
)

import time
import json

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import bench  # noqa: E402


def main():
    state, nsteps, ndofs, _ = bench.build_workload_3d(24, 24, 12)
    n = 5
    fn = jax.jit(nsteps, static_argnames=("n",))
    out = jax.block_until_ready(fn(state, n))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(state, n))
        best = min(best, time.perf_counter() - t0)
    thr = ndofs * n / best
    print(json.dumps({
        "metric": "3d_baroclinic_dof_steps_per_sec_cpu_core",
        "value": thr,
        "n_dofs": ndofs,
        "x64_equivalent": 64 * thr,
    }))


if __name__ == "__main__":
    main()
