"""Benchmark: 2D shallow-water throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "DOF*steps/s", "vs_baseline": R}

Workload: full nonlinear 2D SWE (pressure gradient + HUDiv + advection +
Lax-Friedrichs + quadratic drag), P1DG x P1DG, ~0.92M DOF, SSPRK33, f32 —
the explicit kernel-bound configuration (BASELINE.md north-star metric
"DOF*steps/sec/chip").

``vs_baseline``: the reference publishes no numbers (BASELINE.md) and
Firedrake cannot run in this container.  The baseline is the BASELINE.json
north star — a 64-core CPU Firedrake run — estimated from the typical
throughput of PETSc-assembled P1DG shallow-water systems
(~2e5 DOF*steps/s/core; assembled residual+Jacobian each step, KSP solve):
baseline = 64 * 2e5 = 1.28e7 DOF*steps/s.  For transparency the JSON also
reports this framework's own single-core CPU throughput (``cpu_core``),
which is much faster than Firedrake's assembled path and therefore NOT used
as the baseline proxy.
"""
import json
import os
import time

import jax
import numpy as np

# persistent compilation cache: TPU compiles go through a remote-compile
# tunnel in this environment (~minutes); cache so reruns are instant
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_workload(nx, ny, platform_dtype_note=""):
    import jax.numpy as jnp
    from types import SimpleNamespace
    from thetis_tpu.mesh.generation import RectangleMesh
    from thetis_tpu.fem.functionspace import FunctionSpace, Function
    from thetis_tpu.fem.assembly import DGAssembler
    from thetis_tpu.equations.shallowwater_2d import (
        ShallowWaterEquations,
        swe_state,
    )
    from thetis_tpu.timeintegration.steppers import SSPRK33

    lx, ly = 100e3, 50e3
    mesh = RectangleMesh(nx, ny, lx, ly)
    V = FunctionSpace(mesh, "DG", 1)
    asm = DGAssembler(mesh, V)
    opts = SimpleNamespace(
        use_nonlinear_equations=True,
        use_wetting_and_drying=False,
        use_lax_friedrichs_velocity=True,
        use_grad_div_viscosity_term=False,
        use_grad_depth_viscosity_term=True,
        sipg_factor=1.0,
        norm_smoother=0.0,
    )
    eq = ShallowWaterEquations(
        mesh, asm, opts, bathymetry=50.0, bnd_conditions={}
    )
    elev0 = Function(V).interpolate(
        lambda x, y: 1.0
        * jnp.exp(-(((x - lx / 2) / 15e3) ** 2) - ((y - ly / 2) / 15e3) ** 2)
    )
    sol = swe_state(jnp.zeros((mesh.nc, 3, 2), dtype=elev0.data.dtype),
                    elev0.data)
    fields = {
        "lax_friedrichs_velocity_scaling_factor": jnp.asarray(1.0),
        "quadratic_drag_coefficient": jnp.asarray(2.5e-3),
    }
    # explicit CFL: stability limit is ~inradius/(2.5 c) for P1DG SSPRK33;
    # hmin is the min edge, inradius ~ 0.29*hmin for right triangles
    c = np.sqrt(9.81 * 51.0)
    dt = 0.08 * float(mesh.cell_hmin_np.min()) / c
    stepper = SSPRK33(eq, dt)
    n_dofs = mesh.nc * 3 * 3  # uv (2 comps) + eta, 3 nodes each

    def nsteps(sol, n):
        def body(s, _):
            return stepper.advance(0.0, s, fields, fields, {}), None

        out, _ = jax.lax.scan(body, sol, None, length=n)
        return out

    return sol, nsteps, n_dofs


def measure(sol, nsteps, n_dofs, n, device):
    import jax.numpy as jnp

    sol = jax.device_put(sol, device)
    fn = jax.jit(nsteps, static_argnames=("n",))
    # warmup/compile with the SAME static n (a different n is a new compile)
    out = fn(sol, n)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(sol, n)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    assert bool(jnp.isfinite(out["elev"]).all()), "benchmark state diverged"
    return n_dofs * n / elapsed


def main():
    devices = jax.devices()
    dev = devices[0]
    on_tpu = dev.platform != "cpu"

    # main TPU measurement: ~0.92M DOF
    sol, nsteps, n_dofs = build_workload(320, 160)
    tpu_throughput = measure(sol, nsteps, n_dofs, n=30, device=dev)

    # CPU single-core proxy baseline on a smaller copy (same kernels),
    # throughput is size-independent enough at this scale
    try:
        cpu = jax.devices("cpu")[0]
        sol_c, nsteps_c, n_dofs_c = build_workload(96, 48)
        cpu_throughput = measure(sol_c, nsteps_c, n_dofs_c, n=5, device=cpu)
    except Exception:
        cpu_throughput = None

    firedrake_64core_estimate = 64.0 * 2.0e5
    vs_baseline = tpu_throughput / firedrake_64core_estimate
    print(
        json.dumps(
            {
                "metric": "2d_swe_dof_steps_per_sec_per_chip",
                "value": tpu_throughput,
                "unit": "DOF*steps/s",
                "vs_baseline": vs_baseline,
                "baseline_estimate": firedrake_64core_estimate,
                "cpu_core": cpu_throughput,
            }
        )
    )


if __name__ == "__main__":
    main()
