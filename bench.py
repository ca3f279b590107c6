"""Benchmark: throughput on one TPU chip. Prints ONE JSON line.

Headline metric (BASELINE.md north star): **3D baroclinic channel**
(Danilov 2012 config, ``examples/baroclinic_channel``) at ~1.04M
prognostic DOF — the case the reference target is defined on (>= 20x
time-to-solution vs a 64-core CPU Firedrake run on v5p-8).  Secondary
metrics: explicit 2D SWE (SSPRK33) and the reference's default implicit
2D stepper (semi-implicit CrankNicolson).

``vs_baseline``: the reference publishes no numbers (BASELINE.md); no
Firedrake exists in this container.  The 64-core baseline is estimated
from the typical throughput of assembled-PETSc Thetis runs:
  * 2D P1DG SWE: ~2e5 DOF*steps/s/core (residual+Jacobian assembly + KSP)
  * 3D mode-split baroclinic: ~7.5e4 DOF*steps/s/core (momentum + tracer
    assembly, vertical-implicit solves, ALE updates per step cost ~2-3x a
    2D step per DOF)
so baseline_3d = 64 * 7.5e4 = 4.8e6 DOF*steps/s.  ``vs_baseline`` is the
per-chip ratio against that 64-core estimate; the v5p-8 north star has 8
(faster) chips on top of this.  See PERF.md for the breakdown.
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

BASELINE_2D = 64 * 2.0e5
BASELINE_3D = 64 * 7.5e4


def build_workload_2d(nx, ny, stepper="SSPRK33"):
    import jax.numpy as jnp
    from types import SimpleNamespace
    from thetis_tpu.mesh.generation import RectangleMesh
    from thetis_tpu.fem.functionspace import FunctionSpace, Function
    from thetis_tpu.fem.assembly import DGAssembler
    from thetis_tpu.equations.shallowwater_2d import (
        ShallowWaterEquations,
        swe_state,
    )
    from thetis_tpu.timeintegration.steppers import get_stepper

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
    c = np.sqrt(9.81 * 51.0)
    if stepper == "SSPRK33":
        dt = 0.08 * float(mesh.cell_hmin_np.min()) / c
        st = get_stepper("SSPRK33", eq, dt)
    else:
        dt = 2.0 * float(mesh.cell_hmin_np.min()) / c  # wave CFL ~2 (hmin)
        from thetis_tpu.solvers.newton import NewtonParameters

        # semi-implicit system is affine + 1-ring local: per-step
        # assembled-Jacobian KSP (shift-stencil matvecs, component-major
        # layout, fused Pallas ring matvec).  At this implicit wave CFL
        # plain block-Jacobi FGMRES converges in ~20-26 iterations and
        # the round-5 sweep (exp_cn.py nopc / PERF.md) measured it
        # FASTER end-to-end than the two-level V-cycle (58 vs 84
        # ms/step): each V-cycle costs ~2 ms of kernel dispatch against
        # ~10 saved ~1.8 ms iterations.  Coarse/Schur PCs take over at
        # larger CFL (see flowsolver2d._build_coarse policy).
        st = get_stepper(
            "CrankNicolson", eq, dt, semi_implicit=True,
            assembled_solve=True,
            solver_parameters=NewtonParameters(ksp_rtol=1e-5, ksp_max_it=32,
                                               gmres_restart=8),
        )
    n_dofs = mesh.nc * 3 * 3

    def nsteps(sol, n):
        def body(s, _):
            return st.advance(0.0, s, fields, fields, {}), None

        out, _ = jax.lax.scan(body, sol, None, length=n)
        return out

    return sol, nsteps, n_dofs


def build_workload_3d(nx, ny, nz):
    """Baroclinic channel (Danilov 2012; examples/baroclinic_channel) —
    the north-star configuration."""
    import jax.numpy as jnp
    from thetis_tpu.mesh.generation import PeriodicRectangleMesh
    from thetis_tpu.model.flowsolver3d import FlowSolver
    from thetis_tpu.utils.coordsys import beta_plane_coriolis_params
    from thetis_tpu.config import physical_constants

    physical_constants["rho0"] = 1020.0
    lx = ly = 1600e3
    depth = 1600.0
    mesh2d = PeriodicRectangleMesh(nx, ny, lx, ly, direction="x")
    delta_x = lx / nx
    u_scale = 0.5
    nu_scale = u_scale * delta_x / 200.0
    f0, beta = beta_plane_coriolis_params(37.5)
    # CG1 coriolis field
    cor = f0 + beta * (mesh2d.coords_np[:, 1] - ly / 2)

    s = FlowSolver(mesh2d, jnp.asarray(depth), nz)
    s.options.update(dict(
        timestepper_type="SSPRK22",
        solve_salinity=False,
        solve_temperature=True,
        constant_salinity=35.0,
        use_baroclinic_formulation=True,
        use_implicit_vertical_diffusion=True,
        use_bottom_friction=True,
        coriolis_frequency=jnp.asarray(cor),
        vertical_viscosity=1e-3,
        vertical_diffusivity=1e-5,
        horizontal_viscosity=nu_scale,
        horizontal_diffusivity=30.0,
        equation_of_state_type="linear",
        timestep=300.0,
        simulation_export_time=24 * 3600.0,
        simulation_end_time=24 * 3600.0,
    ))
    s.initialize()
    x = mesh2d.coords_np[mesh2d.cells_np]  # (nc, 3, 2) P1DG nodes
    temp_max, temp_ddy, temp_ddz = 25.0, -5e-6, 8.2e-3
    y_pert = 0.1 * ly * np.sin(2 * np.pi * x[..., 0] / lx)
    t2d = temp_max + temp_ddy * (x[..., 1] + y_pert - ly / 2)
    # vertical structure: linear stratification
    sigma = np.linspace(-depth, 0.0, nz + 1)
    z_nodes = np.stack([sigma[:-1], sigma[1:]], axis=-1)  # (nz, 2)
    temp0 = (
        t2d[:, :, None, None]
        + temp_ddz * (z_nodes[None, None] + depth / 2)
    )
    s.assign_initial_conditions(elev=jnp.zeros((mesh2d.nc, 3)),
                                temp=jnp.asarray(temp0))
    state = s._get_state()
    swe_fields = s._gather_swe_fields()

    def nsteps(state, n):
        def body(c, _):
            return s._step(c, swe_fields, {}), None

        return jax.lax.scan(body, state, None, length=n)[0]

    s3 = mesh2d.nc * 3 * nz * 2
    s2 = mesh2d.nc * 3
    n_dofs = 3 * s3 + 3 * s2  # uv_3d(2) + temp + 2D (uv, elev)
    return state, nsteps, n_dofs, s


def measure(sol, nsteps, n_dofs, n, device, check=None):
    import jax.numpy as jnp

    sol = jax.device_put(sol, device)
    fn = jax.jit(nsteps, static_argnames=("n",))
    # warmup/compile with the SAME static n (a different n is a new compile)
    out = fn(sol, n)
    jax.block_until_ready(out)
    # best-of-3: host-side contention (background compiles on the 1-CPU
    # box) adds several-ms noise to a single scanned-call measurement
    elapsed = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(sol, n)
        jax.block_until_ready(out)
        elapsed = min(elapsed, time.perf_counter() - t0)
    leaf = check(out) if check is not None else out["elev"]
    assert bool(jnp.isfinite(leaf).all()), "benchmark state diverged"
    return n_dofs * n / elapsed


def main():
    devices = jax.devices()
    dev = devices[0]

    # --- headline: 3D baroclinic channel, ~1.04M prognostic DOF
    state3, nsteps3, ndofs3, _ = build_workload_3d(48, 48, 12)
    thr_3d = measure(state3, nsteps3, ndofs3, n=20, device=dev,
                     check=lambda o: o["temp_3d"])

    # --- secondary: 2D explicit (SSPRK33) and implicit (CN) @ ~0.92M DOF
    sol, nsteps, n_dofs = build_workload_2d(320, 160, "SSPRK33")
    thr_2d = measure(sol, nsteps, n_dofs, n=30, device=dev)
    sol_cn, nsteps_cn, n_dofs_cn = build_workload_2d(320, 160, "CN")
    thr_2d_cn = measure(sol_cn, nsteps_cn, n_dofs_cn, n=10, device=dev)

    print(
        json.dumps(
            {
                "metric": "3d_baroclinic_dof_steps_per_sec_per_chip",
                "value": thr_3d,
                "unit": "DOF*steps/s",
                "vs_baseline": thr_3d / BASELINE_3D,
                "baseline_estimate_3d": BASELINE_3D,
                "n_dofs_3d": ndofs3,
                "2d_swe_ssprk33_dof_steps_per_sec": thr_2d,
                "2d_swe_cn_dof_steps_per_sec": thr_2d_cn,
                "2d_vs_baseline": thr_2d / BASELINE_2D,
                "baseline_estimate_2d": BASELINE_2D,
            }
        )
    )


if __name__ == "__main__":
    main()
