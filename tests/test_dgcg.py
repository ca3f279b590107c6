"""dg-cg element family (P1DG velocity x P2 CG elevation, ref
``solver2d.py:307-352``): the reference's standing-wave temporal
convergence thresholds must hold for dg-cg too, with both CrankNicolson
and PressureProjectionPicard (the family's canonical stepper)."""
import math

import numpy as np
import pytest

from thetis_tpu import (
    RectangleMesh, FunctionSpace, Function, solver2d, physical_constants,
)


def run_standing_wave(timesteps, stepper):
    lx, ly, nx = 5e3, 1e3, 100
    depth = 100.0
    g = float(physical_constants["g_grav"])
    c = math.sqrt(g * depth)
    period = 2 * lx / c
    dt = period / timesteps

    mesh2d = RectangleMesh(nx, 1, lx, ly)
    p1 = FunctionSpace(mesh2d, "CG", 1)
    bathy = Function(p1, name="bathymetry").assign(depth)
    so = solver2d.FlowSolver2d(mesh2d, bathy)
    o = so.options
    o.element_family = "dg-cg"
    o.timestep = dt
    o.simulation_export_time = dt * timesteps
    o.simulation_end_time = period - 0.1 * dt
    o.no_exports = True
    o.swe_timestepper_type = stepper
    if stepper == "CrankNicolson":
        o.swe_timestepper_options.use_semi_implicit_linearization = False
    so.create_function_spaces()
    H2 = so.function_spaces.H_2d
    e0 = Function(H2).interpolate(lambda x, y: np.cos(np.pi * x / lx))
    so.assign_initial_conditions(elev=e0)
    so.iterate()
    exact = Function(H2).interpolate(lambda x, y: np.cos(np.pi * x / lx))
    return float(
        so.eq_sw.norm_elev(so.fields.elev_2d.data - exact.data)
    ) / math.sqrt(lx * ly)


@pytest.mark.parametrize("timesteps,max_rel_err,stepper", [
    (10, 2e-2, "CrankNicolson"),
    (20, 5e-3, "CrankNicolson"),
    (20, 5e-3, "PressureProjectionPicard"),
])
def test_dgcg_standing_wave(timesteps, max_rel_err, stepper):
    rel_err = run_standing_wave(timesteps, stepper)
    print(f"dg-cg {stepper} n={timesteps}: rel_err={rel_err:.4e}")
    assert rel_err < max_rel_err


def test_dgcg_mass_conservation():
    """Closed-basin volume is conserved with the CG elevation."""
    lx = 2e3
    mesh2d = RectangleMesh(20, 4, lx, lx / 5)
    p1 = FunctionSpace(mesh2d, "CG", 1)
    bathy = Function(p1).assign(20.0)
    so = solver2d.FlowSolver2d(mesh2d, bathy)
    o = so.options
    o.element_family = "dg-cg"
    o.timestep = 10.0
    o.simulation_export_time = 100.0
    o.simulation_end_time = 300.0
    o.no_exports = True
    o.swe_timestepper_type = "CrankNicolson"
    so.create_function_spaces()
    H2 = so.function_spaces.H_2d
    e0 = Function(H2).interpolate(
        lambda x, y: 0.5 * np.exp(-(((x - lx / 2) / 300.0) ** 2))
    )
    so.assign_initial_conditions(elev=e0)
    so.initialize()
    v0 = so.compute_volume_2d()
    so.iterate()
    v1 = so.compute_volume_2d()
    assert abs(v1 - v0) / abs(v0) < 1e-10
    assert np.isfinite(np.asarray(so.fields.elev_2d.data)).all()


def test_ppp_schur_bounded_iterations():
    """The wave-equation Schur preconditioner (AssembledSchurPC analogue)
    makes the dg-cg corrector converge within a tight Krylov budget at
    wave CFL ~ 10 (ref ``assembledschur.py``, ``timeintegrator.py:
    305-464``): a single 30-iteration FGMRES cycle preserves the standing
    wave, where an unpreconditioned budget this small would stall (the
    divergence guard in solvers.newton poisons stalled solves with NaN).
    """
    from thetis_tpu.solvers.newton import NewtonParameters

    lx, ly, nx = 5e3, 1e3, 100
    depth = 100.0
    g = float(physical_constants["g_grav"])
    c = math.sqrt(g * depth)
    period = 2 * lx / c
    dt = period / 20  # wave CFL = c dt / dx ~ 10

    mesh2d = RectangleMesh(nx, 1, lx, ly)
    p1 = FunctionSpace(mesh2d, "CG", 1)
    so = solver2d.FlowSolver2d(mesh2d, Function(p1).assign(depth))
    o = so.options
    o.element_family = "dg-cg"
    o.timestep = dt
    o.simulation_export_time = dt * 20
    o.simulation_end_time = period - 0.1 * dt
    o.no_exports = True
    o.swe_timestepper_type = "PressureProjectionPicard"
    o.swe_timestepper_options.solver_parameters = NewtonParameters(
        ksp_rtol=1e-10, ksp_max_it=30, gmres_restart=30,
    )
    so.create_function_spaces()
    H2 = so.function_spaces.H_2d
    e0 = Function(H2).interpolate(lambda x, y: np.cos(np.pi * x / lx))
    so.assign_initial_conditions(elev=e0)
    so.initialize()
    assert so.timestepper.use_schur_pc
    so.iterate()
    exact = Function(H2).interpolate(lambda x, y: np.cos(np.pi * x / lx))
    rel_err = float(
        so.eq_sw.norm_elev(so.fields.elev_2d.data - exact.data)
    ) / math.sqrt(lx * ly)
    assert np.isfinite(rel_err)
    assert rel_err < 5e-3, f"Schur-PC corrector lost the wave: {rel_err}"
