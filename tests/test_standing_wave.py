"""Temporal convergence of CrankNicolson on a standing wave, using the
reference's exact setup and acceptance thresholds
(``test/swe2d/test_standing_wave.py:12-18``): one period of a standing wave
in a closed channel, rel. L2 error <= {2e-2, 5e-3, 1.25e-3} at
{10, 20, 40} steps (2nd-order temporal convergence)."""
import math

import numpy as np
import pytest

from thetis_tpu import (
    RectangleMesh,
    FunctionSpace,
    Function,
    solver2d,
    physical_constants,
)


@pytest.mark.parametrize(
    "timesteps,max_rel_err,stepper",
    [
        (10, 0.02, "CrankNicolson"),
        (20, 5e-3, "CrankNicolson"),
        (40, 1.25e-3, "CrankNicolson"),
        (20, 5e-3, "PressureProjectionPicard"),
    ],
)
def test_standing_wave_channel(timesteps, max_rel_err, stepper):
    lx = 5e3
    ly = 1e3
    nx = 100
    mesh2d = RectangleMesh(nx, 1, lx, ly)

    n = timesteps
    depth = 100.0
    g = float(physical_constants["g_grav"])
    c = math.sqrt(g * depth)
    period = 2 * lx / c
    dt = period / n
    t_end = period - 0.1 * dt

    p1_2d = FunctionSpace(mesh2d, "CG", 1)
    bathymetry_2d = Function(p1_2d, name="bathymetry").assign(depth)

    solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
    o = solver_obj.options
    o.timestep = dt
    o.simulation_export_time = dt * n  # single export at the end
    o.simulation_end_time = t_end
    o.no_exports = True
    o.swe_timestepper_type = stepper
    if stepper == "CrankNicolson":
        # CN stops being 2nd order if linearised (ref comment L53-55);
        # PressureProjectionPicard restores 2nd order with 2 Picard sweeps
        o.swe_timestepper_options.use_semi_implicit_linearization = False
    elif stepper == "PressureProjectionPicard":
        # the predictor/corrector + wave-Schur preconditioner assume the
        # dg-cg pair, exactly as the reference configures this test
        # (ref test_standing_wave.py:56-61, timestepper.py:358-370)
        o.element_family = "dg-cg"

    solver_obj.create_function_spaces()
    H_2d = solver_obj.function_spaces.H_2d
    elev_init = Function(H_2d).interpolate(
        lambda xx, yy: np.cos(np.pi * xx / lx)
    )
    solver_obj.assign_initial_conditions(elev=elev_init)
    solver_obj.iterate()

    elev_exact = Function(H_2d).interpolate(
        lambda xx, yy: np.cos(np.pi * xx / lx)
    )
    area = lx * ly
    diff = solver_obj.fields.elev_2d.data - elev_exact.data
    if stepper == "PressureProjectionPicard":
        norm = solver_obj.eq_sw.norm_elev(diff)
    else:
        norm = solver_obj.asm.norm_l2(diff)
    rel_err = float(norm) / math.sqrt(area)
    print(f"n={n} rel_err={rel_err}")
    assert rel_err < max_rel_err
