"""Non-hydrostatic pressure model (ref ``test/swe2d/test_standing_wave_nh.py``):
a dispersive standing wave (kH ~ 2.5, Pan et al. 2019 setup) must match the
full tanh dispersion relation at the reference's own error caps; a lake at
rest must stay at rest with q ~ 0."""
import math

import numpy as np
import pytest

from thetis_tpu import (
    RectangleMesh, FunctionSpace, Function, solver2d, physical_constants,
)


def test_nh_lake_at_rest():
    mesh2d = RectangleMesh(16, 1, 1e3, 62.5)
    p1 = FunctionSpace(mesh2d, "CG", 1)
    bathy = Function(p1, name="bathymetry").assign(50.0)
    so = solver2d.FlowSolver2d(mesh2d, bathy)
    o = so.options
    o.timestep = 10.0
    o.simulation_export_time = 100.0
    o.simulation_end_time = 100.0
    o.no_exports = True
    o.swe_timestepper_type = "CrankNicolson"
    o.nh_model_options.solve_nonhydrostatic_pressure = True
    so.assign_initial_conditions()
    so.iterate()
    assert np.abs(np.asarray(so.fields.elev_2d.data)).max() < 1e-8
    assert np.abs(np.asarray(so.fields.q_2d.data)).max() < 1e-4
    assert np.abs(np.asarray(so.fields.w_2d.data)).max() < 1e-8


@pytest.mark.parametrize("timesteps,max_rel_err", [
    (10, 1.6e-2), (20, 4e-3), (40, 1e-3)])
def test_nh_standing_wave(timesteps, max_rel_err):
    """Reference setup (``test_standing_wave_nh.py:31-106``): lx=20 m,
    depth=8 m, one full wavelength; after one exact-dispersion period the
    surface must match the initial condition at the reference caps."""
    lx, ly, nx = 20.0, 4.0, 20
    depth, amp = 8.0, 0.1
    g = float(physical_constants["g_grav"])
    c = math.sqrt(g * lx / (2 * math.pi) * math.tanh(2 * math.pi * depth / lx))
    period = lx / c
    dt = period / timesteps

    mesh2d = RectangleMesh(nx, 1, lx, ly)
    p1 = FunctionSpace(mesh2d, "CG", 1)
    bathy = Function(p1, name="bathymetry").assign(depth)
    so = solver2d.FlowSolver2d(mesh2d, bathy)
    o = so.options
    o.timestep = dt
    o.simulation_export_time = period
    o.simulation_end_time = period - 0.01 * dt
    o.no_exports = True
    o.swe_timestepper_type = "CrankNicolson"
    o.swe_timestepper_options.use_semi_implicit_linearization = False
    o.nh_model_options.solve_nonhydrostatic_pressure = True
    elev0 = Function(p1).interpolate(
        lambda x, y: amp * np.cos(2 * np.pi * x / lx)
    )
    so.assign_initial_conditions(elev=elev0)
    so.iterate()

    H2 = so.function_spaces.H_2d
    omega = math.sqrt(2 * math.pi * g / lx * math.tanh(2 * math.pi * depth / lx))
    anal = Function(H2).interpolate(
        lambda x, y: amp * np.cos(2 * np.pi * x / lx)
        * math.cos(omega * period)
    )
    rel = float(
        so.asm.norm_l2(so.fields.elev_2d.data - anal.data)
    ) / math.sqrt(lx * ly)
    print(f"n={timesteps}: rel_err={rel:.4e}")
    assert rel < max_rel_err
    # NH diagnostics active and bounded
    q = np.asarray(so.fields.q_2d.data)
    w = np.asarray(so.fields.w_2d.data)
    assert np.isfinite(q).all() and np.abs(q).max() > 1.0
    assert np.isfinite(w).all() and np.abs(w).max() > 1e-4
