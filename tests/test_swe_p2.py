"""Spatial convergence of the degree-2 DG SWE pair (``polynomial_degree
= 2``, dg-dg): a small-amplitude standing wave in a closed channel must
converge at order ~ p+1 = 3, one order above the P1 pair on the same
ladder (ref ``get_functionspace`` supports arbitrary degree,
``utility.py:163-225``; this exercises the generic quad-bucket residual
path at 6 dofs/cell/component)."""
import math

import numpy as np
import pytest

from thetis_tpu import (
    RectangleMesh, FunctionSpace, Function, solver2d, physical_constants,
)


def run(nx, degree):
    lx = 5e3
    ly = lx / nx  # one strip of cells; keep elements isotropic
    mesh2d = RectangleMesh(nx, 1, lx, ly)

    depth = 100.0
    amp = 0.01  # linear regime: amp/depth = 1e-4
    g = float(physical_constants["g_grav"])
    c = math.sqrt(g * depth)
    period = 2 * lx / c
    t_end = period / 10.0
    nsteps = 8 * nx  # dt ~ h: temporal (SSPRK33, 3rd order) error rides h^3
    dt = t_end / nsteps

    p1_2d = FunctionSpace(mesh2d, "CG", 1)
    bathymetry_2d = Function(p1_2d, name="bathymetry").assign(depth)

    s = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
    o = s.options
    o.element_family = "dg-dg"
    o.polynomial_degree = degree
    # the analytic standing wave solves the *linear* SWE; the nonlinear
    # correction is O(amp/depth) and floors the P2 ladder at ~1e-7
    o.use_nonlinear_equations = False
    o.swe_timestepper_type = "SSPRK33"
    o.swe_timestepper_options.use_automatic_timestep = False
    o.timestep = dt
    o.simulation_export_time = dt * nsteps
    o.simulation_end_time = t_end - 0.1 * dt
    o.no_exports = True

    s.create_function_spaces()
    H_2d = s.function_spaces.H_2d
    k = math.pi / lx
    elev_init = Function(H_2d).interpolate(
        lambda xx, yy: amp * np.cos(k * xx))
    s.assign_initial_conditions(elev=elev_init)
    s.iterate()

    omega = c * k
    elev_exact = Function(H_2d).interpolate(
        lambda xx, yy: amp * np.cos(k * xx) * math.cos(omega * t_end))
    diff = s.fields.elev_2d.data - elev_exact.data
    return float(s.asm.norm_l2(diff)) / math.sqrt(lx * ly)


@pytest.mark.parametrize("degree,min_slope", [(2, 2.5)])
def test_standing_wave_p2_order(degree, min_slope):
    errs = [run(nx, degree) for nx in (8, 16, 32)]
    slopes = [math.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    print("errs", errs, "slopes", slopes)
    assert min(slopes) > min_slope


def test_p2_beats_p1():
    e1 = run(16, 1)
    e2 = run(16, 2)
    print("p1", e1, "p2", e2)
    assert e2 < 0.2 * e1


def run_tracer(nx, degree):
    """Smooth sine profile advected once around a periodic channel
    (generic quad-bucket tracer path at 6 dofs/cell; ref
    ``tracer_eq_2d.py`` supports any degree via ``get_functionspace``)."""
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp

    from thetis_tpu import PeriodicRectangleMesh, DGAssembler
    from thetis_tpu.equations.tracer_2d import TracerEquation2D
    from thetis_tpu.timeintegration.steppers import SSPRK33

    lx, ly = 1.0, 1.0 / nx
    mesh = PeriodicRectangleMesh(nx, 1, lx, ly, direction="x")
    V = FunctionSpace(mesh, "DG", degree)
    asm = DGAssembler(mesh, V)
    u0, t_end = 1.0, 0.3

    opts = SimpleNamespace(use_lax_friedrichs_tracer=True,
                           sipg_factor_tracer=1.0, tracer={})
    eq = TracerEquation2D(mesh, asm, opts, bathymetry=1.0,
                          labels=["tracer_2d"], bnd_conditions={})
    uv = jnp.broadcast_to(jnp.asarray([u0, 0.0]), (mesh.nc, V.ndofs, 2))
    fields = {"uv_2d": uv, "elev_2d": 0.0,
              "lax_friedrichs_tracer_scaling_factor": 1.0}
    c0 = Function(V).interpolate(
        lambda x, y: np.sin(2 * np.pi * x))
    nsteps = 6 * nx
    dt = t_end / nsteps
    stepper = SSPRK33(eq, dt)

    def step(s, _):
        return stepper.advance(0.0, s, fields, fields, {}), None

    final, _ = jax.jit(
        lambda s: jax.lax.scan(step, s, None, length=nsteps)
    )({"tracer_2d": c0.data})
    cex = Function(V).interpolate(
        lambda x, y: np.sin(2 * np.pi * (x - u0 * t_end)))
    return float(asm.norm_l2(final["tracer_2d"] - cex.data)) / math.sqrt(
        lx * ly)


def test_tracer_p2_order():
    errs = [run_tracer(nx, 2) for nx in (8, 16, 32)]
    slopes = [math.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    print("tracer errs", errs, "slopes", slopes)
    assert min(slopes) > 2.5
