"""Tracer spatial-convergence (MES) tests — the analogue of the reference's
``test/tracerEq/test_h-advection_mes.py`` / ``test_h-diffusion_mes.py``:
run the same setup at refinements, fit the log-log error slope, assert the
expected order within the reference's slope tolerance (0.2 relative)."""
import pytest as _pytest

#: long-running integration tier: run with `pytest -m slow`
pytestmark = _pytest.mark.slow

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from thetis_tpu import RectangleMesh, FunctionSpace, Function, DGAssembler
from thetis_tpu.equations.tracer_2d import TracerEquation2D
from thetis_tpu.timeintegration.steppers import SSPRK33


def tracer_opts(**kw):
    o = SimpleNamespace(
        use_lax_friedrichs_tracer=True,
        sipg_factor_tracer=1.0,
        tracer={},
    )
    for k, v in kw.items():
        setattr(o, k, v)
    return o


def run_advection(refinement):
    """Advect a sine hill through a channel with uniform velocity; compare
    against the exact translated profile at t=T."""
    n = 16 * refinement
    lx, ly = 1.0, 0.25
    mesh = RectangleMesh(n, max(2, n // 4), lx, ly)
    V = FunctionSpace(mesh, "DG", 1)
    asm = DGAssembler(mesh, V)
    u0 = 1.0
    T = 0.25

    def exact(x, y, t):
        xs = x - u0 * t
        r = jnp.abs(xs - 0.25) / 0.15
        return jnp.where(r < 1.0, 0.5 * (1 + jnp.cos(np.pi * r)), 0.0)

    eq = TracerEquation2D(
        mesh, asm, tracer_opts(), bathymetry=1.0, labels=["tracer_2d"],
        bnd_conditions={1: {"value": 0.0, "uv": jnp.asarray([u0, 0.0])}},
    )
    uv = jnp.broadcast_to(jnp.asarray([u0, 0.0]), (mesh.nc, 3, 2))
    fields = {"uv_2d": uv, "elev_2d": 0.0,
              "lax_friedrichs_tracer_scaling_factor": 1.0}
    c0 = Function(V).interpolate(lambda x, y: exact(x, y, 0.0))
    sol = {"tracer_2d": c0.data}
    dt = 0.2 / (16 * refinement) / u0 * 0.25
    nsteps = int(round(T / dt))
    dt = T / nsteps
    stepper = SSPRK33(eq, dt)

    def step(s, _):
        return stepper.advance(0.0, s, fields, fields, eq_bnd(eq)), None

    def eq_bnd(eq):
        return {1: {"value": 0.0, "uv": jnp.asarray([u0, 0.0])}}

    final, _ = jax.jit(lambda s: jax.lax.scan(step, s, None, length=nsteps))(sol)
    cex = Function(V).interpolate(lambda x, y: exact(x, y, T))
    err = asm.norm_l2(final["tracer_2d"] - cex.data)
    return float(err)


def run_diffusion(refinement):
    """Diffusing erf front in a channel, following the reference's
    ``test/tracerEq/test_h-diffusion_mes.py`` setup (start from t_init > 0
    for a smooth initial condition; closed/no-flux boundaries)."""
    from jax.scipy.special import erf

    lx, ly = 15.0e3, 1.5e3
    mu = 1.0e3
    nx = 8 * refinement
    mesh = RectangleMesh(nx, 2, lx, ly)
    V = FunctionSpace(mesh, "DG", 1)
    asm = DGAssembler(mesh, V)
    t_init, t_end = 1000.0, 3000.0
    x0 = lx / 2.0

    def exact(x, y, t):
        return -erf((x - x0) / jnp.sqrt(4 * mu * t))

    eq = TracerEquation2D(
        mesh, asm, tracer_opts(), bathymetry=40.0, labels=["tracer_2d"],
        bnd_conditions={},
    )
    fields = {"diffusivity_h-tracer_2d": mu}
    c0 = Function(V).interpolate(lambda x, y: exact(x, y, t_init))
    sol = {"tracer_2d": c0.data}
    dx = lx / nx
    dt = dx**2 / mu / 250.0
    nsteps = int(round((t_end - t_init) / dt))
    dt = (t_end - t_init) / nsteps
    stepper = SSPRK33(eq, dt)

    def step(s, _):
        return stepper.advance(0.0, s, fields, fields, {}), None

    final, _ = jax.jit(lambda s: jax.lax.scan(step, s, None, length=nsteps))(sol)
    cex = Function(V).interpolate(lambda x, y: exact(x, y, t_end))
    return float(asm.norm_l2(final["tracer_2d"] - cex.data)) / np.sqrt(lx * ly)


def check_slope(errors, refinements, expected, rtol=0.2):
    slope = stats.linregress(
        np.log(1.0 / np.asarray(refinements)), np.log(errors)
    ).slope
    assert slope > expected * (1 - rtol), f"slope {slope} < {expected}"
    return slope


def test_advection_mes():
    refs = [1, 2, 4]
    errs = [run_advection(r) for r in refs]
    slope = check_slope(errs, refs, 2.0)
    print("advection slope:", slope, errs)


def test_diffusion_mes():
    refs = [1, 2, 3]
    errs = [run_diffusion(r) for r in refs]
    slope = check_slope(errs, refs, 1.8)
    print("diffusion slope:", slope, errs)
