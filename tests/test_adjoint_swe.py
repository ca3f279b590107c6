"""Adjoint-gradient consistency (Taylor) tests, mirroring
``test_adjoint/test_swe_adjoint.py``: functional J = integral of u_x over
the domain after a forward SWE run; gradient w.r.t. the quadratic bottom
drag field; Taylor convergence rate must exceed 1.90 (ref L123)."""
import numpy as np
import jax.numpy as jnp
import pytest

from thetis_tpu import (
    RectangleMesh, FunctionSpace, Function, Constant, solver2d,
    SpatialCoordinate, exp,
)
from thetis_tpu.adjoint import Control, ReducedFunctional, taylor_test

velocity_u = 2.0


def basic_setup(stepper):
    lx, ly = 100.0, 50.0
    # SteadyState uses dense-LU solves (jacfwd materialisation ~ O(n^2));
    # keep its mesh small
    nx, ny = (10, 5) if stepper == "SteadyState" else (16, 8)
    mesh2d = RectangleMesh(nx, ny, lx, ly)
    P1_2d = FunctionSpace(mesh2d, "CG", 1)
    bathymetry_2d = Function(P1_2d, name="Bathymetry").assign(50.0)

    solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
    options = solver_obj.options
    options.simulation_export_time = 2.0
    options.simulation_end_time = 2.0
    options.swe_timestepper_type = stepper
    options.timestep = 0.5
    options.horizontal_viscosity = Constant(2.0)
    options.no_exports = True
    if stepper == "CrankNicolson":
        options.swe_timestepper_options.implicitness_theta = 1.0
    # the reference's version of this test uses exact LU solves; tighten the
    # Krylov/Newton tolerances so solver truncation does not pollute the
    # Taylor remainders
    from thetis_tpu.solvers.newton import NewtonParameters
    options.swe_timestepper_options.solver_parameters = NewtonParameters(
        snes_rtol=1e-12, snes_atol=1e-13, snes_max_it=40,
        ksp_rtol=1e-12, ksp_max_it=200, gmres_restart=50,
        line_search=(stepper == "SteadyState"),
        dense=(stepper == "SteadyState"),
    )

    x, y = SpatialCoordinate(mesh2d)
    drag_func = Function(P1_2d, name="bottomdrag").interpolate(
        12.0 * exp(-(((x - lx / 2) ** 2 + (y - ly / 2) ** 2) / 20.0**2))
        + 0.0025
    )
    options.quadratic_drag_coefficient = drag_func
    solver_obj.bnd_functions["shallow_water"] = {
        1: {"un": Constant(-velocity_u)},
        2: {"elev": Constant(0.0)},
    }
    solver_obj.assign_initial_conditions(
        uv=jnp.asarray([velocity_u, 0.0]), elev=0.0
    )
    return solver_obj


@pytest.mark.parametrize("stepper", [
    pytest.param("CrankNicolson", marks=pytest.mark.slow),
    "SteadyState",
])
def test_gradient_from_adjoint(stepper):
    solver_obj = basic_setup(stepper)
    asm = solver_obj.asm
    n_steps = 1 if stepper == "SteadyState" else 4

    def functional(state):
        return asm.integrate(state["uv"][..., 0])

    forward = solver_obj.differentiable_forward(
        ["quadratic_drag_coefficient"],
        terminal_functional=functional,
        n_steps=n_steps,
    )
    rf = ReducedFunctional(forward, Control(
        solver_obj.options.quadratic_drag_coefficient
    ))
    rng = np.random.RandomState(42)
    c = jnp.asarray(rng.rand(solver_obj.mesh2d.nv))
    dc = jnp.asarray(rng.rand(solver_obj.mesh2d.nv))
    minconv = taylor_test(rf, c, dc, h0=5e-2)
    assert minconv > 1.90


@pytest.mark.slow
def test_gradient_wrt_initial_elevation():
    """Gradient w.r.t. the initial condition (the data-assimilation
    control)."""
    solver_obj = basic_setup("CrankNicolson")
    asm = solver_obj.asm

    def functional(state):
        return asm.norm_l2(state["elev"]) ** 2

    forward = solver_obj.differentiable_forward(
        ["initial_elev"], terminal_functional=functional, n_steps=3
    )
    elev0 = solver_obj.fields.elev_2d.data
    rf = ReducedFunctional(forward, Control(elev0))
    rng = np.random.RandomState(1)
    c = jnp.asarray(0.1 * rng.rand(*elev0.shape))
    dc = jnp.asarray(rng.rand(*elev0.shape))
    minconv = taylor_test(rf, c, dc, h0=1e-2)
    assert minconv > 1.90
