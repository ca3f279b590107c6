"""Thacker wetting-drying parabolic-bowl test, following the reference's
``test/swe2d/test_thacker.py`` setup and error thresholds (a subset of the
stepper/resolution matrix to keep runtime down)."""
import numpy as np
import pytest

from thetis_tpu import (
    SquareMesh,
    FunctionSpace,
    Function,
    solver2d,
    SpatialCoordinate,
)
import jax.numpy as jnp


@pytest.mark.parametrize(
    "stepper,n,dt,max_err",
    [
        ("CrankNicolson", 10, 600.0, 0.26),
        ("DIRK22", 10, 600.0, 0.26),
        ("BackwardEuler", 10, 600.0, 0.33),
    ],
    ids=["CrankNicolson-coarse", "DIRK22-coarse", "BackwardEuler-coarse"],
)
def test_thacker(stepper, n, dt, max_err):
    l_mesh = 951646.46
    mesh2d = SquareMesh(n, n, l_mesh)

    D0 = 50.0
    L = 430620.0
    eta0 = 2.0
    A = ((D0 + eta0) ** 2 - D0**2) / ((D0 + eta0) ** 2 + D0**2)
    X0 = Y0 = l_mesh / 2

    P1 = FunctionSpace(mesh2d, "CG", 1)
    x, y = SpatialCoordinate(mesh2d)
    bathymetry = Function(P1, name="bathymetry").interpolate(
        D0 * (1 - ((x - X0) ** 2 + (y - Y0) ** 2) / L**2)
    )

    solverObj = solver2d.FlowSolver2d(mesh2d, bathymetry)
    options = solverObj.options
    options.timestep = dt
    options.simulation_end_time = 43200
    options.simulation_export_time = 3600.0
    options.no_exports = True
    options.swe_timestepper_type = stepper
    options.use_wetting_and_drying = True
    options.use_automatic_wetting_and_drying_alpha = True

    elev_init = D0 * (
        np.sqrt(1 - A * A) / (1 - A)
        - 1
        - ((x - X0) ** 2 + (y - Y0) ** 2) * ((1 + A) / (1 - A) - 1) / L**2
    )
    elev_fn = Function(P1).interpolate(elev_init)
    solverObj.assign_initial_conditions(elev=elev_fn)
    solverObj.iterate()

    # after one full cycle (T=43200 ~ period) elevation should return to the
    # initial profile; mask out dry areas like the reference (L81-86)
    H_2d = solverObj.function_spaces.H_2d
    xd, yd = SpatialCoordinate(H_2d)
    r = jnp.sqrt((xd - X0) ** 2 + (yd - Y0) ** 2)
    mask = 0.5 * (1 - jnp.tanh((r - 420000.0) / 1000.0))
    correct = mask * Function(H_2d).interpolate(
        lambda xx, yy: D0
        * (
            np.sqrt(1 - A * A) / (1 - A)
            - 1
            - ((xx - X0) ** 2 + (yy - Y0) ** 2) * ((1 + A) / (1 - A) - 1) / L**2
        )
    ).data
    eta = mask * solverObj.fields.elev_2d.data
    l2_err = float(solverObj.asm.norm_l2(eta - correct)) / l_mesh
    print(f"{stepper} elev L2 error {l2_err:.6f}")
    assert l2_err < max_err
    assert np.isfinite(l2_err)
