# Channel friction/bathymetry inversion (twin experiment)
# ========================================================
#
# Port of the reference's ``examples/channel_inversion/inverse_problem.py``
# (+ ``forward_run.py`` in one file): run a "truth" tidal channel with a
# known Manning friction field to synthesise station elevation records,
# then invert the friction from a wrong first guess with the adjoint
# gradient and L-BFGS-B, through the InversionManager toolkit.
import os

import numpy as np
import jax
import jax.numpy as jnp

from thetis_tpu import (
    RectangleMesh, FunctionSpace, Function, Constant, solver2d, print_output,
)
from thetis_tpu.adjoint.inversion_tools import (
    StationObservationManager,
    InversionManager,
    GradientRegularizationCalculator,
)

lx, ly = 20e3, 2e3
NX, NY = 32, 4
TRUE_MANNING = 0.05
FIRST_GUESS = 0.02
N_STEPS = 20 if os.environ.get("THETIS_REGRESSION_TEST") else 60
MAXITER = 8 if os.environ.get("THETIS_REGRESSION_TEST") else 25

STATIONS = dict(
    names=["stationA", "stationB", "stationC", "stationD"],
    x=[2.5e3, 7.5e3, 12.5e3, 17.5e3],
    y=[1e3, 1e3, 1e3, 1e3],
)


def make_solver(manning):
    mesh2d = RectangleMesh(NX, NY, lx, ly)
    P1 = FunctionSpace(mesh2d, "CG", 1)
    bath = Function(P1).assign(20.0)
    so = solver2d.FlowSolver2d(mesh2d, bath)
    o = so.options
    o.timestep = 30.0
    o.simulation_export_time = 30.0 * N_STEPS
    o.simulation_end_time = 30.0 * N_STEPS
    o.no_exports = True
    o.swe_timestepper_type = "CrankNicolson"
    m = (jnp.full((mesh2d.nv,), float(manning))
         if np.isscalar(manning) else jnp.asarray(manning))
    o.manning_drag_coefficient = Function(P1, data=m)
    so.bnd_functions["shallow_water"] = {
        1: {"un": Constant(-0.5)},
        2: {"elev": Constant(0.0)},
    }
    so.assign_initial_conditions(uv=jnp.asarray([0.5, 0.0]), elev=0.0)
    return so


def forward_run():
    """Generate the synthetic station observations ('forward_run.py')."""
    so = make_solver(TRUE_MANNING)
    sta = StationObservationManager(so)
    sta._xy = list(zip(STATIONS["x"], STATIONS["y"]))
    sta.construct_evaluator()
    state = so._get_state()
    fields = so._gather_swe_fields()
    bnd = so._gather_bnd("shallow_water")
    step = jax.jit(lambda s: so._advance(0.0, s, fields, {}, bnd, {}))
    times, samples = [], {n: [] for n in STATIONS["names"]}
    for i in range(N_STEPS):
        state = step(state)
        vals = np.asarray(sta.sample(state))
        times.append((i + 1) * so.dt)
        for n, v in zip(STATIONS["names"], vals):
            samples[n].append(float(v))
    return times, samples


def inverse_problem(times, samples):
    so = make_solver(FIRST_GUESS)
    sta = StationObservationManager(so)
    sta.register_observation_data(
        STATIONS["names"], "elev",
        [times] * len(STATIONS["names"]),
        [samples[n] for n in STATIONS["names"]],
        STATIONS["x"], STATIONS["y"],
    )
    sta.construct_evaluator()
    im = InversionManager(sta, real_cost_function_scaling=1.0)
    reg = GradientRegularizationCalculator(so.asm, gamma=1e-4)
    im.add_control("manning_drag_coefficient",
                   so.options.manning_drag_coefficient,
                   regularization=reg)
    rf = im.get_reduced_functional(N_STEPS)
    J0 = rf()
    result = im.minimize(maxiter=MAXITER, ftol=1e-14, gtol=1e-14)
    J1 = rf([result])
    print_output(f"cost functional: {J0:.4e} -> {J1:.4e}")
    recovered = float(np.mean(np.asarray(result)))
    print_output(f"recovered Manning: {recovered:.4f} "
                 f"(truth {TRUE_MANNING}, first guess {FIRST_GUESS})")
    return J0, J1, recovered


if __name__ == "__main__":
    times, samples = forward_run()
    J0, J1, recovered = inverse_problem(times, samples)
    assert J1 < 0.1 * J0
    assert abs(recovered - TRUE_MANNING) < abs(FIRST_GUESS - TRUE_MANNING)
