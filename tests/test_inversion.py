"""Twin-experiment inversion test (miniature of
``examples/channel_inversion``): generate synthetic station observations
with a known Manning friction field, then invert it from a wrong initial
guess.  Asserts the cost drops by >10x, the recovered control moves toward
the truth, and the gradient passes consistency + Taylor tests (the
reference requires Taylor rate > 1.9)."""
import pytest as _pytest

#: long-running integration tier: run with `pytest -m slow`
pytestmark = _pytest.mark.slow

import numpy as np
import jax.numpy as jnp
import pytest

from thetis_tpu import (
    RectangleMesh,
    FunctionSpace,
    Function,
    Constant,
    solver2d,
)
from thetis_tpu.adjoint.inversion_tools import (
    StationObservationManager,
    InversionManager,
    GradientRegularizationCalculator,
)


def make_solver(manning_value):
    lx, ly = 5e3, 1e3
    mesh2d = RectangleMesh(16, 4, lx, ly)
    P1 = FunctionSpace(mesh2d, "CG", 1)
    bath = Function(P1).assign(20.0)
    so = solver2d.FlowSolver2d(mesh2d, bath)
    o = so.options
    o.timestep = 20.0
    o.simulation_export_time = 400.0
    o.simulation_end_time = 400.0
    o.no_exports = True
    o.swe_timestepper_type = "CrankNicolson"
    o.manning_drag_coefficient = Function(P1, data=jnp.broadcast_to(
        jnp.asarray(manning_value), (mesh2d.nv,)
    ).astype(jnp.float64) if np.isscalar(manning_value)
        else jnp.asarray(manning_value))
    so.bnd_functions["shallow_water"] = {
        1: {"un": Constant(-0.5)},
        2: {"elev": Constant(0.0)},
    }
    so.assign_initial_conditions(uv=jnp.asarray([0.5, 0.0]), elev=0.0)
    return so


STATIONS = dict(
    names=["stationA", "stationB", "stationC"],
    x=[1000.0, 2500.0, 4000.0],
    y=[500.0, 500.0, 500.0],
)
N_STEPS = 20
TRUE_MANNING = 0.05


def generate_observations():
    """Run the 'truth' model and record station elevations."""
    so = make_solver(TRUE_MANNING)
    sta = StationObservationManager(so)
    samples = {n: [] for n in STATIONS["names"]}
    times = []
    sta_tmp = StationObservationManager(so)
    sta_tmp._xy = list(zip(STATIONS["x"], STATIONS["y"]))
    sta_tmp.construct_evaluator()
    state = so._get_state()
    fields = so._gather_swe_fields()
    bnd = so._gather_bnd("shallow_water")
    import jax

    step = jax.jit(lambda s: so._advance(0.0, s, fields, {}, bnd, {}))
    for i in range(N_STEPS):
        state = step(state)
        vals = np.asarray(sta_tmp.sample(state))
        times.append((i + 1) * so.dt)
        for n, v in zip(STATIONS["names"], vals):
            samples[n].append(float(v))
    return times, samples


@pytest.fixture(scope="module")
def observations():
    return generate_observations()


def build_inversion(observations, manning0):
    times, samples = observations
    so = make_solver(manning0)
    sta = StationObservationManager(so)
    sta.register_observation_data(
        STATIONS["names"], "elev",
        [times] * 3,
        [samples[n] for n in STATIONS["names"]],
        STATIONS["x"], STATIONS["y"],
    )
    sta.construct_evaluator()
    im = InversionManager(sta, real_cost_function_scaling=1.0)
    reg = GradientRegularizationCalculator(so.asm, gamma=1e-4)
    im.add_control(
        "manning_drag_coefficient",
        so.options.manning_drag_coefficient,
        regularization=reg,
    )
    return so, im


def test_inversion_recovers_manning(observations, tmp_path):
    so, im = build_inversion(observations, manning0=0.02)
    rf = im.get_reduced_functional(N_STEPS)
    im.output_dir = str(tmp_path)
    J0 = rf()
    im.consistency_test()
    result = im.minimize(maxiter=12, ftol=1e-12, gtol=1e-12)
    J1 = rf([result])
    print(f"J: {J0:.4e} -> {J1:.4e}")
    assert J1 < 0.1 * J0, "cost did not decrease sufficiently"
    recovered = float(np.mean(np.asarray(result)))
    assert abs(recovered - TRUE_MANNING) < abs(0.02 - TRUE_MANNING) * 0.5, (
        f"recovered Manning {recovered} not closer to truth {TRUE_MANNING}"
    )


def test_inversion_taylor(observations):
    so, im = build_inversion(observations, manning0=0.03)
    im.get_reduced_functional(N_STEPS)
    rate = im.taylor_test(h0=5e-2)
    assert rate > 1.9
