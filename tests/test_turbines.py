"""Tidal-turbine farm tests: drag effect on the flow, power functional,
discrete bump-density farms, and the farm-optimisation gradient
(miniature of ``examples/tidalfarm/tidalfarm.py``; the reference asserts a
Taylor rate > 1.95 there, ``tidalfarm.py:202``)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thetis_tpu import (
    RectangleMesh, FunctionSpace, Function, Constant, solver2d,
    SpatialCoordinate,
)
from thetis_tpu.model.turbines import (
    TidalTurbineFarmOptions,
    TidalTurbineOptions,
    TurbineFunctionalCallback,
    turbine_density_from_coordinates,
)
from thetis_tpu.adjoint import Control, ReducedFunctional, taylor_test


def farm_setup(density=0.01):
    lx, ly = 1000.0, 400.0
    mesh2d = RectangleMesh(20, 8, lx, ly)
    P1 = FunctionSpace(mesh2d, "CG", 1)
    bath = Function(P1).assign(40.0)
    so = solver2d.FlowSolver2d(mesh2d, bath)
    o = so.options
    o.timestep = 10.0
    o.simulation_export_time = 100.0
    o.simulation_end_time = 100.0
    o.no_exports = True
    o.swe_timestepper_type = "CrankNicolson"
    o.horizontal_viscosity = Constant(2.0)
    o.quadratic_drag_coefficient = Constant(0.0025)
    farm = TidalTurbineFarmOptions()
    farm.turbine_options = TidalTurbineOptions(
        diameter=18.0, thrust_coefficient=0.8
    )
    x, y = SpatialCoordinate(mesh2d)
    farm.turbine_density = Function(P1).interpolate(
        jnp.where(
            (jnp.abs(x - lx / 2) < 150.0) & (jnp.abs(y - ly / 2) < 100.0),
            density, 0.0,
        )
    )
    o.tidal_turbine_farms = {"everywhere": [farm]}
    so.bnd_functions["shallow_water"] = {
        1: {"un": Constant(-1.5)},
        2: {"elev": Constant(0.0)},
    }
    so.assign_initial_conditions(uv=jnp.asarray([1.5, 0.0]), elev=0.0)
    return so


@pytest.mark.slow
def test_farm_drag_creates_head_difference():
    """Turbine drag must set up a water-level drop across the farm."""
    heads = []
    for d in (0.0, 0.05):
        so = farm_setup(density=d)
        so.iterate()
        e = so.fields.elev_2d.data
        x = so.function_spaces.H_2d.dof_coords()[..., 0]
        up = float(jnp.mean(jnp.where(x < 200, e, 0)))
        dn = float(jnp.mean(jnp.where(x > 800, e, 0)))
        heads.append(up - dn)
    assert heads[1] > 10 * heads[0] > 0


@pytest.mark.slow
def test_power_callback():
    so = farm_setup(density=0.02)
    cb = TurbineFunctionalCallback(so, append_to_log=False)
    so.add_callback(cb, "timestep")
    so.iterate()
    assert cb.average_power[0] > 0.0
    assert cb.time_period == pytest.approx(100.0)
    nt = so.tidal_farms[0].number_of_turbines()
    # P1 interpolation of the indicator shrinks the support by ~ one cell
    assert 0.0 < nt < 0.02 * 300 * 200
    assert nt == pytest.approx(
        float(so.asm.integrate_cellq(so.tidal_farms[0].turbine_density_q)),
        rel=1e-12,
    )


def test_discrete_farm_density_integral():
    lx, ly = 1000.0, 400.0
    mesh2d = RectangleMesh(40, 16, lx, ly)
    P1 = FunctionSpace(mesh2d, "DG", 1)
    from thetis_tpu.fem.assembly import DGAssembler

    asm = DGAssembler(mesh2d, P1)
    coords = [[300.0, 200.0], [500.0, 200.0], [700.0, 200.0]]
    density = turbine_density_from_coordinates(asm, coords, radius=9.0)
    total = float(asm.integrate_cellq(density))
    # integral of each unit bump = 1 turbine (coarse quadrature on a sharp
    # bump -> loose tolerance)
    assert total == pytest.approx(3.0, rel=0.25)


@pytest.mark.slow
def test_farm_power_gradient():
    """Gradient of time-integrated farm power w.r.t. turbine density
    (the tidalfarm optimisation functional)."""
    so = farm_setup(density=0.01)
    so.initialize()
    asm = so.asm
    farm = so.tidal_farms[0]

    def power_step(state, fields, t):
        uv_q = asm.cell_values(state["uv"])
        eta_q = asm.cell_values(state["elev"])
        H_q = so.depth.total_depth(so.eq_sw.bathy_q, eta_q)
        p = farm.turbine.power(uv_q, H_q)
        return asm.integrate_cellq(p * fields["turbine_density_0"])

    forward = so.differentiable_forward(
        ["turbine_density_0"], step_functional=power_step, n_steps=4
    )
    d0 = so.options.tidal_turbine_farms["everywhere"][0].turbine_density
    rf = ReducedFunctional(forward, Control(d0), scale=-1e-6)
    minconv = taylor_test(rf, d0.data, 0.01 * jnp.ones_like(d0.data), h0=0.04)
    assert minconv > 1.90


def test_rotor_shear_averaging():
    """Power-law shear rotor averaging (ref ``turbines.py:60-84``): with
    the hub at z = beta*depth the cube-weighted average reduces to ~the
    hub speed; a lower hub sees slower flow, a floating (near-surface)
    hub faster."""
    import jax.numpy as jnp
    from thetis_tpu.model.turbines import (
        TidalTurbineOptions, ConstantThrustTurbine,
    )

    depth = jnp.full((5, 4), 40.0)
    uv = jnp.stack([jnp.full((5, 4), 2.0), jnp.zeros((5, 4))], axis=-1)

    def turbine(hub, structure="bottom-fixed"):
        o = TidalTurbineOptions(diameter=10.0, thrust_coefficient=0.8)
        o.apply_shear_profile = True
        o.rel_hub_height = hub
        o.structure_type = structure
        return ConstantThrustTurbine(o)

    t_hub = turbine(0.4 * 40.0)       # hub at beta*depth: u_eff ~ |uv|
    u_eff = t_hub.rotor_averaged_velocity(uv, depth)
    assert u_eff.shape == (5, 4)
    assert abs(float(u_eff[0, 0]) - 2.0) < 0.05

    t_low = turbine(8.0)
    u_low = float(t_low.rotor_averaged_velocity(uv, depth)[0, 0])
    assert u_low < 2.0

    t_float = turbine(6.0, "floating")  # hub 6 m below the surface
    u_float = float(t_float.rotor_averaged_velocity(uv, depth)[0, 0])
    assert u_float > u_low

    # power/friction use the effective speed and stay finite
    p = t_low.power(uv, depth)
    cd = t_low.friction_coefficient(uv, depth)
    assert jnp.isfinite(p).all() and jnp.isfinite(cd).all()
    p0 = turbine(0.4 * 40.0).power(uv, depth)
    assert float(p[0, 0]) < float(p0[0, 0])


def test_minimum_distance_constraints():
    """Pairwise distance constraints + analytic Jacobian
    (ref ``turbines.py:293-368``)."""
    from thetis_tpu.model.turbines import MinimumDistanceConstraints

    pos = [[0.0, 0.0], [100.0, 0.0], [0.0, 40.0]]
    mdc = MinimumDistanceConstraints(pos, minimum_distance=50.0)
    assert mdc.length() == 3
    m = np.asarray([x for xy in pos for x in xy])
    f = mdc.function(m)
    # pair (1,0): 100 apart -> positive; (2,0): 40 apart -> negative
    assert f[0] > 0 and f[1] < 0
    # finite-difference check of the Jacobian
    J = mdc.jacobian(m)
    eps = 1e-6
    for k in range(len(m)):
        mp = m.copy(); mp[k] += eps
        mm = m.copy(); mm[k] -= eps
        fd = (mdc.function(mp) - mdc.function(mm)) / (2 * eps)
        assert np.allclose(J[:, k], fd, atol=1e-4)


def test_load_turbine_file(tmp_path):
    """YAML/JSON turbine definition loader (ref ``turbines.py:371-419``)."""
    from thetis_tpu.model.turbines import load_turbine

    import json
    cfg = {
        "name": "test_turbine",
        "turbine_thrust_def": "table",
        "diameter": 20.0,
        "curves": {
            "speeds": [0.0, 1.0, 2.0, 3.0],
            "thrust": [0.0, 0.6, 0.8, 0.7],
            "power": [0.0, 0.3, 0.45, 0.4],
        },
        "support_structure": {
            "type": "monopile", "rel_hub_height": 0.5,
            "C_support": 0.7, "A_support": 25.0,
        },
        "upwind_correction": False,
    }
    jpath = tmp_path / "turbine.json"
    jpath.write_text(json.dumps(cfg))
    opts = load_turbine(str(jpath))
    assert opts.turbine_type == "table"
    assert opts.turbine_options.diameter == 20.0
    assert opts.turbine_options.thrust_speeds == [0.0, 1.0, 2.0, 3.0]
    assert opts.turbine_options.structure_type == "monopile"
    assert opts.turbine_options.C_support == 0.7
    assert opts.upwind_correction is False

    import yaml
    ypath = tmp_path / "turbine.yml"
    cfg2 = dict(cfg, turbine_thrust_def="constant",
                thrust_coefficient=0.75, power_coefficient=0.4)
    del cfg2["curves"]
    ypath.write_text(yaml.safe_dump(cfg2))
    opts2 = load_turbine(str(ypath), discrete=False)
    assert opts2.turbine_options.thrust_coefficient == 0.75
    assert opts2.turbine_type == "constant"
