"""3D baroclinic solver tests (miniatures of the reference's
``test/solver3d`` suite and the lockExchange example):

- barotropic consistency: with uniform density the 3D run's elevation
  matches a pure-2D run, and the deviation velocity stays negligible
- tracer consistency: uniform T/S stay uniform through the full coupled
  step (advection + vertical mixing + coupling)
- lock exchange: a density front collapses in the right direction with
  bounded energy
"""

import numpy as np
import jax.numpy as jnp
import pytest

from thetis_tpu import RectangleMesh, FunctionSpace, Function, solver2d
from thetis_tpu.model.flowsolver3d import FlowSolver


def make_solver3d(nx=12, nz=6, lx=20e3, depth=20.0, **opts):
    mesh2d = RectangleMesh(nx, 2, lx, 4e3)
    P1 = FunctionSpace(mesh2d, "CG", 1)
    bath = Function(P1).assign(depth)
    so = FlowSolver(mesh2d, bath, nz)
    o = so.options
    o.timestep = 30.0
    o.simulation_export_time = 300.0
    o.simulation_end_time = 300.0
    o.no_exports = True
    o.horizontal_viscosity = 1.0
    o.horizontal_diffusivity = 1.0
    for k, v in opts.items():
        setattr(o, k, v)
    return so


@pytest.mark.slow
def test_barotropic_consistency():
    """Uniform density: 3D elevation evolution matches the 2D-only model;
    deviation velocity stays ~0."""
    lx, depth = 20e3, 20.0
    so3 = make_solver3d(use_baroclinic_formulation=False,
                        use_implicit_vertical_diffusion=False,
                        use_bottom_friction=False)
    mesh2d = so3.mesh2d
    P1 = FunctionSpace(mesh2d, "CG", 1)
    elev0 = Function(P1).interpolate(
        lambda x, y: 0.5 * np.exp(-(((x - lx / 2) / 3e3) ** 2))
    )
    so3.assign_initial_conditions(elev=elev0)
    so3.iterate()

    so2 = solver2d.FlowSolver2d(mesh2d, Function(P1).assign(depth))
    o2 = so2.options
    o2.timestep = 30.0
    o2.simulation_export_time = 300.0
    o2.simulation_end_time = 300.0
    o2.no_exports = True
    o2.swe_timestepper_type = "CrankNicolson"
    o2.swe_timestepper_options.use_semi_implicit_linearization = True
    o2.horizontal_viscosity = 1.0
    so2.assign_initial_conditions(elev=elev0)
    so2.iterate()

    e3 = np.asarray(so3.fields.elev_2d.data)
    e2 = np.asarray(so2.fields.elev_2d.data)
    scale = np.abs(e2).max()
    assert np.abs(e3 - e2).max() < 0.15 * scale, (
        f"3D vs 2D elevation mismatch {np.abs(e3-e2).max()} vs scale {scale}"
    )
    # deviation velocity negligible vs the barotropic velocity
    u2 = np.abs(np.asarray(so3.fields.uv_2d.data)).max()
    u3dev = np.abs(np.asarray(so3.fields.uv_3d.data)).max()
    # splitting error O(dt) between the 2D CN mode and the explicit 3D
    # stage leaves a small spurious deviation
    assert u3dev < 0.25 * u2 + 1e-8


def test_tracer_consistency_coupled():
    """Uniform T/S stay uniform through the full coupled step."""
    so = make_solver3d()
    P1 = FunctionSpace(so.mesh2d, "CG", 1)
    elev0 = Function(P1).interpolate(
        lambda x, y: 0.3 * np.exp(-(((x - 10e3) / 3e3) ** 2))
    )
    so.assign_initial_conditions(elev=elev0, salt=35.0, temp=10.0)
    so.iterate()
    s = np.asarray(so.fields.salt_3d.data)
    t = np.asarray(so.fields.temp_3d.data)
    # exact by construction: the ALE stage subtracts the uniform-field
    # drift (consistency correction), so uniform tracers stay uniform to
    # machine precision on the moving mesh
    assert np.abs(s - 35.0).max() < 1e-9
    assert np.abs(t - 10.0).max() < 1e-9
    assert np.isfinite(np.asarray(so.fields.uv_3d.data)).all()


@pytest.mark.slow
def test_lock_exchange():
    """Temperature front collapses: bottom flow toward the warm side,
    surface flow toward the cold side, fields stay bounded
    (``examples/lockExchange`` in miniature)."""
    so = make_solver3d(nx=16, nz=8, lx=8e3, depth=20.0)
    so.options.timestep = 20.0
    so.options.simulation_export_time = 200.0
    so.options.simulation_end_time = 600.0
    mesh2d = so.mesh2d

    def temp_ic(x, y):
        return 5.0 * np.tanh((x - 4e3) / 400.0)  # cold left, warm right

    V = FunctionSpace(mesh2d, "DG", 1)
    t2d = Function(V).interpolate(temp_ic)
    so.assign_initial_conditions(temp=t2d.data, salt=35.0)
    so.iterate()

    uv3 = np.asarray(so.fields.uv_3d.data)  # deviation velocity
    temp = np.asarray(so.fields.temp_3d.data)
    assert np.isfinite(uv3).all() and np.isfinite(temp).all()
    # deviation velocity: near the front, bottom moves toward +x (warm),
    # surface toward -x
    xy = V.dof_coords()
    x = np.asarray(xy[..., 0])
    front = np.abs(x - 4e3) < 2e3
    u_bot = uv3[:, :, 0, 0, 0][front]
    u_top = uv3[:, :, -1, 1, 0][front]
    assert u_bot.mean() > 0, "bottom gravity current should flow to +x"
    assert u_top.mean() < 0, "surface return flow should be to -x"
    # temperature near initial bounds (limiterless DG overshoots on the
    # sharp front but stays bounded)
    assert temp.min() > -7.0 and temp.max() < 7.0
    # vertical velocity developed
    w = np.asarray(so.fields.w_3d.data)
    assert np.abs(w).max() > 1e-7


def test_hcc_metric():
    """HCC metric: zero for flat bathymetry, grows with bathymetry slope
    (ref ``utility3d.py:376-470``)."""
    from thetis_tpu.equations.utility3d import Mesh3DConsistencyCalculator

    so = make_solver3d()
    so.assign_initial_conditions()
    hcc = Mesh3DConsistencyCalculator(so).solve()
    assert float(jnp.abs(hcc).max()) < 1e-10  # straight prisms

    # sloped bathymetry: R = |grad h| dx / dz > 0
    mesh2d = RectangleMesh(12, 2, 20e3, 4e3)
    P1 = FunctionSpace(mesh2d, "CG", 1)
    bath = Function(P1).interpolate(lambda x, y: 10.0 + 8.0 * x / 20e3)
    so2 = FlowSolver(mesh2d, bath, 6)
    so2.options.timestep = 30.0
    so2.options.simulation_export_time = 300.0
    so2.options.simulation_end_time = 300.0
    so2.options.no_exports = True
    so2.assign_initial_conditions()
    hcc2 = Mesh3DConsistencyCalculator(so2).solve()
    assert float(hcc2.max()) > 0.01
    assert jnp.isfinite(hcc2).all()


@pytest.mark.slow
def test_ssprk22_ale_two_stage():
    """SSPRK22 two-stage ALE integrator (ref CoupledTwoStageRK /
    SSPRK22ALE): machine-exact uniform-tracer consistency and stable
    lock-exchange physics."""
    so = make_solver3d(timestepper_type="SSPRK22")
    P1 = FunctionSpace(so.mesh2d, "CG", 1)
    elev0 = Function(P1).interpolate(
        lambda x, y: 0.3 * np.exp(-(((x - 10e3) / 3e3) ** 2))
    )
    so.assign_initial_conditions(elev=elev0, salt=35.0, temp=10.0)
    so.iterate()
    assert np.abs(np.asarray(so.fields.salt_3d.data) - 35.0).max() < 1e-9
    assert np.abs(np.asarray(so.fields.temp_3d.data) - 10.0).max() < 1e-9

    so2 = make_solver3d(nx=16, nz=8, lx=8e3, timestepper_type="SSPRK22")
    so2.options.timestep = 20.0
    so2.options.simulation_export_time = 200.0
    so2.options.simulation_end_time = 400.0
    V = FunctionSpace(so2.mesh2d, "DG", 1)
    t2d = Function(V).interpolate(lambda x, y: 5.0 * np.tanh((x - 4e3) / 400.0))
    so2.assign_initial_conditions(temp=t2d.data, salt=35.0)
    so2.iterate()
    uv3 = np.asarray(so2.fields.uv_3d.data)
    temp = np.asarray(so2.fields.temp_3d.data)
    assert np.isfinite(uv3).all() and np.isfinite(temp).all()
    xy = V.dof_coords()
    x = np.asarray(xy[..., 0])
    front = np.abs(x - 4e3) < 2e3
    assert uv3[:, :, 0, 0, 0][front].mean() > 0


@pytest.mark.slow
def test_leapfrog_am3():
    """LeapFrogAM3 ALE integrator (ref ``timeintegrator.py:467-607``):
    machine-exact uniform-tracer consistency and correct lock-exchange
    physics."""
    so = make_solver3d(timestepper_type="LeapFrogAM3")
    P1 = FunctionSpace(so.mesh2d, "CG", 1)
    elev0 = Function(P1).interpolate(
        lambda x, y: 0.3 * np.exp(-(((x - 10e3) / 3e3) ** 2))
    )
    so.assign_initial_conditions(elev=elev0, salt=35.0, temp=10.0)
    so.iterate()
    assert np.abs(np.asarray(so.fields.salt_3d.data) - 35.0).max() < 1e-9
    assert np.abs(np.asarray(so.fields.temp_3d.data) - 10.0).max() < 1e-9

    so2 = make_solver3d(nx=16, nz=8, lx=8e3, timestepper_type="LeapFrogAM3")
    so2.options.timestep = 20.0
    so2.options.simulation_export_time = 200.0
    so2.options.simulation_end_time = 400.0
    V = FunctionSpace(so2.mesh2d, "DG", 1)
    t2d = Function(V).interpolate(lambda x, y: 5.0 * np.tanh((x - 4e3) / 400.0))
    so2.assign_initial_conditions(temp=t2d.data, salt=35.0)
    so2.iterate()
    uv3 = np.asarray(so2.fields.uv_3d.data)
    temp = np.asarray(so2.fields.temp_3d.data)
    assert np.isfinite(uv3).all() and np.isfinite(temp).all()
    xy = V.dof_coords()
    x = np.asarray(xy[..., 0])
    front = np.abs(x - 4e3) < 2e3
    assert uv3[:, :, 0, 0, 0][front].mean() > 0


def test_3d_callbacks(tmp_path):
    """VerticalProfile/Transect/Accumulator callbacks attached to the 3D
    solver (ref ``callback.py:588-1107``)."""
    from thetis_tpu.model.callback import (
        VerticalProfileCallback, TransectCallback, AccumulatorCallback,
    )

    so = make_solver3d(nx=8, nz=4)
    so.options.output_directory = str(tmp_path)
    V = FunctionSpace(so.mesh2d, "DG", 1)
    t2d = Function(V).interpolate(lambda x, y: 10.0 + 2.0 * x / 20e3)
    so.assign_initial_conditions(temp=t2d.data, salt=35.0)

    prof_cb = VerticalProfileCallback(
        so, ["temp_3d", "uv_3d"], 10e3, 2e3, "midpoint",
        export_to_hdf5=True, append_to_log=False)
    trans_cb = TransectCallback(
        so, ["salt_3d"], [5e3, 10e3, 15e3], [2e3, 2e3, 2e3], "axis",
        export_to_hdf5=True, append_to_log=False)
    acc_cb = AccumulatorCallback(
        lambda: float(np.asarray(so.fields.elev_2d.data).max()), so)
    so.add_callback(prof_cb)
    so.add_callback(trans_cb)
    so.add_callback(acc_cb)
    so.iterate()

    vals = prof_cb()
    z, temp, uv = vals
    assert len(z) == so.n_layers + 1
    assert z[0] == pytest.approx(-20.0, abs=0.5) and z[-1] > -1.0
    assert abs(temp.mean() - 11.0) < 1.5  # linear profile mean ~ 11 at x=10e3
    tvals = trans_cb()
    assert len(tvals[0]) == 3 * (so.n_layers + 1)
    assert np.allclose(tvals[1], 35.0, atol=1e-6)
    assert acc_cb.get_val() != 0.0 or acc_cb.old_value is not None
    # hdf5 diagnostics written
    import glob
    assert glob.glob(str(tmp_path / "diagnostic_vertprofile*.hdf5"))
    assert glob.glob(str(tmp_path / "diagnostic_transect*.hdf5"))


def test_density_weak_and_velocity_magnitude():
    """DensitySolverWeak matches the pointwise solver for the linear EOS;
    VelocityMagnitudeSolver clips at min_val (ref ``utility3d.py:
    271-380``)."""
    from thetis_tpu.equations.utility3d import (
        DensitySolver, DensitySolverWeak, VelocityMagnitudeSolver,
    )
    from thetis_tpu.equations.eos import LinearEquationOfState

    so = make_solver3d(nx=6, nz=3)
    so.assign_initial_conditions(salt=34.0, temp=12.0)
    so.initialize()
    geom = so.asm3d.layer_geometry(
        so.extruded.z_interfaces(so.bathy_cell, so.fields.elev_2d.data)
    )
    eos = LinearEquationOfState()
    rho_pt = DensitySolver(eos).solve(so.fields.salt_3d.data,
                                      so.fields.temp_3d.data)
    rho_wk = DensitySolverWeak(so.asm3d, eos).solve(
        so.fields.salt_3d.data, so.fields.temp_3d.data, geom)
    assert np.allclose(np.asarray(rho_pt), np.asarray(rho_wk), atol=1e-8)

    vms = VelocityMagnitudeSolver(so.asm3d, min_val=1e-3)
    uv = jnp.full(so.shape3 + (2,), 0.0)
    mag = vms.solve(geom, uv=uv, w=None)
    assert float(jnp.abs(mag - 1e-3).max()) < 1e-12  # clipped at min_val
    uv3 = uv.at[...].set(jnp.asarray([3.0, 4.0]))
    mag2 = vms.solve(geom, uv=uv3)
    assert float(jnp.abs(mag2 - 5.0).max()) < 1e-8


def test_3d_time_step_control():
    """CFL time-step bounds + automatic dt fitted to the export interval
    (ref ``solver.py:164-405``)."""
    so = make_solver3d(nx=12, nz=6)
    o = so.options
    o.use_automatic_timestep = True
    o.horizontal_velocity_scale = 1.0
    o.vertical_velocity_scale = 1e-3
    o.horizontal_viscosity_scale = 1.0
    so.create_fields()
    so.initialize()
    # bounds are positive and ordering sensible
    assert so.compute_dt_2d(1.0) < so.compute_dt_h_advection(1.0)
    assert so.compute_dt_v_advection(1e-3) > 0
    assert so.compute_dt_diffusion(1.0) > 0
    # dt divides the export interval exactly
    n = o.simulation_export_time / so.dt
    assert abs(n - round(n)) < 1e-9
    assert so.dt > 0


def test_limiter3d():
    """Prism vertex-based limiter (ref ``limiter.py:48-222``): uniform
    and linear-in-z fields pass through (surface/bottom mean relaxation),
    an oscillatory overshoot is clipped, element means are conserved."""
    from thetis_tpu.equations.limiter import VertexBasedP1DGLimiter3D

    mesh2d = RectangleMesh(6, 3, 6e3, 3e3)
    nz = 5
    lim = VertexBasedP1DGLimiter3D(mesh2d, nz)

    # uniform: untouched
    u = jnp.full((mesh2d.nc, 3, nz, 2), 3.3)
    np.testing.assert_allclose(np.asarray(lim.apply(u)), 3.3)

    # linear in z (horizontally uniform): surface/bottom relaxation keeps
    # the monotone profile intact
    z = np.linspace(0.0, 1.0, nz + 1)
    prof = np.stack([z[:-1], z[1:]], axis=-1)        # (nz, 2)
    u2 = jnp.broadcast_to(jnp.asarray(prof)[None, None],
                          (mesh2d.nc, 3, nz, 2))
    out2 = np.asarray(lim.apply(u2))
    np.testing.assert_allclose(out2, np.asarray(u2), atol=1e-12)

    # single-element spike: overshoot limited toward neighbour means,
    # element means conserved
    u3 = np.zeros((mesh2d.nc, 3, nz, 2))
    u3[4, 1, 2, 1] = 6.0   # big nodal overshoot
    u3[4, 0, 2, 0] = -6.0
    out3 = np.asarray(lim.apply(jnp.asarray(u3)))
    np.testing.assert_allclose(out3.mean(axis=(1, 3)),
                               u3.mean(axis=(1, 3)), atol=1e-12)
    assert out3.max() < u3.max() - 1.0, "overshoot not limited"
