"""Mode-split dt control (ref ``solver.py:371-398``): ``dt_mode``,
``timestep_2d``/``M_modesplit`` subcycling and the ``cfl_2d``/``cfl_3d``
traits.  The reference provisions the 'split' machinery but leaves the
coupled path NotImplemented (``coupled_timeintegrator.py:364``); here
the explicit SSPRK33 subcycled 2D mode actually runs, and on a
barotropic wave test it must reproduce the implicit-2D-mode solution.
"""
import numpy as np
import pytest

from thetis_tpu import RectangleMesh, FunctionSpace, Function
from thetis_tpu.model.flowsolver3d import FlowSolver


def _solver(dt_mode, lx=20e3, depth=20.0, **opts):
    mesh2d = RectangleMesh(12, 2, lx, 4e3)
    P1 = FunctionSpace(mesh2d, "CG", 1)
    bath = Function(P1).assign(depth)
    so = FlowSolver(mesh2d, bath, 4)
    o = so.options
    o.timestep = 60.0
    o.timestep_2d = 10.0
    o.dt_mode = dt_mode
    o.simulation_export_time = 600.0
    o.simulation_end_time = 600.0
    o.no_exports = True
    o.solve_salinity = False
    o.solve_temperature = False
    o.use_baroclinic_formulation = False
    o.use_implicit_vertical_diffusion = False
    o.use_bottom_friction = False
    o.horizontal_viscosity = 1.0
    for k, v in opts.items():
        setattr(o, k, v)
    elev0 = Function(P1).interpolate(
        lambda x, y: 0.3 * np.exp(-(((x - lx / 2) / 3e3) ** 2)))
    so.assign_initial_conditions(elev=elev0)
    return so


def test_modesplit_ratio():
    """M_modesplit = ceil(dt / timestep_2d) and dt_2d divides dt
    (ref ``solver.py:375-377``)."""
    so = _solver("split")
    assert so.M_modesplit == 6
    np.testing.assert_allclose(so.dt_2d * so.M_modesplit, so.dt, rtol=1e-12)
    so3 = _solver("3d")
    assert so3.M_modesplit == 1 and so3.dt_2d == so3.dt


def test_dt_mode_2d():
    """dt_mode='2d' with automatic timestep: single dt bounded by
    min(2D, 3D) CFL limits and fitted to the export interval (ref
    ``solver.py:378-382``; the implicit CN 2D mode has cfl_coeff_2d =
    inf, so the 3D advective bound governs here)."""
    so = _solver("2d", use_automatic_timestep=True,
                 horizontal_velocity_scale=1.0)
    max_dt_3d = min(so.compute_dt_h_advection(1.0),
                    so.compute_dt_v_advection(1e-4),
                    so.compute_dt_diffusion(
                        so.options.horizontal_viscosity_scale))
    assert so.dt <= max_dt_3d * 1.0001
    assert so.M_modesplit == 1 and so.dt_2d == so.dt


@pytest.mark.slow
def test_split_matches_implicit_barotropic():
    """A barotropic gravity wave stepped with the subcycled explicit 2D
    mode must match the implicit (dt_mode='3d') solution."""
    so_i = _solver("3d")
    so_s = _solver("split")
    so_i.iterate()
    so_s.iterate()
    e_i = np.asarray(so_i.fields.elev_2d.data)
    e_s = np.asarray(so_s.fields.elev_2d.data)
    scale = np.abs(e_i).max()
    # CN(theta=0.5) vs SSPRK33 subcycling: same physics, O(dt^2)
    # integrator difference
    assert np.abs(e_s - e_i).max() < 0.1 * scale, (
        np.abs(e_s - e_i).max(), scale)
    assert np.isfinite(np.asarray(so_s.fields.uv_3d.data)).all()
