"""Williamson et al. (1992) test case 2 on the sphere: steady nonlinear
zonal geostrophic flow (the reference's ``test/sphere/test_williamson.py``,
which requires the rt-dg family on manifold meshes).

The icosahedral SphereMesh + RT1 x P0 pair must hold the steady state:
after one day the elevation error relative to the analytic balance stays
small and decreases under refinement; total volume is conserved exactly.
"""
import pytest as _pytest

#: long-running integration tier: run with `pytest -m slow`
pytestmark = _pytest.mark.slow

import math

import numpy as np
import jax.numpy as jnp
import pytest
from types import SimpleNamespace

from thetis_tpu.mesh.sphere import IcosahedralSphereMesh
from thetis_tpu.fem.rt import RTSpace
from thetis_tpu.equations.shallowwater_rtdg import ShallowWaterEquationsRTDG
from thetis_tpu.timeintegration.steppers import CrankNicolson
from thetis_tpu.solvers.newton import NewtonParameters

R_EARTH = 6371220.0
OMEGA = 7.292e-5
G = 9.81


class _QuadShim:
    """Minimal quadrature provider for RTSpace on manifold meshes (the
    planar DGAssembler computes 2D geometry it cannot have here)."""

    def __init__(self):
        from thetis_tpu.fem.reference_element import ELEMENTS

        self.space = SimpleNamespace(
            _tab_np=ELEMENTS[("DG", 1)].tabulate(3)
        )


def setup(refinement):
    mesh = IcosahedralSphereMesh(R_EARTH, refinement)
    rt = RTSpace(mesh, _QuadShim())
    opts = SimpleNamespace(use_nonlinear_equations=True,
                           use_wetting_and_drying=False)
    u0 = 2 * np.pi * R_EARTH / (12.0 * 86400.0)
    gh0 = 2.94e4
    h0 = gh0 / G

    eq = ShallowWaterEquationsRTDG(mesh, rt.asm, rt, opts, h0,
                                   bnd_conditions={})
    # analytic steady state
    xyz = mesh.coords_np
    cent = mesh.cell_midpoints()
    sin_lat_c = cent[:, 2] / np.linalg.norm(cent, axis=1)
    amp = (R_EARTH * OMEGA * u0 + 0.5 * u0**2) / G
    eta0 = (-amp * sin_lat_c**2)[:, None]
    # zonal velocity u = u0/R * (-y, x, 0) at the vertices (CG1)
    uvec = (u0 / R_EARTH) * np.stack(
        [-xyz[:, 1], xyz[:, 0], np.zeros(mesh.nv)], axis=-1
    )
    U0 = rt.project_vector(jnp.asarray(uvec))
    cor = 2.0 * OMEGA * xyz[:, 2] / R_EARTH  # CG1 f = 2 Omega sin(lat)
    fields = {"coriolis": jnp.asarray(cor)}
    return mesh, rt, eq, jnp.asarray(eta0), U0, fields, amp


def run_day(refinement, dt=900.0, hours=24.0):
    import jax
    from functools import partial

    mesh, rt, eq, eta0, U0, fields, amp = setup(refinement)
    stepper = CrankNicolson(
        eq, dt, semi_implicit=True,
        solver_parameters=NewtonParameters(ksp_rtol=1e-9, ksp_max_it=96,
                                           gmres_restart=24),
    )

    @partial(jax.jit, static_argnames=("n",))
    def advance_n(s, n):
        return jax.lax.scan(
            lambda c, _: (stepper.advance(0.0, c, fields, fields, {}), None),
            s, None, length=n)[0]

    state = {"uv": U0, "elev": eta0}
    n = int(round(hours * 3600.0 / dt))
    area = np.asarray(mesh.cell_area_np)
    vol0 = float((area * np.asarray(state["elev"][:, 0])).sum())
    state = advance_n(state, n)
    vol1 = float((area * np.asarray(state["elev"][:, 0])).sum())
    err = np.asarray(state["elev"][:, 0] - eta0[:, 0])
    l2 = math.sqrt(float((area * err**2).sum()) / area.sum())
    rel = l2 / amp
    du = np.asarray(state["uv"] - U0)
    u_rel = float(np.abs(du).max()) / float(np.abs(np.asarray(U0)).max())
    return rel, u_rel, abs(vol1 - vol0) / (area.sum())


def test_williamson2_steady_state():
    # measured ladder (1 day, CN dt=900): refinement 3/4/5 ->
    # 0.095 / 0.052 / 0.027 relative elevation error (order ~0.9 for the
    # lowest-order pair on the faceted sphere); volume exact
    rel3, urel3, dvol3 = run_day(3)
    print(f"W2 ref3: elev rel err {rel3:.4f}, u rel {urel3:.4f}")
    assert dvol3 < 1e-10, "volume not conserved"
    assert rel3 < 0.12, f"steady state lost at refinement 3: {rel3}"
    rel4, urel4, _ = run_day(4)
    print(f"W2 ref4: elev rel err {rel4:.4f}, u rel {urel4:.4f}")
    assert rel4 < 0.65 * rel3, (rel3, rel4)


def _setup_facade(refinement, family="rt-dg", dt=900.0, hours=6.0):
    """Williamson-2 through the FlowSolver2d facade as a user script
    would run it (the reference's ``test/sphere/test_williamson.py``
    drives ``solver2d.FlowSolver2d`` with an H(div) family)."""
    import jax.numpy as jnp
    from thetis_tpu.model.flowsolver2d import FlowSolver2d

    mesh = IcosahedralSphereMesh(R_EARTH, refinement)
    u0 = 2 * np.pi * R_EARTH / (12.0 * 86400.0)
    h0 = 2.94e4 / G
    s = FlowSolver2d(mesh, jnp.asarray(h0))
    o = s.options
    o.element_family = family
    o.polynomial_degree = 0
    o.swe_timestepper_type = "CrankNicolson"
    o.swe_timestepper_options.use_semi_implicit_linearization = True
    o.swe_timestepper_options.solver_parameters = NewtonParameters(
        ksp_rtol=1e-9, ksp_max_it=96, gmres_restart=24)
    o.timestep = dt
    o.simulation_export_time = hours * 3600.0
    o.simulation_end_time = hours * 3600.0
    o.no_exports = True
    xyz = mesh.coords_np
    cent = mesh.cell_midpoints()
    sin_lat_c = cent[:, 2] / np.linalg.norm(cent, axis=1)
    amp = (R_EARTH * OMEGA * u0 + 0.5 * u0**2) / G
    eta0 = (-amp * sin_lat_c**2)[:, None]
    uvec = (u0 / R_EARTH) * np.stack(
        [-xyz[:, 1], xyz[:, 0], np.zeros(mesh.nv)], axis=-1)
    o.coriolis_frequency = jnp.asarray(2.0 * OMEGA * xyz[:, 2] / R_EARTH)
    s.assign_initial_conditions(elev=jnp.asarray(eta0),
                                uv=jnp.asarray(uvec))
    return s, mesh, eta0, amp


@pytest.mark.parametrize("family", ["rt-dg", "bdm-dg"])
def test_williamson2_flowsolver_facade(family):
    """Sphere case as a user script: FlowSolver2d on an icosahedral
    SphereMesh, H(div) family, iterate() lifecycle, exact volume."""
    s, mesh, eta0, amp = _setup_facade(3, family=family, hours=6.0)
    s.initialize()
    v0 = s.compute_volume_2d()
    s.iterate()
    v1 = s.compute_volume_2d()
    area = np.asarray(mesh.cell_area_np)
    err = np.asarray(s.fields.elev_2d.data[:, 0] - eta0[:, 0])
    rel = math.sqrt(float((area * err**2).sum()) / area.sum()) / amp
    print(f"W2 facade {family} ref3 6h: rel err {rel:.4f}")
    assert abs(v1 - v0) < 1e-9 * abs(v0), "volume not conserved"
    # 6 h on the coarse mesh: steady state held to discretization error
    assert rel < 0.08, f"steady state lost through the facade: {rel}"


def _lauter3_state(mesh, t):
    """Läuter et al. (2005) example 3 — unsteady solid-body rotation:
    analytic (elev_P0, uv_vertex, bath_vertex) at time ``t`` (ref
    ``test/sphere/test_williamson.py::setup_lauter3``)."""
    alpha = np.pi / 4.0
    k1 = 133681.0
    u0 = 2 * np.pi * R_EARTH / (12.0 * 86400.0)
    c = 12e3
    xt, yt = np.cos(OMEGA * t), np.sin(OMEGA * t)

    def fields(xyz):
        x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        r_h = np.sqrt(x**2 + y**2 + 1e-3)
        u_enu = u0 / R_EARTH / r_h * (
            np.sin(alpha) * z * (x * xt - y * yt)
            + np.cos(alpha) * r_h**2)
        v_enu = -u0 * np.sin(alpha) / r_h * (y * xt + x * yt)
        # ENU basis -> ECEF
        ne = np.stack([-y, x, np.zeros_like(x)], -1) / r_h[:, None]
        nn = np.stack([-x * z, -y * z, x**2 + y**2], -1) \
            / (r_h * R_EARTH)[:, None]
        uv = u_enu[:, None] * ne + v_enu[:, None] * nn
        orog = (OMEGA * z) ** 2 / G / 2.0
        b = (np.sin(alpha) * (-x * xt + y * yt)
             + np.cos(alpha) * z) / R_EARTH
        elev = (-0.5 * (u0 * b + OMEGA * z) ** 2 + k1) / G + orog - c
        bath = -orog + c
        return uv, elev, bath

    uv_v, _, bath_v = fields(mesh.coords_np)
    _, elev_c, _ = fields(mesh.cell_midpoints())
    return uv_v, elev_c[:, None], bath_v


def run_lauter3(refinement, dt=900.0, hours=24.0):
    """Läuter-3 through the FlowSolver2d facade; returns the relative
    elevation L2 error against the rotated analytic state at t_end."""
    import jax.numpy as jnp
    from thetis_tpu.model.flowsolver2d import FlowSolver2d

    mesh = IcosahedralSphereMesh(R_EARTH, refinement)
    uv0, eta0, bath = _lauter3_state(mesh, 0.0)
    s = FlowSolver2d(mesh, jnp.asarray(bath))
    o = s.options
    o.element_family = "rt-dg"
    o.polynomial_degree = 0
    o.swe_timestepper_type = "CrankNicolson"
    o.swe_timestepper_options.use_semi_implicit_linearization = True
    o.swe_timestepper_options.solver_parameters = NewtonParameters(
        ksp_rtol=1e-9, ksp_max_it=96, gmres_restart=24)
    o.timestep = dt
    o.simulation_export_time = hours * 3600.0
    o.simulation_end_time = hours * 3600.0
    o.no_exports = True
    xyz = mesh.coords_np
    o.coriolis_frequency = jnp.asarray(2.0 * OMEGA * xyz[:, 2] / R_EARTH)
    s.assign_initial_conditions(elev=jnp.asarray(eta0),
                                uv=jnp.asarray(uv0))
    s.iterate()
    _, eta_T, _ = _lauter3_state(mesh, s.simulation_time)
    area = np.asarray(mesh.cell_area_np)
    err = np.asarray(s.fields.elev_2d.data[:, 0] - eta_T[:, 0])
    scale = float(np.abs(eta_T).max())
    return math.sqrt(float((area * err**2).sum()) / area.sum()) / scale


def test_lauter3_unsteady():
    """Unsteady analytic solid-body rotation: the error must converge
    under refinement (ref parametrizes williamson2 + lauter3)."""
    r3 = run_lauter3(3)
    r4 = run_lauter3(4)
    print(f"lauter3: rel elev err ref3 {r3:.4f} ref4 {r4:.4f}")
    assert np.isfinite([r3, r4]).all()
    assert r4 < 0.7 * r3, (r3, r4)


def test_williamson5_facade():
    """Williamson (1992) case 5 — zonal flow over an isolated mountain
    (ref ``test/sphere/test_williamson.py::test_williamson5``): spatially
    varying bathymetry through the facade, 10 h at refinement 2 with the
    reference's config (bdm-dg, dt=3600).  No analytic solution: the run
    must stay bounded, conserve volume exactly, and the mountain must
    generate a flow disturbance."""
    import jax.numpy as jnp
    from thetis_tpu.model.flowsolver2d import FlowSolver2d
    from thetis_tpu.solvers.newton import NewtonParameters

    depth = 5960.0
    u_max = 20.0
    mesh = IcosahedralSphereMesh(R_EARTH, 2)
    xyz = mesh.coords_np
    lon = np.arctan2(xyz[:, 1], xyz[:, 0])
    lat = np.arcsin(np.clip(xyz[:, 2] / R_EARTH, -1, 1))
    R0 = np.pi / 9.0
    lon_c, lat_c = -np.pi / 2.0, np.pi / 6.0
    r = np.sqrt(np.minimum(R0**2, (lon - lon_c)**2 + (lat - lat_c)**2))
    bath = depth - 2000.0 * (1 - r / R0)

    # williamson2 initial fields at u_max (ref williamson2_init_fields)
    amp = (R_EARTH * OMEGA * u_max + 0.5 * u_max**2) / G
    cent = mesh.cell_midpoints()
    sin_lat_c = cent[:, 2] / np.linalg.norm(cent, axis=1)
    eta0 = (-amp * sin_lat_c**2)[:, None]
    uvec = (u_max / R_EARTH) * np.stack(
        [-xyz[:, 1], xyz[:, 0], np.zeros(mesh.nv)], axis=-1)
    # scale uv to the modified column height (ref setup_williamson5 NOTE)
    eta_v = -amp * (xyz[:, 2] / R_EARTH) ** 2
    h_w2 = depth + eta_v
    h_w5 = bath + eta_v
    uvec = uvec * (h_w2 / h_w5)[:, None]

    s = FlowSolver2d(mesh, jnp.asarray(bath))
    o = s.options
    o.element_family = "bdm-dg"
    o.polynomial_degree = 0
    o.swe_timestepper_type = "CrankNicolson"
    o.swe_timestepper_options.use_semi_implicit_linearization = True
    o.swe_timestepper_options.solver_parameters = NewtonParameters(
        ksp_rtol=1e-8, ksp_max_it=96, gmres_restart=24)
    o.timestep = 3600.0
    o.simulation_export_time = 10 * 3600.0
    o.simulation_end_time = 10 * 3600.0
    o.no_exports = True
    o.coriolis_frequency = jnp.asarray(2.0 * OMEGA * xyz[:, 2] / R_EARTH)
    s.assign_initial_conditions(elev=jnp.asarray(eta0),
                                uv=jnp.asarray(uvec))
    s.initialize()
    v0 = s.compute_volume_2d()
    s.iterate()
    v1 = s.compute_volume_2d()
    elev = np.asarray(s.fields.elev_2d.data[:, 0])
    assert np.isfinite(elev).all()
    assert abs(v1 - v0) < 1e-9 * abs(v0), "volume not conserved"
    # bounded: no blow-up beyond physical scales
    assert np.abs(elev).max() < 3000.0
    # the mountain disturbs the otherwise-steady zonal flow
    d_elev = np.abs(elev - eta0[:, 0])
    assert float(d_elev.max()) > 1.0, "no mountain response"
