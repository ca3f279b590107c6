"""3D extruded-mesh foundation tests: geometry/vertical operators, EOS
values, and tracer consistency/conservation (analogue of the reference's
``test/operations/test_operations_2d-3d.py``, ``test/tracerEq/
test_consistency.py``, and EOS unit checks)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thetis_tpu import RectangleMesh, FunctionSpace, DGAssembler
from thetis_tpu.mesh.extruded import ExtrudedMesh
from thetis_tpu.fem.assembly3d import Assembler3D
from thetis_tpu.equations.eos import (
    JackettEquationOfState,
    LinearEquationOfState,
)
from thetis_tpu.equations.utility3d import (
    VerticalVelocitySolver,
    BaroclinicHeadCalculator,
    expand_function_to_3d,
    extract_surface_2d,
    extract_bottom_2d,
)
from thetis_tpu.equations.tracer_3d import TracerEquation3D
from types import SimpleNamespace


@pytest.fixture(scope="module")
def setup3d():
    mesh = RectangleMesh(8, 4, 4e3, 2e3)
    V = FunctionSpace(mesh, "DG", 1)
    asm = DGAssembler(mesh, V)
    ext = ExtrudedMesh(mesh, n_layers=6)
    a3 = Assembler3D(mesh, asm, ext)
    bathy = jnp.full((mesh.nc, 3), 10.0)
    elev = jnp.zeros((mesh.nc, 3))
    z = ext.z_interfaces(bathy, elev)
    geom = a3.layer_geometry(z)
    return mesh, asm, ext, a3, bathy, z, geom


def test_volume_and_mass(setup3d):
    mesh, asm, ext, a3, bathy, z, geom = setup3d
    one = jnp.ones((mesh.nc, 3, ext.nz, 2))
    wq = a3.wq(geom)
    vol = float(wq.sum())
    assert vol == pytest.approx(4e3 * 2e3 * 10.0, rel=1e-12)
    # mass roundtrip
    u = jnp.asarray(
        np.random.RandomState(0).rand(mesh.nc, 3, ext.nz, 2)
    )
    r = a3.mass_inverse(a3.mass_apply(u, geom), geom)
    assert np.allclose(np.asarray(r), np.asarray(u), atol=1e-10)


def test_gradients_3d(setup3d):
    mesh, asm, ext, a3, bathy, z, geom = setup3d
    # f = 2x + 3y - 4z: build dof values from coordinates
    xy = FunctionSpace(mesh, "DG", 1).dof_coords()  # (nc,3,2)
    x = jnp.broadcast_to(xy[..., 0][:, :, None, None], z.shape[:2] + (ext.nz, 2))
    y = jnp.broadcast_to(xy[..., 1][:, :, None, None], x.shape)
    zz = jnp.stack([z[..., :-1], z[..., 1:]], axis=-1)  # (nc,3,nz,2)
    f = 2 * x + 3 * y - 4 * zz
    g = a3.cell_grads(f, geom)
    assert np.allclose(np.asarray(g[..., 0]), 2.0, atol=1e-10)
    assert np.allclose(np.asarray(g[..., 1]), 3.0, atol=1e-10)
    assert np.allclose(np.asarray(g[..., 2]), -4.0, atol=1e-10)


def test_vertical_integral(setup3d):
    mesh, asm, ext, a3, bathy, z, geom = setup3d
    # int of f = z over the column: [z^2/2]_{-10}^{0} = -50
    zz = jnp.stack([z[..., :-1], z[..., 1:]], axis=-1)
    col = a3.vertical_integral(zz, geom)
    assert np.allclose(np.asarray(col), -50.0, atol=1e-10)
    avg = a3.vertical_integral(zz, geom, average=True)
    assert np.allclose(np.asarray(avg), -5.0, atol=1e-10)
    # cumulative from top of f=1 gives eta - z
    one = jnp.ones_like(zz)
    cum = a3.cumulative_integral(one, geom, from_top=True)
    assert np.allclose(np.asarray(cum), np.asarray(-zz), atol=1e-10)


def test_2d3d_copies(setup3d):
    mesh, asm, ext, a3, bathy, z, geom = setup3d
    u2 = jnp.asarray(np.random.RandomState(1).rand(mesh.nc, 3))
    u3 = expand_function_to_3d(u2, ext.nz)
    assert u3.shape == (mesh.nc, 3, ext.nz, 2)
    assert np.allclose(np.asarray(extract_surface_2d(u3)), np.asarray(u2))
    assert np.allclose(np.asarray(extract_bottom_2d(u3)), np.asarray(u2))


def test_eos_values():
    """Jackett EOS check values (Jackett et al. 2006: rho(35 psu, 25 C,
    2000 dbar) = 1031.65056056576 kg/m3)."""
    eos = JackettEquationOfState()
    rho = float(eos.compute_rho(35.0, 25.0, 2000.0))
    assert rho == pytest.approx(1031.65056056576, abs=1e-6)
    rho0 = float(eos.compute_rho(35.0, 25.0, 0.0))
    assert rho0 == pytest.approx(1023.3, abs=0.3)
    lin = LinearEquationOfState(rho_ref=1000.0, alpha=0.2, beta=0.77,
                                th_ref=15.0, s_ref=35.0)
    assert float(lin.compute_rho(35.0, 15.0, 0.0)) == 1000.0
    assert float(lin.compute_rho(35.0, 16.0, 0.0)) == pytest.approx(999.8)


def test_baroclinic_head(setup3d):
    mesh, asm, ext, a3, bathy, z, geom = setup3d
    # constant density anomaly rho' = 1: r = -(eta - z)/rho0 = z/rho0
    zz = jnp.stack([z[..., :-1], z[..., 1:]], axis=-1)
    bhc = BaroclinicHeadCalculator(a3)
    r = bhc.compute_head(jnp.ones_like(zz), geom)
    assert np.allclose(np.asarray(r), np.asarray(zz) / 1000.0, atol=1e-12)
    # tilted density field rho' = x: int_pg = g/rho0 * (z-eta) * d(rho')/dx
    xy = FunctionSpace(mesh, "DG", 1).dof_coords()
    x3 = jnp.broadcast_to(xy[..., 0][:, :, None, None], zz.shape)
    r2 = bhc.compute_head(x3, geom)
    ipg = bhc.compute_int_pg(r2, geom)
    expected = 9.81 / 1000.0 * np.asarray(zz)
    assert np.allclose(np.asarray(ipg[..., 0]), expected, atol=1e-6)


def test_vertical_velocity(setup3d):
    mesh, asm, ext, a3, bathy, z, geom = setup3d
    # uniform horizontal flow, flat bed -> w = 0
    uv = jnp.broadcast_to(
        jnp.asarray([0.3, 0.1]), (mesh.nc, 3, ext.nz, 2, 2)
    )
    wsolver = VerticalVelocitySolver(a3, bathy)
    w = wsolver.solve(uv, geom)
    assert np.abs(np.asarray(w)).max() < 1e-10
    w_weak = wsolver.solve_weak(uv, geom)
    assert np.abs(np.asarray(w_weak)).max() < 1e-10


def test_vertical_velocity_flux_consistency(setup3d):
    """The weak w solve makes the DG advection operator exactly
    divergence-consistent: the tracer residual at c == 1 vanishes on
    every row except the free-surface nodes (where it equals the
    kinematic surface flux, handled by the consistency field) — the
    property of the reference's weak solve (ref ``utility3d.py:27-129``)
    that the pointwise column integration lacks."""
    mesh, asm, ext, a3, bathy, z, geom = setup3d
    xy = FunctionSpace(mesh, "DG", 1).dof_coords()
    zz = jnp.stack([z[..., :-1], z[..., 1:]], axis=-1)
    x = jnp.broadcast_to(xy[..., 0][:, :, None, None], zz.shape)
    y = jnp.broadcast_to(xy[..., 1][:, :, None, None], zz.shape)
    u = 0.5 * jnp.sin(2 * np.pi * x / 4e3) * jnp.cos(
        np.pi * (zz + 10.0) / 10.0)
    v = 0.3 * jnp.cos(2 * np.pi * y / 2e3)
    uv3 = jnp.stack([u, v], axis=-1)
    wsolver = VerticalVelocitySolver(a3, bathy)
    w = wsolver.solve_weak(uv3, geom)
    opts = SimpleNamespace(
        sipg_factor_tracer=1.0, sipg_factor_vertical_tracer=1.0,
        use_lax_friedrichs_tracer=False,
    )
    eq = TracerEquation3D(mesh, a3, opts, bnd_conditions={},
                          label="salt_3d")
    c1 = jnp.ones((mesh.nc, 3, ext.nz, 2))
    r = np.asarray(eq.residual(
        "all", {"salt_3d": c1}, {"salt_3d": c1},
        {"uv_3d": uv3, "w_3d": w}, {}, {}, geom=geom)["salt_3d"])
    # all rows except the free-surface (top) nodes are machine zero
    interior = np.concatenate(
        [r[:, :, :-1, :].ravel(), r[:, :, -1, 0].ravel()])
    assert np.abs(interior).max() < 1e-10 * np.abs(r).max()


def test_tracer3d_consistency(setup3d):
    """A uniform tracer must remain uniform under divergence-free uniform
    flow (ref ``test/tracerEq/test_consistency.py``)."""
    mesh, asm, ext, a3, bathy, z, geom = setup3d
    opts = SimpleNamespace(
        sipg_factor_tracer=1.0, sipg_factor_vertical_tracer=1.0,
        use_lax_friedrichs_tracer=True,
    )
    eq = TracerEquation3D(mesh, a3, opts, bnd_conditions={}, label="salt_3d")
    c0 = jnp.full((mesh.nc, 3, ext.nz, 2), 4.5)
    uv = jnp.broadcast_to(jnp.asarray([0.3, 0.0]),
                          (mesh.nc, 3, ext.nz, 2, 2))
    w = jnp.zeros((mesh.nc, 3, ext.nz, 2))
    fields = {"uv_3d": uv, "w_3d": w}
    sol = {"salt_3d": c0}
    r = eq.residual("all", sol, sol, fields, fields, {}, geom=geom)
    dc = eq.mass_inverse(r, geom)["salt_3d"]
    # residual of a constant field under uniform flow in a closed basin:
    # interior fluxes cancel; boundary outflow/inflow appears only on open
    # bnds (none here) -> d(c)/dt = 0 pointwise
    assert np.abs(np.asarray(dc)).max() < 1e-10


def test_tracer3d_advection(setup3d):
    """March a smooth blob with SSPRK33 in 3D uniform flow; mass is
    conserved and the blob moves at the right speed."""
    mesh, asm, ext, a3, bathy, z, geom = setup3d
    opts = SimpleNamespace(
        sipg_factor_tracer=1.0, sipg_factor_vertical_tracer=1.0,
        use_lax_friedrichs_tracer=True,
    )
    eq = TracerEquation3D(mesh, a3, opts, bnd_conditions={}, label="salt_3d")
    xy = FunctionSpace(mesh, "DG", 1).dof_coords()
    x3 = jnp.broadcast_to(
        xy[..., 0][:, :, None, None], (mesh.nc, 3, ext.nz, 2)
    )
    c0 = jnp.exp(-(((x3 - 1.5e3) / 400.0) ** 2))
    u0 = 0.5
    uv = jnp.broadcast_to(jnp.asarray([u0, 0.0]), (mesh.nc, 3, ext.nz, 2, 2))
    w = jnp.zeros((mesh.nc, 3, ext.nz, 2))
    fields = {"uv_3d": uv, "w_3d": w}
    dt = 100.0

    def rhs(s):
        r = eq.residual("all", s, s, fields, fields, {}, geom=geom)
        return eq.mass_inverse(r, geom)

    @jax.jit
    def step(s):
        k0 = rhs(s)
        s1 = {k: s[k] + dt * k0[k] for k in s}
        k1 = rhs(s1)
        s2 = {k: 0.75 * s[k] + 0.25 * (s1[k] + dt * k1[k]) for k in s}
        k2 = rhs(s2)
        return {k: (s[k] + 2 * (s2[k] + dt * k2[k])) / 3.0 for k in s}

    sol = {"salt_3d": c0}
    wq = a3.wq(geom)

    def mass(s):
        return float((a3.cell_values(s["salt_3d"]) * wq).sum())

    m0 = mass(sol)
    for _ in range(10):
        sol = step(sol)
    m1 = mass(sol)
    # boundary facets are pass-through (reference behaviour): the gaussian
    # tail exchanges ~1e-3 of the mass through the inflow boundary
    assert abs(m1 - m0) < 2e-3 * abs(m0)
    # centroid moved by ~ u0 * T = 500 m
    xq = a3.cell_values(x3)
    cq = a3.cell_values(sol["salt_3d"])
    centroid = float((xq * cq * wq).sum() / (cq * wq).sum())
    assert centroid == pytest.approx(1.5e3 + u0 * 10 * dt, rel=0.05)


def test_timeseries_callback_3d():
    """TimeSeriesCallback3D (ref ``callback.py:728-850``): samples a 3D
    field at an (x, y, z) station; a linear-in-z field must be recovered
    exactly at mid-depth."""
    import jax.numpy as jnp
    from thetis_tpu.mesh.generation import RectangleMesh
    from thetis_tpu.fem.functionspace import FunctionSpace, Function
    from thetis_tpu.model.flowsolver3d import FlowSolver
    from thetis_tpu.model.callback import TimeSeriesCallback3D

    mesh2d = RectangleMesh(6, 4, 1e3, 6e2)
    depth = 20.0
    s = FlowSolver(mesh2d, jnp.asarray(depth), 5)
    s.options.update(dict(timestep=10.0, simulation_export_time=10.0,
                          simulation_end_time=10.0, no_exports=True,
                          solve_temperature=True, solve_salinity=False))
    s.create_equations()
    # temp linear in z: T = 15 + 0.2 z
    sig = np.linspace(-depth, 0.0, 6)
    zn = np.stack([sig[:-1], sig[1:]], axis=-1)
    t0 = 15.0 + 0.2 * zn[None, None]
    s.assign_initial_conditions(temp=jnp.asarray(
        np.broadcast_to(t0, s.shape3)))
    cb = TimeSeriesCallback3D(s, ["temp_3d"], 512.0, 333.0, -10.0, "sta")
    val = float(np.ravel(cb()[0])[0])
    assert abs(val - (15.0 + 0.2 * -10.0)) < 1e-10, val


@pytest.mark.slow
def test_tracer3d_value_bc_inflow():
    """3D tracer 'value' boundary condition (ref ``tracer_eq.py:171-189``):
    inflow through an open boundary carries the prescribed external
    salinity into the domain; outflow still uses the internal value."""
    import jax.numpy as jnp
    from thetis_tpu.mesh.generation import RectangleMesh
    from thetis_tpu.fem.functionspace import FunctionSpace, Function
    from thetis_tpu.model.flowsolver3d import FlowSolver
    from thetis_tpu.utils.constant import Constant

    lx, ly, nz = 10e3, 2e3, 4
    mesh2d = RectangleMesh(10, 2, lx, ly)
    depth = 10.0
    s = FlowSolver(mesh2d, jnp.asarray(depth), nz)
    s.options.update(dict(
        timestep=50.0, simulation_export_time=2500.0,
        simulation_end_time=2500.0, no_exports=True,
        solve_temperature=False, solve_salinity=True,
        use_baroclinic_formulation=False,
        use_implicit_vertical_diffusion=False, use_bottom_friction=False,
        use_limiter_for_tracers=True,
    ))
    # inflow at x=0 (marker 1) with salt 30; outflow at x=lx (marker 2)
    flux = ly * depth * 0.5
    s.bnd_functions["shallow_water"] = {
        1: {"flux": Constant(-flux)},
        2: {"flux": Constant(flux)},
    }
    s.bnd_functions["salt"] = {1: {"value": 30.0}}
    s.options.constant_salinity = 35.0
    s.assign_initial_conditions(uv=jnp.asarray([0.5, 0.0]))
    s.iterate()
    salt = np.asarray(s.fields.salt_3d.data)
    assert np.isfinite(salt).all()
    x_dof = mesh2d.coords_np[mesh2d.cells_np][..., 0]
    inflow_side = salt[x_dof < 2e3]
    outflow_side = salt[x_dof > 8e3]
    # after 2500 s at 0.5 m/s the 30-psu front has crossed ~1.25 km
    assert inflow_side.min() < 31.0, inflow_side.min()
    assert outflow_side.mean() > 34.5, outflow_side.mean()
    assert salt.min() > 29.7 and salt.max() < 35.1
