"""3D momentum equation tests: consistency (uniform deviation flow has no
spurious tendency away from walls), internal-pressure-gradient-driven
baroclinic adjustment (lock-exchange direction check), and the implicit
vertical viscosity column solve."""
import pytest as _pytest

#: long-running integration tier: run with `pytest -m slow`
pytestmark = _pytest.mark.slow

from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thetis_tpu import RectangleMesh, FunctionSpace, DGAssembler
from thetis_tpu.mesh.extruded import ExtrudedMesh
from thetis_tpu.fem.assembly3d import Assembler3D
from thetis_tpu.equations.momentum_3d import (
    MomentumEquation3D,
    vertical_viscosity_implicit,
)
from thetis_tpu.equations.utility3d import BaroclinicHeadCalculator
from thetis_tpu.equations.eos import LinearEquationOfState


@pytest.fixture(scope="module")
def setup():
    mesh = RectangleMesh(16, 2, 16e3, 2e3)
    V = FunctionSpace(mesh, "DG", 1)
    asm = DGAssembler(mesh, V)
    ext = ExtrudedMesh(mesh, n_layers=8)
    a3 = Assembler3D(mesh, asm, ext)
    bathy = jnp.full((mesh.nc, 3), 20.0)
    z = ext.z_interfaces(bathy, jnp.zeros((mesh.nc, 3)))
    geom = a3.layer_geometry(z)
    opts = SimpleNamespace(
        use_nonlinear_equations=True, use_lax_friedrichs_velocity=True,
        sipg_factor=1.0,
    )
    return mesh, ext, a3, geom, opts


def test_momentum_rest_state(setup):
    """No forcing, no flow -> zero tendency."""
    mesh, ext, a3, geom, opts = setup
    eq = MomentumEquation3D(mesh, a3, opts)
    uv = jnp.zeros((mesh.nc, 3, ext.nz, 2, 2))
    w = jnp.zeros((mesh.nc, 3, ext.nz, 2))
    sol = {"uv_3d": uv}
    r = eq.residual("all", sol, sol, {"w_3d": w}, {}, {}, geom=geom)
    assert float(jnp.abs(r["uv_3d"]).max()) < 1e-12


def test_lock_exchange_direction(setup):
    """Dense water on the left: the internal pressure gradient must drive
    bottom flow toward the light side (+x) and the tendency must be
    vertically sheared (bottom vs surface opposite after removing the
    depth average) — the lock-exchange adjustment."""
    mesh, ext, a3, geom, opts = setup
    eq = MomentumEquation3D(mesh, a3, opts)
    eos = LinearEquationOfState(rho_ref=1000.0, alpha=0.2)
    # temperature front: cold (dense) left, warm right
    xy = FunctionSpace(mesh, "DG", 1).dof_coords()
    x3 = jnp.broadcast_to(
        xy[..., 0][:, :, None, None], (mesh.nc, 3, ext.nz, 2)
    )
    temp = 10.0 + 5.0 * jnp.tanh((x3 - 8e3) / 1e3)
    rho_prime = eos.compute_rho(35.0, temp, 0.0, 1000.0)
    bhc = BaroclinicHeadCalculator(a3)
    r_head = bhc.compute_head(rho_prime, geom)
    int_pg = bhc.compute_int_pg(r_head, geom)

    uv = jnp.zeros((mesh.nc, 3, ext.nz, 2, 2))
    w = jnp.zeros((mesh.nc, 3, ext.nz, 2))
    sol = {"uv_3d": uv}
    fields = {"w_3d": w, "int_pg_3d": int_pg}
    r = eq.residual("all", sol, sol, fields, fields, {}, geom=geom)
    duv = eq.mass_inverse(r, geom)["uv_3d"]
    # sample mid-front columns
    mask = np.abs(np.asarray(x3[:, :, 0, 0]) - 8e3) < 2e3
    du_bot = np.asarray(duv[:, :, 0, 0, 0])[mask]
    du_top = np.asarray(duv[:, :, -1, 1, 0])[mask]
    # baroclinic pressure gradient: strongest +x acceleration at depth
    assert du_bot.mean() > 0, "bottom flow should accelerate toward +x"
    assert du_bot.mean() > du_top.mean(), (
        "acceleration must decrease toward the surface (baroclinic shear)"
    )


def test_vertical_viscosity_implicit(setup):
    """Implicit column viscosity: smooths shear, conserves momentum
    without surface/bottom fluxes, applies wind stress correctly."""
    mesh, ext, a3, geom, opts = setup
    Dn = geom["Delta_nodes"]
    shape = (mesh.nc, 3, ext.nz, 2)
    # sheared continuous profile u(z) = (z + 20)/20: 0 at bed, 1 at surface
    bathy = jnp.full((mesh.nc, 3), 20.0)
    z = ext.z_interfaces(bathy, jnp.zeros((mesh.nc, 3)))
    zz = jnp.stack([z[..., :-1], z[..., 1:]], axis=-1)  # (nc,3,nz,2)
    uv = jnp.zeros(shape + (2,)).at[..., 0].set((zz + 20.0) / 20.0)
    nu = jnp.full(shape, 1e-2)
    out = vertical_viscosity_implicit(uv, nu, Dn, dt=600.0)
    # momentum conserved (Neumann BCs)
    m0 = float((uv[..., 0] * 0.5 * jnp.stack([Dn, Dn], -1)).sum())
    m1 = float((out[..., 0] * 0.5 * jnp.stack([Dn, Dn], -1)).sum())
    assert m1 == pytest.approx(m0, rel=1e-10)
    # shear reduced
    shear0 = float(jnp.abs(jnp.diff(uv[..., 0], axis=2)).sum())
    shear1 = float(jnp.abs(jnp.diff(out[..., 0], axis=2)).sum())
    assert shear1 < shear0
    # wind stress accelerates the surface
    tau = jnp.zeros((mesh.nc, 3, 2)).at[..., 0].set(1e-4)
    out2 = vertical_viscosity_implicit(uv, nu, Dn, dt=600.0,
                                       stress_top=tau)
    assert float(out2[..., -1, 1, 0].mean()) > float(out[..., -1, 1, 0].mean())


def test_hviscosity_mes(setup):
    """Spatial convergence of the full SIPG horizontal viscosity operator
    (penalty + consistency + symmetry, ref ``momentum_eq.py:317-389``):
    diffusive decay of u = sin(k x) on a periodic channel must match the
    analytic solution u0 exp(-nu k^2 t) at ~2nd order in h (penalty-only
    SIPG degrades the order).  Reference pattern:
    ``test/momentumEq/test_h-viscosity_mes.py``."""
    from scipy.stats import linregress
    from thetis_tpu.mesh.generation import PeriodicRectangleMesh

    nu = 50.0
    lx = 16e3
    k = 2 * np.pi / lx
    T = 0.25 / (nu * k**2)
    errs, hs = [], []
    for nx in (8, 16, 32):
        mesh = PeriodicRectangleMesh(nx, 2, lx, 2e3, direction="x")
        V = FunctionSpace(mesh, "DG", 1)
        asm = DGAssembler(mesh, V)
        ext = ExtrudedMesh(mesh, n_layers=2)
        a3 = Assembler3D(mesh, asm, ext)
        bathy = jnp.full((mesh.nc, 3), 20.0)
        z = ext.z_interfaces(bathy, jnp.zeros((mesh.nc, 3)))
        geom = a3.layer_geometry(z)
        opts = SimpleNamespace(use_nonlinear_equations=False,
                               use_lax_friedrichs_velocity=False,
                               sipg_factor=1.0)
        eq = MomentumEquation3D(mesh, a3, opts)
        xy = V.dof_coords()
        x3 = jnp.broadcast_to(
            xy[..., 0][:, :, None, None], (mesh.nc, 3, ext.nz, 2)
        )
        uv0 = jnp.zeros((mesh.nc, 3, ext.nz, 2, 2)).at[..., 0].set(
            jnp.sin(k * x3)
        )
        fields = {"viscosity_h": jnp.asarray(nu)}
        h = lx / nx
        # explicit stability: the SIPG penalty pushes the spectral radius
        # to ~400 nu/h^2 (measured by power iteration), so dt ~ 0.0015 h^2/nu
        n_steps = int(np.ceil(T / (0.0015 * h**2 / nu)))
        dt = T / n_steps

        def fe_step(u, _):
            r = eq.residual("explicit", {"uv_3d": u}, {"uv_3d": u},
                            fields, fields, {}, geom=geom)
            return u + dt * eq.mass_inverse(r, geom)["uv_3d"], None

        u_T = jax.lax.scan(fe_step, uv0, None, length=n_steps)[0]
        exact = jnp.sin(k * x3) * np.exp(-nu * k**2 * T)
        e = u_T[..., 0] - exact
        # L2 norm via the 3D mass operator
        l2 = float(jnp.sqrt((e * a3.mass_apply(e, geom)).sum()))
        l2_ref = float(jnp.sqrt((exact * a3.mass_apply(exact, geom)).sum()))
        errs.append(l2 / l2_ref)
        hs.append(h)
    slope = linregress(np.log(hs), np.log(errs)).slope
    assert slope > 1.7, (slope, errs)


def test_hadv_open_boundary_uniform_flow(setup):
    """With external uv prescribed equal to the interior, a uniform flow
    has zero advective tendency all the way to the open boundary (the
    land-mirror treatment would generate a spurious wall force there)
    — ref ``momentum_eq.py:213-246`` BC vocabulary."""
    mesh, ext, a3, geom, opts = setup
    u0 = 0.7
    bnd = {m: {"uv": (u0, 0.0)} for m in mesh.boundary_markers}
    eq = MomentumEquation3D(mesh, a3, opts, bnd_conditions=bnd)
    uv = jnp.zeros((mesh.nc, 3, ext.nz, 2, 2)).at[..., 0].set(u0)
    w = jnp.zeros((mesh.nc, 3, ext.nz, 2))
    sol = {"uv_3d": uv}
    bndv = {m: {"uv": jnp.asarray([u0, 0.0])} for m in mesh.boundary_markers}
    r = eq.residual("explicit", sol, sol, {"w_3d": w}, {}, bndv, geom=geom)
    duv = eq.mass_inverse(r, geom)["uv_3d"]
    assert float(jnp.abs(duv).max()) < 1e-10

    # sanity: without the BC (land mirror) the tendency is NOT zero
    eq0 = MomentumEquation3D(mesh, a3, opts)
    r0 = eq0.residual("explicit", sol, sol, {"w_3d": w}, {}, {}, geom=geom)
    duv0 = eq0.mass_inverse(r0, geom)["uv_3d"]
    assert float(jnp.abs(duv0).max()) > 1e-6


def test_law_of_wall_bottom_friction():
    """The 3D solver derives Cd from ``bottom_roughness`` via the log fit
    in the bottom element (ref ``momentum_eq.py:443-497``); an explicit
    ``quadratic_drag_coefficient`` overrides it.  Friction must decelerate
    a uniform flow, with larger roughness decelerating faster."""
    from thetis_tpu.model.flowsolver3d import FlowSolver

    mesh = RectangleMesh(8, 4, 8e3, 4e3)

    def run(z0=None, cd=None):
        s = FlowSolver(mesh, jnp.asarray(20.0), 4)
        s.options.update(dict(
            timestep=300.0, simulation_export_time=300.0,
            simulation_end_time=300.0, solve_salinity=False,
            solve_temperature=False, use_baroclinic_formulation=False,
            use_bottom_friction=True,
            bottom_roughness=z0 if z0 is not None else 0.005,
            quadratic_drag_coefficient=cd,
        ))
        s.initialize()
        s.assign_initial_conditions(uv=jnp.asarray([0.5, 0.0]))
        state = s._get_state()
        out = s._step(state, s._gather_swe_fields(), {})
        # friction magnitude metric: mean |bottom total velocity| (the 2D
        # sloshing is identical across runs; only the drag differs)
        ub = out["uv_3d"][:, :, 0, 0, :] + out["uv"]
        return float(jnp.abs(ub[..., 0]).mean())

    u_smooth = run(z0=1e-4)
    u_rough = run(z0=0.05)
    u_nodrg = run(cd=0.0)
    assert u_rough < u_smooth < u_nodrg, (u_rough, u_smooth, u_nodrg)


def test_smagorinsky_wired():
    """use_smagorinsky_viscosity must actually change the 3D step (it was
    dead wiring in round 1): a sheared flow gets extra horizontal mixing."""
    from thetis_tpu.model.flowsolver3d import FlowSolver

    mesh = RectangleMesh(8, 4, 8e3, 4e3)

    def run(use_smag):
        s = FlowSolver(mesh, jnp.asarray(20.0), 4)
        s.options.update(dict(
            timestep=300.0, simulation_export_time=300.0,
            simulation_end_time=300.0, solve_salinity=False,
            solve_temperature=False, use_baroclinic_formulation=False,
            use_bottom_friction=False,
            use_smagorinsky_viscosity=use_smag,
            smagorinsky_coefficient=0.5,
        ))
        s.initialize()
        # horizontally AND vertically sheared deviation velocity (zero
        # depth average, so the 2D<->3D split keeps it in uv_3d)
        xy = FunctionSpace(mesh, "DG", 1).dof_coords()
        y3 = jnp.broadcast_to(xy[..., 1][:, :, None, None],
                              (mesh.nc, 3, s.extruded.nz, 2))
        z = s.extruded.z_interfaces(s.bathy_cell, jnp.zeros((mesh.nc, 3)))
        zz = jnp.stack([z[..., :-1], z[..., 1:]], axis=-1)  # (nc,3,nz,2)
        uv3 = jnp.zeros((mesh.nc, 3, s.extruded.nz, 2, 2)).at[..., 0].set(
            0.2 * jnp.sin(2 * np.pi * y3 / 4e3) * (zz + 10.0) / 10.0
        )
        s.assign_initial_conditions(uv_3d=uv3)
        state = s._get_state()
        out = s._step(state, s._gather_swe_fields(), {})
        return np.asarray(out["uv_3d"])

    a = run(False)
    b = run(True)
    assert not np.allclose(a, b), "Smagorinsky option must affect the step"
    # and it must act diffusively on the sheared component
    assert np.abs(b[..., 0]).max() <= np.abs(a[..., 0]).max() + 1e-12
