"""3D momentum equation tests: consistency (uniform deviation flow has no
spurious tendency away from walls), internal-pressure-gradient-driven
baroclinic adjustment (lock-exchange direction check), and the implicit
vertical viscosity column solve."""
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
