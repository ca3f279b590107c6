"""Internal pressure gradient convergence (MES).

Analogue of the reference's ``test/pressure_grad/test_int_pg_mes.py``:
for an analytic density field over *sloping* bathymetry (so the
sigma-coordinate chain rule is exercised — the classic terrain-following
pressure-gradient error source), the computed baroclinic head and
internal pressure gradient must converge to the analytic values at the
P1DG rate."""
import pytest as _pytest

#: long-running integration tier: run with `pytest -m slow`
pytestmark = _pytest.mark.slow

import math

import numpy as np
import jax.numpy as jnp
from scipy import stats

from thetis_tpu import RectangleMesh, FunctionSpace
from thetis_tpu.fem.assembly import DGAssembler
from thetis_tpu.fem.assembly3d import Assembler3D
from thetis_tpu.mesh.extruded import ExtrudedMesh
from thetis_tpu.equations.utility3d import BaroclinicHeadCalculator
from thetis_tpu.config import physical_constants

# NOTE: examples (lockExchange, baroclinic_channel) mutate
# physical_constants["rho0"] at runtime; read at call time, not import
LX, LY = 10e3, 2e3
K = 2 * np.pi / LX


def _consts():
    return (float(physical_constants["rho0"]),
            float(physical_constants["g_grav"]))


def rho_fn(x, z):
    """rho'(x, z) = a sin(kx) z  (linear in z, wave in x)."""
    return 1.0e-2 * np.sin(K * x) * z


def head_fn(x, z):
    """r = -1/rho0 int_z^0 rho' dz' = a sin(kx) z^2 / (2 rho0)."""
    rho0, _ = _consts()
    return 1.0e-2 * np.sin(K * x) * (z**2) / (2 * rho0)


def intpg_x_fn(x, z):
    """g dr/dx = g a k cos(kx) z^2 / (2 rho0)."""
    rho0, g = _consts()
    return g * 1.0e-2 * K * np.cos(K * x) * (z**2) / (2 * rho0)


def run(refinement, quadratic=False):
    nx, nz = 8 * refinement, 4 * refinement
    mesh = RectangleMesh(nx, 2, LX, LY)
    V = FunctionSpace(mesh, "DG", 1)
    asm = DGAssembler(mesh, V)
    ext = ExtrudedMesh(mesh, nz)
    a3 = Assembler3D(mesh, asm, ext)
    # sloping bathymetry: 20..40 m across the channel
    xv = mesh.coords_np[:, 0]
    bathy = 20.0 + 20.0 * xv / LX
    bathy_cell = jnp.asarray(bathy)[mesh.cells]
    z_if = ext.z_interfaces(bathy_cell, jnp.zeros((mesh.nc, 3)))
    geom = a3.layer_geometry(z_if)

    # nodal coordinates of the dense layout: x (nc,3), z (nc,3,nz,2)
    x_dof = np.asarray(mesh.coords_np[mesh.cells_np][..., 0])  # (nc, 3)
    z_nodes = np.stack(
        [np.asarray(z_if)[:, :, :-1], np.asarray(z_if)[:, :, 1:]], axis=-1
    )
    bhc = BaroclinicHeadCalculator(a3)
    if quadratic:
        # analytic density sampled at ALL P2DGxP2 nodes (6 horizontal
        # columns x 3 s-nodes) — the quadratic-density pipeline
        # (``DensitySolver.solve_p2(horizontal=True)``) provides exactly
        # these pointwise values in the model
        x6 = np.asarray(bhc._to_p2_nodes(jnp.asarray(x_dof)))  # (nc, 6)
        z6_if = np.asarray(bhc._to_p2_nodes(z_if))             # (nc,6,nz+1)
        zb, zt = z6_if[:, :, :-1], z6_if[:, :, 1:]
        z3 = np.stack([zb, 0.5 * (zb + zt), zt], axis=-1)      # (nc,6,nz,3)
        rho = jnp.asarray(rho_fn(x6[:, :, None, None], z3))
    else:
        rho = jnp.asarray(rho_fn(x_dof[:, :, None, None], z_nodes))
    r = bhc.compute_head(rho, geom, quadratic=quadratic)
    int_pg = bhc.compute_int_pg(r, geom)
    if quadratic:
        # vertex-column (bottom, top) values for the error norm
        r = r[:, :3, :, ::2]

    r_exact = head_fn(x_dof[:, :, None, None], z_nodes)
    pg_exact = intpg_x_fn(x_dof[:, :, None, None], z_nodes)

    w = np.asarray(geom["Delta_nodes"])[..., None]  # (nc,3,nz,1)
    vol = float(w.sum() * 2)
    err_r = math.sqrt(float(
        (w * (np.asarray(r) - r_exact) ** 2).sum()) / vol)
    err_pg = math.sqrt(float(
        (w * (np.asarray(int_pg[..., 0]) - pg_exact) ** 2).sum()) / vol)
    scale = math.sqrt(float((w * pg_exact**2).sum()) / vol)
    return err_r, err_pg, scale


def test_int_pg_mes():
    refs = [1, 2, 4]
    out = [run(r) for r in refs]
    x_log = np.log10(1.0 / np.asarray(refs, dtype=float))
    sl_pg = stats.linregress(x_log, np.log10([o[1] for o in out])).slope
    print(f"int_pg MES: head err {[f'{o[0]:.2e}' for o in out]}, "
          f"int_pg slope {sl_pg:.2f}")
    # the vertical trapezoid integration is EXACT for a linear-in-z
    # density: the baroclinic head must be machine precision
    for err_r, _, scale in out:
        assert err_r < 1e-12 * max(scale, 1.0), err_r
    # the horizontal gradient on the sloping sigma mesh converges at
    # first order (P1DG gradient of an interpolated quadratic-in-z head
    # under the chain rule); measured 1.02
    assert sl_pg > 1.0 * (1 - 0.2), sl_pg
    # relative accuracy at the tested finest level (order-1 decay:
    # measured 0.42 / 0.21 / 0.106 across the ladder)
    assert out[-1][1] / out[-1][2] < 0.15


def test_int_pg_quadratic_pressure():
    """``use_quadratic_pressure`` ladder (ref ``solver.py:454``,
    ``options.py:1135-1145``): carrying the head in the quadratic
    vertical space restores second-order int-PG convergence where the P1
    head is stuck at first order (its in-layer head structure is linear
    while the true head is quadratic in z)."""
    refs = [1, 2, 4]
    out_p1 = [run(r) for r in refs]
    out_p2 = [run(r, quadratic=True) for r in refs]
    x_log = np.log10(1.0 / np.asarray(refs, dtype=float))
    sl_p2 = stats.linregress(x_log, np.log10([o[1] for o in out_p2])).slope
    print(f"quadratic int_pg slope {sl_p2:.2f}; "
          f"errors P1 {[f'{o[1]:.2e}' for o in out_p1]} "
          f"P2 {[f'{o[1]:.2e}' for o in out_p2]}")
    # nodal head values remain exact
    for err_r, _, scale in out_p2:
        assert err_r < 1e-12 * max(scale, 1.0), err_r
    # second-order convergence and a large accuracy gain at every level
    assert sl_p2 > 2.0 * (1 - 0.2), sl_p2
    for p1, p2 in zip(out_p1, out_p2):
        assert p2[1] < 0.35 * p1[1], (p1[1], p2[1])
