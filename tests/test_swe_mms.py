"""MMS convergence suites with manufactured source terms.

The strongest correctness anchors of the reference's test suite
(``test/swe2d/test_steady_state_basin_mms.py`` and
``test/tracerEq/test_steady_adv-diff_mms.py``): a manufactured steady
solution with non-trivial bathymetry / Coriolis / advection is forced by
symbolically-derived source terms; a wrong coefficient in ANY term breaks
the observed convergence order even if it would not change it.  Sources
are derived with sympy at import time (the reference checks in the
generated expressions; deriving them in-process keeps them in sync with
the term definitions by construction)."""
import numpy as np
import jax.numpy as jnp
import pytest
import sympy as sp
from scipy import stats

from thetis_tpu import (
    RectangleMesh,
    FunctionSpace,
    Function,
    solver2d,
    physical_constants,
)

G = float(physical_constants["g_grav"])
LX = LY = 1.0e4
H0 = 10.0
F0 = 1.0e-3
NU0 = 50.0


def _derive(case):
    """Symbolic manufactured solution + sources for the nonconservative
    SWE momentum/continuity system (reference sign convention
    d(u)/dt = R; sources cancel the steady residual)."""
    x, y = sp.symbols("x y", real=True)
    lx, ly = LX, LY
    h = H0 * sp.sqrt(0.3 * x**2 + 0.2 * y**2 + 0.1) / lx + 4.0
    eta = sp.cos(sp.pi * (3.0 * x + 1.0 * y) / lx)
    u = sp.sin(sp.pi * (-2.0 * x + 1.0 * y) / lx)
    v = 0.5 * sp.sin(sp.pi * (-3.0 * x + 1.0 * y) / lx)
    f = F0 * sp.cos(sp.pi * (x + y) / lx) if case == "coriolis" else 0
    nu = NU0 * (1.0 + x / lx) if case == "viscosity" else 0

    H = h + eta
    # momentum residual terms (R_uv = -adv - g grad(eta) + (f v, -f u)
    # + div(nu grad uv)); the steady source is their negation
    src_u = (u * u.diff(x) + v * u.diff(y)) + G * eta.diff(x) - f * v
    src_v = (u * v.diff(x) + v * v.diff(y)) + G * eta.diff(y) + f * u
    if case == "viscosity":
        src_u -= (nu * u.diff(x)).diff(x) + (nu * u.diff(y)).diff(y)
        src_v -= (nu * v.diff(x)).diff(x) + (nu * v.diff(y)).diff(y)
    src_eta = (H * u).diff(x) + (H * v).diff(y)

    syms = (x, y)
    return {
        "bath": sp.lambdify(syms, h, "numpy"),
        "elev": sp.lambdify(syms, eta, "numpy"),
        "u": sp.lambdify(syms, u, "numpy"),
        "v": sp.lambdify(syms, v, "numpy"),
        "coriolis": sp.lambdify(syms, f, "numpy") if case == "coriolis" else None,
        "viscosity": sp.lambdify(syms, nu, "numpy") if case == "viscosity" else None,
        "src_u": sp.lambdify(syms, src_u, "numpy"),
        "src_v": sp.lambdify(syms, src_v, "numpy"),
        "src_eta": sp.lambdify(syms, src_eta, "numpy"),
    }


_CASES = {c: _derive(c) for c in ("basic", "coriolis", "viscosity")}


def _run_swe(nx, case):
    d = _CASES[case]
    mesh2d = RectangleMesh(nx, nx, LX, LY)
    xv, yv = mesh2d.coords_np[:, 0], mesh2d.coords_np[:, 1]
    xd = mesh2d.coords_np[mesh2d.cells_np]  # (nc, 3, 2) P1DG nodes

    P1 = FunctionSpace(mesh2d, "CG", 1)
    bath = Function(P1)
    bath.data = jnp.asarray(d["bath"](xv, yv))

    so = solver2d.FlowSolver2d(mesh2d, bath)
    o = so.options
    # pseudo-time march to the discrete steady state: theta = 1 damps the
    # transients, open (elev+uv) boundaries radiate them out
    o.swe_timestepper_type = "BackwardEuler"
    o.swe_timestepper_options.use_semi_implicit_linearization = True
    c = np.sqrt(G * (float(np.asarray(bath.data).max()) + 1.0))
    o.timestep = 0.5 * (LX / nx) / c * 8.0
    n_steps = 240
    o.simulation_export_time = o.timestep * n_steps
    o.simulation_end_time = o.timestep * n_steps - 1e-6
    o.no_exports = True
    o.use_lax_friedrichs_velocity = True
    if d["coriolis"] is not None:
        cor = Function(P1)
        cor.data = jnp.asarray(d["coriolis"](xv, yv))
        o.coriolis_frequency = cor
    if d["viscosity"] is not None:
        nu = Function(P1)
        nu.data = jnp.asarray(np.broadcast_to(
            d["viscosity"](xv, yv), xv.shape))
        o.horizontal_viscosity = nu
        o.use_grad_depth_viscosity_term = False

    # sources at P1DG nodes
    s_u = d["src_u"](xd[..., 0], xd[..., 1])
    s_v = d["src_v"](xd[..., 0], xd[..., 1])
    o.momentum_source_2d = jnp.asarray(
        np.stack([np.broadcast_to(s_u, xd.shape[:2]),
                  np.broadcast_to(s_v, xd.shape[:2])], axis=-1))
    o.volume_source_2d = jnp.asarray(
        np.broadcast_to(d["src_eta"](xd[..., 0], xd[..., 1]), xd.shape[:2]))

    elev_b = Function(P1)
    elev_b.data = jnp.asarray(d["elev"](xv, yv))
    uv_b = Function(FunctionSpace(mesh2d, "CG", 1, dim=2))
    uv_b.data = jnp.asarray(np.stack(
        [np.broadcast_to(d["u"](xv, yv), xv.shape),
         np.broadcast_to(d["v"](xv, yv), xv.shape)], axis=-1))
    so.bnd_functions["shallow_water"] = {
        m: {"elev": elev_b, "uv": uv_b} for m in (1, 2, 3, 4)
    }

    eta_exact = d["elev"](xd[..., 0], xd[..., 1])
    uv_exact = np.stack(
        [np.broadcast_to(d["u"](xd[..., 0], xd[..., 1]), xd.shape[:2]),
         np.broadcast_to(d["v"](xd[..., 0], xd[..., 1]), xd.shape[:2])],
        axis=-1)
    so.assign_initial_conditions(elev=jnp.asarray(eta_exact),
                                 uv=jnp.asarray(uv_exact))
    so.iterate()
    eta = np.asarray(so.fields.elev_2d.data)
    uv = np.asarray(so.fields.uv_2d.data)
    area = np.sqrt(LX * LY)
    err_eta = float(so.asm.norm_l2(jnp.asarray(eta - eta_exact))) / area
    err_uv = float(so.asm.norm_l2(jnp.asarray(uv - uv_exact))) / area
    return err_eta, err_uv


@pytest.mark.slow
@pytest.mark.parametrize("case", ["basic", "coriolis", "viscosity"])
def test_swe_steady_mms_convergence(case):
    """Order >= ~2 for elevation and velocity on refinement ladder
    (reference slope_rtol = 0.2, ``test_steady_state_basin_mms.py``)."""
    ns = [8, 16, 32]
    errs = [_run_swe(n, case) for n in ns]
    h = np.log([LX / n for n in ns])
    for i, fieldname in enumerate(["elev", "uv"]):
        e = np.log([er[i] for er in errs])
        slope = stats.linregress(h, e).slope
        expected = 2.0
        assert slope > expected * (1 - 0.25), (
            f"{case}/{fieldname}: slope {slope} < {expected}"
        )
