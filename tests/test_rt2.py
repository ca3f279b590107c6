"""RT2 x P1DG shallow-water pair (the reference's default rt-dg member,
``solver2d.py:329-336`` with ``polynomial_degree = 1``): element
exactness, standing-wave convergence one order above RT1 x P0, and
exact mass conservation."""
import math

from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thetis_tpu import RectangleMesh, FunctionSpace, physical_constants
from thetis_tpu.fem.assembly import DGAssembler
from thetis_tpu.fem.rt2 import RT2Space
from thetis_tpu.equations.shallowwater_rt2 import ShallowWaterEquationsRT2DG
from thetis_tpu.timeintegration.steppers import CrankNicolson
from thetis_tpu.solvers.newton import NewtonParameters


def make_eq(mesh, depth, bnd=None, nonlin=True):
    V = FunctionSpace(mesh, "DG", 1, quad_degree=5)
    asm = DGAssembler(mesh, V)
    rt = RT2Space(mesh, asm)
    opts = SimpleNamespace(use_nonlinear_equations=nonlin,
                           use_wetting_and_drying=False)
    eq = ShallowWaterEquationsRT2DG(mesh, asm, rt, opts, depth,
                                    bnd_conditions=bnd or {})
    return eq, rt, asm


def test_rt2_exactness():
    """RT2 interpolates linear fields exactly (incl. div and traces)."""
    mesh = RectangleMesh(6, 5, 3.0, 2.0)
    eq, rt, asm = make_eq(mesh, 10.0)
    U = rt.project_vector(
        lambda x, y: np.stack([0.3 + x - 2 * y, 1.0 + 0.5 * x + y],
                              axis=-1))
    assert float(jnp.abs(rt.cell_div_q(U) - 2.0).max()) < 1e-10
    tr = np.asarray(rt.facet_traces(U))
    n = np.asarray(mesh.facet_normal_np)[:, None, :]
    mi = ~np.asarray(mesh.facet_is_boundary_np)
    jump = ((tr[:, 0] - tr[:, 1]) * n).sum(-1)[mi]
    assert np.abs(jump).max() < 1e-10


def run_standing_wave(nx, degree_pair):
    lx, ly = 5e3, 1e3
    depth = 100.0
    g = float(physical_constants["g_grav"])
    c = math.sqrt(g * depth)
    period = 2 * lx / c
    t_end = period / 10.0
    nsteps = 4 * nx
    dt = t_end / nsteps
    mesh = RectangleMesh(nx, 2, lx, ly)
    amp = 0.01

    if degree_pair == "rt2":
        eq, rt, asm = make_eq(mesh, depth, nonlin=False)
        k = math.pi / lx
        P1DG = asm.space
        from thetis_tpu.fem.functionspace import Function

        eta0 = Function(
            FunctionSpace(mesh, "DG", 1, quad_degree=5)).interpolate(
                lambda x, y: amp * np.cos(k * x)).data
        state = {"uv": jnp.zeros(rt.ndofs), "elev": eta0}
        norm = eq.norm_elev
    else:  # rt1
        from thetis_tpu.fem.rt import RTSpace
        from thetis_tpu.equations.shallowwater_rtdg import (
            ShallowWaterEquationsRTDG,
        )

        V = FunctionSpace(mesh, "DG", 1)
        asm = DGAssembler(mesh, V)
        rt = RTSpace(mesh, asm)
        opts = SimpleNamespace(use_nonlinear_equations=False,
                               use_wetting_and_drying=False)
        eq = ShallowWaterEquationsRTDG(mesh, asm, rt, opts, depth,
                                       bnd_conditions={})
        mids = np.asarray(mesh.cell_midpoints())
        eta0 = amp * np.cos(np.pi * mids[:, 0] / lx)[:, None]
        state = {"uv": jnp.zeros(mesh.nf), "elev": jnp.asarray(eta0)}
        norm = eq.norm_elev

    stepper = CrankNicolson(
        eq, dt, semi_implicit=True,
        solver_parameters=NewtonParameters(ksp_rtol=1e-10, ksp_max_it=400,
                                           gmres_restart=40),
    )

    def step(s, _):
        return stepper.advance(0.0, s, {}, {}, {}), None

    final, _ = jax.jit(
        lambda s: jax.lax.scan(step, s, None, length=nsteps))(state)

    omega = c * math.pi / lx
    if degree_pair == "rt2":
        from thetis_tpu.fem.functionspace import Function

        k = math.pi / lx
        exact = Function(
            FunctionSpace(mesh, "DG", 1, quad_degree=5)).interpolate(
                lambda x, y: amp * np.cos(k * x)
                * math.cos(omega * t_end)).data
        err = float(asm.norm_l2(final["elev"] - exact))
    else:
        mids = np.asarray(mesh.cell_midpoints())
        exact = (amp * np.cos(np.pi * mids[:, 0] / lx)
                 * math.cos(omega * t_end))[:, None]
        err = float(norm(final["elev"] - jnp.asarray(exact)))
    return err / math.sqrt(lx * ly)


def test_rt2_standing_wave_order():
    errs = [run_standing_wave(nx, "rt2") for nx in (8, 16, 32)]
    slopes = [math.log2(errs[i] / errs[i + 1]) for i in range(2)]
    print("rt2 errs", errs, "slopes", slopes)
    assert min(slopes) > 1.5


def test_rt2_beats_rt1():
    e1 = run_standing_wave(16, "rt1")
    e2 = run_standing_wave(16, "rt2")
    print("rt1", e1, "rt2", e2)
    assert e2 < 0.35 * e1


def test_bdm2_exactness():
    """BDM2 = full (P2)^2: quadratic fields interpolate exactly; the
    H(div) normal trace is continuous; the mass solve round-trips."""
    from thetis_tpu.fem.bdm2 import BDM2Space

    mesh = RectangleMesh(7, 4, 3.0, 2.0)
    V = FunctionSpace(mesh, "DG", 1, quad_degree=5)
    asm = DGAssembler(mesh, V)
    bd = BDM2Space(mesh, asm)
    U = bd.project_vector(
        lambda x, y: np.stack([x * x - 0.5 * y * y + x, x * y + y],
                              axis=-1))
    qp = np.asarray(V._tab_np["qp"])
    verts = mesh.coords_np[mesh.cells_np]
    lam = np.stack([1 - qp[:, 0] - qp[:, 1], qp[:, 0], qp[:, 1]], axis=1)
    xy = np.einsum("qd,cdi->cqi", lam, verts)
    exact = np.stack([xy[..., 0] ** 2 - 0.5 * xy[..., 1] ** 2 + xy[..., 0],
                      xy[..., 0] * xy[..., 1] + xy[..., 1]], axis=-1)
    assert np.abs(np.asarray(bd.cell_values(U)) - exact).max() < 1e-10
    tr = np.asarray(bd.facet_traces(U))
    n = np.asarray(mesh.facet_normal_np)[:, None, :]
    mi = ~np.asarray(mesh.facet_is_boundary_np)
    assert np.abs(((tr[:, 0] - tr[:, 1]) * n).sum(-1)[mi]).max() < 1e-10
    U2 = bd.mass_inverse(bd.mass_apply(U))
    assert float(jnp.abs(U2 - U).max() / jnp.abs(U).max()) < 1e-10


@pytest.mark.parametrize("family", ["rt-dg", "bdm-dg"])
def test_rt2_facade(family):
    """RT2/BDM2 x P1DG through the FlowSolver2d facade
    (polynomial_degree=1 — the reference's default H(div)
    configuration)."""
    from thetis_tpu import Function, solver2d

    lx, ly = 5e3, 1e3
    depth = 100.0
    g = float(physical_constants["g_grav"])
    c = math.sqrt(g * depth)
    period = 2 * lx / c
    mesh2d = RectangleMesh(16, 2, lx, ly)
    p1 = FunctionSpace(mesh2d, "CG", 1)
    s = solver2d.FlowSolver2d(mesh2d, Function(p1).assign(depth))
    o = s.options
    o.element_family = family
    o.polynomial_degree = 1
    o.swe_timestepper_type = "CrankNicolson"
    o.timestep = period / 64
    o.simulation_export_time = period / 4
    o.simulation_end_time = period / 2 - 1e-3
    o.no_exports = True
    s.create_function_spaces()
    amp = 0.01
    k = math.pi / lx
    eta0 = Function(s.function_spaces.H_2d).interpolate(
        lambda x, y: amp * np.cos(k * x))
    s.assign_initial_conditions(elev=eta0)
    s.iterate()
    # half a period: eta ~ -eta0; amplitude retained within a few %
    e = s.fields.elev_2d.data
    err = float(s.asm.norm_l2(e + eta0.data)) / float(s.asm.norm_l2(eta0.data))
    assert err < 0.1
    assert bool(jnp.isfinite(s.fields.uv_2d.data).all())


def test_rt2_mass_conservation():
    """Total volume is exactly conserved by the conservative facet
    flux (closed domain)."""
    mesh = RectangleMesh(10, 4, 2e3, 1e3)
    eq, rt, asm = make_eq(mesh, 50.0)
    from thetis_tpu.fem.functionspace import Function

    eta0 = Function(FunctionSpace(mesh, "DG", 1, quad_degree=5)).interpolate(
        lambda x, y: 0.5 * np.exp(-(((x - 1e3) / 300) ** 2))).data
    state = {"uv": jnp.zeros(rt.ndofs), "elev": eta0}
    dt = 5.0
    stepper = CrankNicolson(
        eq, dt, semi_implicit=True,
        solver_parameters=NewtonParameters(ksp_rtol=1e-12, ksp_max_it=400,
                                           gmres_restart=40),
    )

    def step(s, _):
        return stepper.advance(0.0, s, {}, {}, {}), None

    final, _ = jax.jit(
        lambda s: jax.lax.scan(step, s, None, length=20))(state)
    v0 = float(asm.integrate(eta0))
    v1 = float(asm.integrate(final["elev"]))
    assert abs(v1 - v0) < 1e-9 * max(1.0, abs(v0))
    assert bool(jnp.isfinite(final["uv"]).all())
