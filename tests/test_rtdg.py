"""rt-dg element family: lowest-order Raviart-Thomas velocity x P0
elevation (ref ``solver2d.py:307-336``): H(div) exactness unit checks,
a standing wave retaining amplitude and converging, exact mass
conservation, and a forced channel reaching the expected balance."""
import math

import numpy as np
import jax.numpy as jnp

from thetis_tpu import RectangleMesh, FunctionSpace, physical_constants
from thetis_tpu.fem.assembly import DGAssembler
from thetis_tpu.fem.rt import RTSpace
from thetis_tpu.equations.shallowwater_rtdg import ShallowWaterEquationsRTDG
from thetis_tpu.timeintegration.steppers import CrankNicolson
from thetis_tpu.solvers.newton import NewtonParameters

from types import SimpleNamespace


def make_eq(mesh, depth, bnd=None, nonlin=True):
    V = FunctionSpace(mesh, "DG", 1)
    asm = DGAssembler(mesh, V)
    rt = RTSpace(mesh, asm)
    opts = SimpleNamespace(use_nonlinear_equations=nonlin,
                           use_wetting_and_drying=False)
    eq = ShallowWaterEquationsRTDG(mesh, asm, rt, opts, depth,
                                   bnd_conditions=bnd or {})
    return eq, rt


def test_rt_exactness():
    """RT1 interpolates constant + linear radial fields exactly; the
    divergence of the interpolant matches pointwise."""
    mesh = RectangleMesh(6, 5, 3.0, 2.0)
    eq, rt = make_eq(mesh, 10.0)
    nrm = np.asarray(mesh.facet_normal_np)
    fv = np.asarray(mesh.facet_verts_np)
    mids = 0.5 * (mesh.coords_np[fv[:, 0]] + mesh.coords_np[fv[:, 1]])
    U = jnp.asarray((mids * nrm).sum(1))  # u = (x, y)
    assert float(jnp.abs(rt.cell_div(U) - 2.0).max()) < 1e-12
    uq = np.asarray(rt.cell_values(U))
    assert np.isfinite(uq).all()


def run_standing_wave_rtdg(nx, timesteps):
    lx, ly = 5e3, 1e3
    depth = 100.0
    g = float(physical_constants["g_grav"])
    c = math.sqrt(g * depth)
    period = 2 * lx / c
    dt = period / timesteps
    mesh = RectangleMesh(nx, 2, lx, ly)
    eq, rt = make_eq(mesh, depth)

    amp = 0.01  # linear regime (the reference's convergence amplitude)
    mids = np.asarray(mesh.cell_midpoints())
    eta0 = amp * np.cos(np.pi * mids[:, 0] / lx)[:, None]
    state = {"uv": jnp.zeros(mesh.nf), "elev": jnp.asarray(eta0)}
    stepper = CrankNicolson(
        eq, dt, semi_implicit=True,
        solver_parameters=NewtonParameters(ksp_rtol=1e-10, ksp_max_it=120,
                                           gmres_restart=30),
    )
    import jax

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def advance_n(s, n):
        return jax.lax.scan(
            lambda carry, _: (stepper.advance(0.0, carry, {}, {}, {}), None),
            s, None, length=n)[0]

    vol0 = float((np.asarray(mesh.cell_area_np)
                  * np.asarray(state["elev"][:, 0])).sum())
    state = advance_n(state, timesteps)
    vol1 = float((np.asarray(mesh.cell_area_np)
                  * np.asarray(state["elev"][:, 0])).sum())
    err = float(eq.norm_elev(state["elev"] - jnp.asarray(eta0)))
    rel = err / math.sqrt(lx * ly) / amp
    return rel, abs(vol1 - vol0)


def test_rtdg_standing_wave():
    rel, dvol = run_standing_wave_rtdg(nx=100, timesteps=40)
    print(f"rt-dg standing wave rel_err={rel:.4e}")
    assert dvol < 1e-6, "mass not conserved"
    assert rel < 0.025, f"standing wave lost: {rel}"
    # first-order convergence: halving dx and dt roughly halves the error
    rel2, _ = run_standing_wave_rtdg(nx=50, timesteps=20)
    assert rel < 0.65 * rel2, (rel, rel2)


def test_rtdg_forced_channel():
    """Elevation head difference across a channel with quadratic drag:
    flow develops toward the low end and reaches a bounded steady
    magnitude ~ sqrt(g H dEta / (Cd L) * H)."""
    lx, ly = 10e3, 2e3
    depth = 20.0
    mesh = RectangleMesh(25, 4, lx, ly)
    bnd = {1: {"elev": 0.5}, 2: {"elev": -0.5}}
    eq, rt = make_eq(mesh, depth, bnd=bnd)
    fields = {"quadratic_drag_coefficient": jnp.asarray(2.5e-3)}
    dt = 100.0
    stepper = CrankNicolson(
        eq, dt, semi_implicit=True,
        solver_parameters=NewtonParameters(ksp_rtol=1e-9, ksp_max_it=120,
                                           gmres_restart=30),
    )
    import jax

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def advance_n(s, n):
        return jax.lax.scan(
            lambda carry, _: (
                stepper.advance(0.0, carry, fields, fields, bnd), None),
            s, None, length=n)[0]

    state = {"uv": jnp.zeros(mesh.nf),
             "elev": jnp.zeros((mesh.nc, 1))}
    state = advance_n(state, 200)  # ~5.5 h, enough to settle
    assert bool(jnp.isfinite(state["uv"]).all())
    assert bool(jnp.isfinite(state["elev"]).all())
    # interior u along +x
    nrm = np.asarray(mesh.facet_normal_np)
    U = np.asarray(state["uv"])
    x_facets = np.abs(nrm[:, 0]) > 0.9
    interior = ~np.asarray(mesh.facet_is_boundary_np)
    sel = x_facets & interior
    u_sel = U[sel] * np.sign(nrm[sel, 0])
    assert u_sel.mean() > 0.1, "flow should run down the head gradient"
    # friction balance scale: Cd u^2 / H = g dEta/L -> u ~ 2.8 m/s
    u_bal = math.sqrt(9.81 * 1.0 / lx * depth / 2.5e-3)
    assert abs(u_sel.mean() - u_bal) < 0.5 * u_bal, (
        f"u={u_sel.mean():.2f} vs balance {u_bal:.2f}"
    )


def test_rtdg_flowsolver():
    """element_family='rt-dg' through the full FlowSolver2d lifecycle:
    standing wave retains amplitude, volume conserved (ref
    ``solver2d.py:307-336``)."""
    from thetis_tpu import FunctionSpace as FS, Function, solver2d

    lx, ly, nx = 5e3, 1e3, 60
    depth = 100.0
    g = float(physical_constants["g_grav"])
    c = math.sqrt(g * depth)
    period = 2 * lx / c
    n = 40
    mesh2d = RectangleMesh(nx, 2, lx, ly)
    p1 = FS(mesh2d, "CG", 1)
    so = solver2d.FlowSolver2d(mesh2d, Function(p1).assign(depth))
    o = so.options
    o.element_family = "rt-dg"
    o.polynomial_degree = 0
    o.timestep = period / n
    o.simulation_export_time = period
    o.simulation_end_time = period - 0.1 * period / n
    o.no_exports = True
    o.swe_timestepper_type = "CrankNicolson"
    so.create_function_spaces()
    amp = 0.01
    mids = np.asarray(mesh2d.cell_midpoints())
    eta0 = amp * np.cos(np.pi * mids[:, 0] / lx)[:, None]
    so.assign_initial_conditions(elev=jnp.asarray(eta0),
                                 uv=np.asarray([0.0, 0.0]))
    so.initialize()
    v0 = so.compute_volume_2d()
    so.iterate()
    v1 = so.compute_volume_2d()
    assert abs(v1 - v0) < 1e-6 * abs(v0)
    rel = float(so.eq_sw.norm_elev(
        so.fields.elev_2d.data - jnp.asarray(eta0)
    )) / math.sqrt(lx * ly) / amp
    print(f"rt-dg FlowSolver2d standing wave rel_err={rel:.4f}")
    assert rel < 0.05, rel


def test_bdm_exactness():
    """BDM1 interpolates linear vector fields exactly (incl. ones outside
    RT1: u = (y, 0)); divergence and mass are consistent."""
    from thetis_tpu.fem.bdm import BDMSpace

    mesh = RectangleMesh(5, 4, 2.0, 1.5)
    V = FunctionSpace(mesh, "DG", 1)
    asm = DGAssembler(mesh, V)
    bdm = BDMSpace(mesh, asm)
    nrm = np.asarray(mesh.facet_normal_np)
    fv = np.asarray(mesh.facet_verts_np)
    coords = mesh.coords_np

    def proj(ufun):
        vals = ufun(coords)  # (nv, 2)
        return jnp.asarray(np.stack(
            [(vals[fv[:, 0]] * nrm).sum(-1),
             (vals[fv[:, 1]] * nrm).sum(-1)], axis=-1))

    # u = (y, x): in BDM1 but NOT in RT1 (non-radial linear part)
    U = proj(lambda x: np.stack([x[:, 1], x[:, 0]], axis=-1))
    qp = np.asarray(asm.space._tab_np["qp"])
    cells = mesh.cells_np
    p0 = coords[cells[:, 0]]
    J = np.stack([coords[cells[:, 1]] - p0, coords[cells[:, 2]] - p0],
                 axis=2)
    xq = p0[:, None, :] + np.einsum("cij,qj->cqi", J, qp)
    exact = np.stack([xq[..., 1], xq[..., 0]], axis=-1)
    uq = np.asarray(bdm.cell_values(U))
    assert np.abs(uq - exact).max() < 1e-12
    assert np.abs(np.asarray(bdm.cell_div(U))).max() < 1e-12

    # u = (x, y): div = 2
    U2 = proj(lambda x: x)
    assert np.abs(np.asarray(bdm.cell_div(U2)) - 2.0).max() < 1e-12
    # mass inverse roundtrip
    r = bdm.mass_apply(U2)
    Ui = np.asarray(bdm.mass_inverse(r))
    assert np.abs(Ui - np.asarray(U2)).max() < 1e-8
    # facet normal trace continuity: traces from both sides dotted with
    # n_f equal the linear interpolant of the endpoint dofs
    tr = np.asarray(bdm.facet_traces(U))
    un = (tr * nrm[:, None, None, :]).sum(-1)       # (nf, 2, nqf)
    un_own = np.asarray(bdm.facet_un_quad(U))
    assert np.abs(un - un_own[:, None, :]).max() < 1e-12


def test_bdmdg_flowsolver_standing_wave():
    """element_family='bdm-dg' through FlowSolver2d: standing wave
    retained, volume conserved."""
    from thetis_tpu import FunctionSpace as FS, Function, solver2d

    lx, ly, nx = 5e3, 1e3, 60
    depth = 100.0
    g = float(physical_constants["g_grav"])
    c = math.sqrt(g * depth)
    period = 2 * lx / c
    n = 40
    mesh2d = RectangleMesh(nx, 2, lx, ly)
    p1 = FS(mesh2d, "CG", 1)
    so = solver2d.FlowSolver2d(mesh2d, Function(p1).assign(depth))
    o = so.options
    o.element_family = "bdm-dg"
    o.polynomial_degree = 0
    o.timestep = period / n
    o.simulation_export_time = period
    o.simulation_end_time = period - 0.1 * period / n
    o.no_exports = True
    o.swe_timestepper_type = "CrankNicolson"
    so.create_function_spaces()
    amp = 0.01
    mids = np.asarray(mesh2d.cell_midpoints())
    eta0 = amp * np.cos(np.pi * mids[:, 0] / lx)[:, None]
    so.assign_initial_conditions(elev=jnp.asarray(eta0),
                                 uv=np.asarray([0.0, 0.0]))
    so.initialize()
    v0 = so.compute_volume_2d()
    so.iterate()
    v1 = so.compute_volume_2d()
    assert abs(v1 - v0) < 1e-6 * abs(v0)
    rel = float(so.eq_sw.norm_elev(
        so.fields.elev_2d.data - jnp.asarray(eta0)
    )) / math.sqrt(lx * ly) / amp
    print(f"bdm-dg standing wave rel_err={rel:.4f}")
    assert rel < 0.05, rel
