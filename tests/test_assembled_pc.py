"""Assembled block-sparse wave PC: the color-probed 1-ring blocks must
reproduce the linearized wave-system Jacobian exactly, and the PC must be
a near-inverse of it (the reference analogue assembles the Jacobian /
Schur complement for PETSc fieldsplit or ``AssembledSchurPC``,
``assembledschur.py:24-75``)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from types import SimpleNamespace

from thetis_tpu.mesh.generation import RectangleMesh, PeriodicRectangleMesh
from thetis_tpu.fem.functionspace import FunctionSpace
from thetis_tpu.fem.assembly import DGAssembler
from thetis_tpu.equations.shallowwater_2d import (
    ShallowWaterEquations, ModeSplit2DEquations, swe_state,
)
from thetis_tpu.solvers.assembled import (
    AssembledWavePC, cell_ring, distance2_coloring,
)

_WAVE = frozenset(["ExternalPressureGradientTerm", "HUDivTerm"])


def _opts(**kw):
    d = dict(
        use_nonlinear_equations=True,
        use_wetting_and_drying=False,
        use_lax_friedrichs_velocity=True,
        use_grad_div_viscosity_term=False,
        use_grad_depth_viscosity_term=False,
        sipg_factor=1.0,
        norm_smoother=0.0,
    )
    d.update(kw)
    return SimpleNamespace(**d)


def _make(periodic=False, bnd=None, eq_cls=ModeSplit2DEquations,
          nx=6, ny=5, lx=1e4, ly=8e3):
    if periodic:
        mesh = PeriodicRectangleMesh(nx, ny, lx, ly, direction="x")
    else:
        mesh = RectangleMesh(nx, ny, lx, ly)
    V = FunctionSpace(mesh, "DG", 1)
    asm = DGAssembler(mesh, V)
    eq = eq_cls(mesh, asm, _opts(), bathymetry=20.0,
                bnd_conditions=bnd or {})
    return mesh, asm, eq


def _wave_jacobian(eq, dt, theta, lin_state, bnd_values):
    """Matrix-free linearized wave system M u - theta dt R_wave(u)."""
    c = theta * dt

    def F(st):
        r = eq.residual(_WAVE, st, lin_state, {}, {}, bnd_values)
        m = eq.mass_term(st)
        return {"uv": m["uv"] - c * r["uv"], "elev": m["elev"] - c * r["elev"]}

    _, J = jax.linearize(F, lin_state)
    return J


def test_coloring_is_distance2_proper():
    mesh, _, _ = _make()
    ring, valid = cell_ring(mesh)
    colors = distance2_coloring(ring, valid)
    nc = ring.shape[0]
    for c in range(nc):
        members = [ring[c, s] for s in range(4) if valid[c, s]]
        cols = [colors[m] for m in members]
        assert len(set(cols)) == len(cols), f"ring of {c} shares a color"
    assert colors.max() + 1 <= 12


@pytest.mark.parametrize("periodic", [False, True])
def test_assembled_matches_linearized(periodic):
    mesh, asm, eq = _make(periodic)
    rng = np.random.default_rng(42)
    lin_state = swe_state(
        jnp.zeros((mesh.nc, 3, 2)), jnp.zeros((mesh.nc, 3))
    )
    dt, theta = 30.0, 0.5
    pc = AssembledWavePC(eq, dt, theta, lin_state)
    J = _wave_jacobian(eq, dt, theta, lin_state, {})
    x = swe_state(jnp.asarray(rng.standard_normal((mesh.nc, 3, 2))),
                  jnp.asarray(rng.standard_normal((mesh.nc, 3))))
    want = J(x)
    got = pc._unpack(pc._W(pc._pack(x)))
    np.testing.assert_allclose(np.asarray(got["uv"]),
                               np.asarray(want["uv"]), rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got["elev"]),
                               np.asarray(want["elev"]), rtol=1e-12, atol=1e-9)


def test_assembled_with_open_boundaries():
    """Open-boundary Riemann linearization must land in the blocks too."""
    bnd = {1: {"elev": 0.3}, 2: {"un": 0.1}}
    mesh, asm, eq = _make(False, bnd=bnd, eq_cls=ShallowWaterEquations)
    lin_state = swe_state(
        jnp.zeros((mesh.nc, 3, 2)), jnp.zeros((mesh.nc, 3))
    )
    bv = {1: {"elev": 0.3}, 2: {"un": 0.1}}
    pc = AssembledWavePC(eq, 30.0, 0.5, lin_state, bnd_values=bv)
    J = _wave_jacobian(eq, 30.0, 0.5, lin_state, bv)
    rng = np.random.default_rng(3)
    x = swe_state(jnp.asarray(rng.standard_normal((mesh.nc, 3, 2))),
                  jnp.asarray(rng.standard_normal((mesh.nc, 3))))
    want = J(x)
    got = pc._unpack(pc._W(pc._pack(x)))
    np.testing.assert_allclose(np.asarray(got["uv"]),
                               np.asarray(want["uv"]), rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got["elev"]),
                               np.asarray(want["elev"]), rtol=1e-12, atol=1e-9)


@pytest.mark.parametrize("periodic", [False, True])
def test_assembled_cn_matches_matrixfree_cn(periodic):
    """Semi-implicit CN stepped with the assembled-Jacobian KSP must
    reproduce the matrix-free Newton-FGMRES solution to Krylov
    tolerance."""
    from thetis_tpu.timeintegration.steppers import CrankNicolson
    from thetis_tpu.solvers.newton import NewtonParameters

    mesh, asm, eq = _make(periodic, eq_cls=ShallowWaterEquations)
    rng = np.random.default_rng(11)
    x = mesh.coords_np[mesh.cells_np]
    sol0 = swe_state(
        jnp.zeros((mesh.nc, 3, 2)),
        jnp.asarray(0.05 * np.sin(np.pi * x[..., 0] / 1e4)),
    )
    fields = {"lax_friedrichs_velocity_scaling_factor": jnp.asarray(1.0),
              "quadratic_drag_coefficient": jnp.asarray(2.5e-3)}
    dt = 60.0
    tight = NewtonParameters(ksp_rtol=1e-12, ksp_max_it=400,
                             gmres_restart=40)
    st_mf = CrankNicolson(eq, dt, semi_implicit=True,
                          solver_parameters=tight)
    st_as = CrankNicolson(eq, dt, semi_implicit=True, assembled_solve=True,
                          solver_parameters=tight)
    a = sol0
    b = sol0
    for _ in range(3):
        a = st_mf.advance(0.0, a, fields, fields, {})
        b = st_as.advance(0.0, b, fields, fields, {})
    np.testing.assert_allclose(np.asarray(b["elev"]), np.asarray(a["elev"]),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(b["uv"]), np.asarray(a["uv"]),
                               rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("cfl_dt,bound", [(60.0, 1e-3), (600.0, 0.3)])
def test_pc_is_near_inverse(cfl_dt, bound):
    """PC(W x) ~ x — this is what makes the outer FGMRES converge in a
    handful of iterations (on an anisotropic mesh, where the Riemann
    jump penalties dominate the diagonal blocks).  At very large wave
    CFL the one-level block-Jacobi inner solve degrades gracefully (a
    0.3-quality PC still contracts the outer Krylov per iteration)."""
    mesh, asm, eq = _make(False, eq_cls=ShallowWaterEquations,
                          nx=24, ny=2, lx=5e3, ly=1e3)
    lin_state = swe_state(
        jnp.zeros((mesh.nc, 3, 2)), jnp.zeros((mesh.nc, 3))
    )
    pc = AssembledWavePC(eq, cfl_dt, 0.5, lin_state,
                         inner_iterations=40)
    rng = np.random.default_rng(7)
    x = swe_state(jnp.asarray(rng.standard_normal((mesh.nc, 3, 2))),
                  jnp.asarray(rng.standard_normal((mesh.nc, 3))))
    w = pc._W(pc._pack(x))
    y = pc._solve(w)
    rel = float(jnp.linalg.norm(y - pc._pack(x))
                / jnp.linalg.norm(pc._pack(x)))
    assert rel < bound, rel


@pytest.mark.parametrize("visc,wd,periodic,modesplit", [
    (True, False, False, False), (False, True, False, False),
    (False, False, True, False), (False, False, False, True),
])
def test_analytic_blocks_match_probing(visc, wd, periodic, modesplit):
    """The value-space analytic assembler (``equations/swe_blocks.py``)
    must reproduce the color-probed semi-implicit operator blocks to
    machine precision — every term, every BC type, every ring slot."""
    from thetis_tpu.solvers.assembled import (
        PackedState, assemble_affine_operator,
    )
    from thetis_tpu.equations.swe_blocks import assemble_swe_blocks

    bnd = None if periodic else {
        1: {"elev": 0.3}, 2: {"un": 0.2}, 3: {"flux": -150.0},
        4: {"drag": 2.5e-3},
    }
    eq_cls = ModeSplit2DEquations if modesplit else ShallowWaterEquations
    mesh, asm, eq = _make(periodic, bnd=bnd, eq_cls=eq_cls, nx=8, ny=4)
    if wd:
        eq.depth.use_wetting_and_drying = True
        eq.depth.wetting_and_drying_alpha = 0.4
    rng = np.random.default_rng(3)
    state = swe_state(jnp.asarray(rng.normal(0, 0.3, (mesh.nc, 3, 2))),
                      jnp.asarray(rng.normal(0, 0.2, (mesh.nc, 3))))
    fields = {
        "lax_friedrichs_velocity_scaling_factor": jnp.asarray(1.0),
        "quadratic_drag_coefficient": jnp.asarray(2.5e-3),
        "coriolis": jnp.asarray(rng.normal(0, 1e-4, (mesh.nv,))),
    }
    if visc:
        fields["viscosity_h"] = jnp.asarray(5.0)
        eq.options.use_grad_depth_viscosity_term = True
    bnd_values = bnd or {}
    dt, th = 40.0, 0.55
    ps = PackedState(state)

    def F(x):
        st = ps.unpack(x)
        r = eq.residual("all", st, state, fields, fields, bnd_values)
        m = eq.mass_term(st)
        return ps.pack(swe_state(m["uv"] - th * dt * r["uv"],
                                 m["elev"] - th * dt * r["elev"]))

    blocks_probe, _ = jax.jit(
        lambda x: assemble_affine_operator(F, x, mesh))(ps.pack(state))
    blocks_ana = assemble_swe_blocks(eq, state, fields, bnd_values, th * dt)
    scale = float(jnp.abs(blocks_probe).max())
    np.testing.assert_allclose(np.asarray(blocks_ana),
                               np.asarray(blocks_probe),
                               rtol=5e-13, atol=5e-13 * scale)
