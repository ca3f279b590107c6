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
    # the component-major layout must be the exact transpose (it is the
    # native form the CN/DIRK steppers consume on stencil meshes)
    blocks_T = assemble_swe_blocks(eq, state, fields, bnd_values, th * dt,
                                   layout="T")
    np.testing.assert_array_equal(
        np.asarray(jnp.transpose(blocks_T, (3, 0, 1, 2))),
        np.asarray(blocks_ana))


def test_fieldsplit_pc_high_cfl_convergence():
    """The Schur fieldsplit PC (``solvers/fieldsplit.py``) must solve the
    assembled semi-implicit system at large wave CFL in a small fixed
    FGMRES budget — the regime where one-level block-Jacobi stalls (the
    reference runs fieldsplit/Schur KSPs in exactly this regime,
    ref ``options.py:44-48``)."""
    from thetis_tpu.solvers.assembled import (
        PackedState, assemble_affine_operator, get_coloring,
        batched_inv_small, ring_apply, _ring_solve_impl,
    )
    from thetis_tpu.solvers.fieldsplit import SchurFieldsplitPC

    mesh, asm, eq = _make(False, eq_cls=ShallowWaterEquations,
                          nx=24, ny=12, lx=1e5, ly=5e4)
    fields = {"lax_friedrichs_velocity_scaling_factor": jnp.asarray(1.0),
              "quadratic_drag_coefficient": jnp.asarray(2.5e-3)}
    zero = swe_state(jnp.zeros((mesh.nc, 3, 2)), jnp.zeros((mesh.nc, 3)))
    ps = PackedState(zero)
    c = np.sqrt(9.81 * 21.0)
    hmin = float(mesh.cell_hmin_np.min())
    dt = 24.0 * hmin / c  # wave CFL 24 (in min-altitude units)

    def Fw(x):
        st = ps.unpack(x)
        r = eq.residual("all", st, zero, fields, fields, {})
        m = eq.mass_term(st)
        return ps.pack(swe_state(m["uv"] - 0.5 * dt * r["uv"],
                                 m["elev"] - 0.5 * dt * r["elev"]))

    blocks, _ = jax.jit(
        lambda x: assemble_affine_operator(Fw, x, mesh))(ps.pack(zero))
    ring, _, _ = get_coloring(mesh)
    ring_j = jnp.asarray(ring)
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.standard_normal((mesh.nc, 9)))
    diag_inv = batched_inv_small(blocks[:, 0])

    def rel_resid(x):
        return float(jnp.linalg.norm(ring_apply(blocks, ring_j, x) - b)
                     / jnp.linalg.norm(b))

    fs = SchurFieldsplitPC(blocks, ring, mesh)
    x_fs, _, _ = _ring_solve_impl(blocks, ring_j, b, diag_inv, 1e-10,
                                  8, 4, fs)
    # one-level block-Jacobi with the same 32-iteration budget
    x_bj, _, _ = _ring_solve_impl(blocks, ring_j, b, diag_inv, 1e-10,
                                  8, 4, None)
    assert rel_resid(x_fs) < 5e-3, rel_resid(x_fs)
    assert rel_resid(x_fs) < 0.1 * rel_resid(x_bj), (
        rel_resid(x_fs), rel_resid(x_bj))


@pytest.mark.slow
def test_fieldsplit_cn_step_and_gradient():
    """CN stepping through ``ring_gmres`` with the fieldsplit PC must
    match the matrix-free solve, and reverse-mode AD must flow through
    the PC's transpose path (the implicit-function adjoint solve uses
    ``SchurFieldsplitPC.transpose()``)."""
    from thetis_tpu.timeintegration.steppers import CrankNicolson
    from thetis_tpu.solvers.newton import NewtonParameters
    from thetis_tpu.solvers.assembled import (
        PackedState, assemble_affine_operator, get_coloring,
    )
    from thetis_tpu.solvers.fieldsplit import SchurFieldsplitPC

    mesh, asm, eq = _make(False, eq_cls=ShallowWaterEquations,
                          nx=8, ny=4, lx=1e4, ly=5e3)
    fields = {"lax_friedrichs_velocity_scaling_factor": jnp.asarray(1.0),
              "quadratic_drag_coefficient": jnp.asarray(2.5e-3)}
    x = mesh.coords_np[mesh.cells_np]
    elev0 = jnp.asarray(0.05 * np.sin(np.pi * x[..., 0] / 1e4))
    sol0 = swe_state(jnp.zeros((mesh.nc, 3, 2)), elev0)
    dt = 200.0
    zero = swe_state(jnp.zeros((mesh.nc, 3, 2)), jnp.zeros((mesh.nc, 3)))
    ps = PackedState(zero)

    def Fw(xp):
        st = ps.unpack(xp)
        r = eq.residual("all", st, zero, fields, fields, {})
        m = eq.mass_term(st)
        return ps.pack(swe_state(m["uv"] - 0.5 * dt * r["uv"],
                                 m["elev"] - 0.5 * dt * r["elev"]))

    blocks, _ = jax.jit(
        lambda xp: assemble_affine_operator(Fw, xp, mesh))(ps.pack(zero))
    ring, _, _ = get_coloring(mesh)
    fs = SchurFieldsplitPC(blocks, ring, mesh)
    tight = NewtonParameters(ksp_rtol=1e-12, ksp_max_it=200,
                             gmres_restart=20)
    st_mf = CrankNicolson(eq, dt, semi_implicit=True,
                          solver_parameters=tight)
    st_fs = CrankNicolson(eq, dt, semi_implicit=True, assembled_solve=True,
                          coarse=fs, solver_parameters=tight)
    a = st_mf.advance(0.0, sol0, fields, fields, {})
    b = st_fs.advance(0.0, sol0, fields, fields, {})
    np.testing.assert_allclose(np.asarray(b["elev"]), np.asarray(a["elev"]),
                               rtol=1e-8, atol=1e-11)

    def loss(e0):
        out = st_fs.advance(0.0, swe_state(sol0["uv"], e0), fields, fields,
                            {})
        return jnp.sum(out["elev"] ** 2)

    g = jax.grad(loss)(elev0)
    # finite-difference check along a random direction
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal(elev0.shape))
    eps = 1e-5
    fd = (loss(elev0 + eps * v) - loss(elev0 - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), float(fd),
                               rtol=2e-5)


@pytest.mark.parametrize("periodic", [False, True])
def test_shift_stencil_matches_gather(periodic):
    """The DIA/shift-stencil ring matvec (``solvers/assembled.py::
    ShiftStencil``) must reproduce the gather formulation exactly —
    including boundary-mirror slots and the periodic seam."""
    from thetis_tpu.solvers.assembled import (
        cell_ring, get_stencil, ring_apply,
    )

    mesh, asm, eq = _make(periodic, nx=9, ny=5)
    ring, valid = cell_ring(mesh)
    st = get_stencil(mesh)
    assert st is not None
    rng = np.random.default_rng(8)
    blocks = jnp.asarray(rng.standard_normal((mesh.nc, 4, 5, 7)))
    blocks = blocks * jnp.asarray(valid, blocks.dtype)[:, :, None, None]
    x = jnp.asarray(rng.standard_normal((mesh.nc, 7)))
    y_gather = ring_apply(blocks, jnp.asarray(ring), x)
    y_shift = ring_apply(blocks, jnp.asarray(ring), x, stencil=st)
    np.testing.assert_allclose(np.asarray(y_shift), np.asarray(y_gather),
                               rtol=1e-13, atol=1e-13)


def test_assembly_shared_residual_matches():
    """``assemble_swe_blocks(return_residual=True)`` must return the same
    residual as a direct ``eq.residual`` evaluation (it is projected from
    the linearization primal, so this guards the projection tail)."""
    from thetis_tpu.equations.swe_blocks import assemble_swe_blocks

    bnd = {1: {"elev": 0.3}, 2: {"un": 0.2}, 3: {"flux": -150.0}}
    mesh, asm, eq = _make(False, bnd=bnd, eq_cls=ShallowWaterEquations,
                          nx=8, ny=4)
    rng = np.random.default_rng(12)
    state = swe_state(jnp.asarray(rng.normal(0, 0.3, (mesh.nc, 3, 2))),
                      jnp.asarray(rng.normal(0, 0.2, (mesh.nc, 3))))
    fields = {"lax_friedrichs_velocity_scaling_factor": jnp.asarray(1.0),
              "quadratic_drag_coefficient": jnp.asarray(2.5e-3)}
    _, r_shared = assemble_swe_blocks(eq, state, fields, bnd, 30.0,
                                      return_residual=True)
    r_direct = eq.residual("all", state, state, fields, fields, bnd)
    np.testing.assert_allclose(np.asarray(r_shared["uv"]),
                               np.asarray(r_direct["uv"]),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(r_shared["elev"]),
                               np.asarray(r_direct["elev"]),
                               rtol=1e-12, atol=1e-13)
