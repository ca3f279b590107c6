"""Mesh / function-space / assembly unit tests (analogue of the reference's
operator unit tests, SURVEY.md section 4 item 6)."""
import numpy as np
import jax.numpy as jnp
import pytest

from thetis_tpu import (
    RectangleMesh,
    UnitSquareMesh,
    FunctionSpace,
    Function,
    DGAssembler,
)


@pytest.fixture(scope="module")
def mesh():
    return RectangleMesh(4, 3, 2.0, 1.5)


@pytest.fixture(scope="module")
def asm(mesh):
    return DGAssembler(mesh, FunctionSpace(mesh, "DG", 1))


def test_mesh_area_and_boundary(mesh):
    assert abs(mesh.total_area - 3.0) < 1e-12
    assert mesh.boundary_len == pytest.approx({1: 1.5, 2: 1.5, 3: 2.0, 4: 2.0})
    assert mesh.boundary_markers == [1, 2, 3, 4]


def test_outward_normals_closed(mesh):
    """Sum of len*outward_normal over each cell's facets must vanish."""
    n = mesh.facet_normal_np
    L = mesh.facet_len_np
    cf, cs = mesh.cell_facets_np, mesh.cell_sides_np
    sgn = np.where(cs == 0, 1.0, -1.0)
    per_cell = (n[cf] * L[cf][..., None] * sgn[..., None]).sum(axis=1)
    assert np.abs(per_cell).max() < 1e-12


def test_integration_exact_linear(mesh, asm):
    V = asm.space
    f = Function(V).interpolate(lambda x, y: 2 * x + 3 * y)
    exact = 2 * (2.0**2 / 2) * 1.5 + 3 * (1.5**2 / 2) * 2.0
    assert float(asm.integrate(f.data)) == pytest.approx(exact, rel=1e-13)


def test_integration_exact_cubic():
    mesh = UnitSquareMesh(3, 3)
    V = FunctionSpace(mesh, "DG", 2)
    asm = DGAssembler(mesh, V)
    # x^2*y is quadratic -> exactly representable in P2; integrand degree 3
    f = Function(V).interpolate(lambda x, y: x**2 * y)
    assert float(asm.integrate(f.data)) == pytest.approx(1.0 / 6.0, rel=1e-12)


def test_gradients(mesh, asm):
    f = Function(asm.space).interpolate(lambda x, y: 2 * x + 3 * y)
    g = asm.cell_grads(f.data)
    assert np.allclose(np.asarray(g[..., 0]), 2.0)
    assert np.allclose(np.asarray(g[..., 1]), 3.0)


def test_trace_continuity(mesh, asm):
    """A continuous (linear) field has equal traces from both sides."""
    f = Function(asm.space).interpolate(lambda x, y: 1 + x - 0.5 * y)
    tr = np.asarray(asm.facet_traces(f.data))
    interior = ~mesh.facet_is_boundary_np
    assert np.abs(tr[interior, 0] - tr[interior, 1]).max() < 1e-12


def test_mass_roundtrip(mesh, asm):
    f = Function(asm.space).interpolate(lambda x, y: np.pi * x * 0 + 1.3)
    r = asm.mass_inverse(asm.mass_apply(f.data))
    assert np.allclose(np.asarray(r), np.asarray(f.data))
    # vector version
    uv = jnp.stack([f.data, 2 * f.data], axis=-1)
    r2 = asm.mass_inverse(asm.mass_apply(uv))
    assert np.allclose(np.asarray(r2), np.asarray(uv))


def test_l2_projection(mesh, asm):
    """project_rhs reproduces polynomials of the space's degree exactly."""
    f = Function(asm.space).interpolate(lambda x, y: 0.5 + x + 2 * y)
    fq = asm.cell_values(f.data)
    p = asm.project_rhs(fq)
    assert np.allclose(np.asarray(p), np.asarray(f.data), atol=1e-12)


def test_cg_space(mesh):
    V = FunctionSpace(mesh, "CG", 1)
    f = Function(V).interpolate(lambda x, y: x + y)
    assert f.data.shape == (mesh.nv,)
    asm = DGAssembler(mesh, FunctionSpace(mesh, "DG", 1))
    vals = asm.cell_values(V.cell_dofs(f.data))
    exact = 2 * (2.0**2 / 2) * 1.5 / 2 + 1.5**2 / 2 * 2.0
    assert float(asm.integrate_cellq(vals)) == pytest.approx(
        (2.0**2 / 2) * 1.5 + (1.5**2 / 2) * 2.0, rel=1e-13
    )


def test_form2indicator_and_dwr():
    """Cell indicators: form2indicator integrates a 0-form per cell
    (sums to the global integral); the DWR estimator flags the cells
    where residual x adjoint pairing is largest."""
    import jax.numpy as jnp
    from thetis_tpu import RectangleMesh, FunctionSpace, Function, solver2d
    from thetis_tpu.model.diagnostics import form2indicator, DWRErrorEstimator

    mesh = RectangleMesh(8, 4, 2.0, 1.0)
    V = FunctionSpace(mesh, "DG", 1)
    f = Function(V).interpolate(lambda x, y: 1.0 + x * y)
    so_mesh_asm = None

    p1 = FunctionSpace(mesh, "CG", 1)
    bath = Function(p1).assign(5.0)
    so = solver2d.FlowSolver2d(mesh, bath)
    so.options.timestep = 0.1
    so.options.simulation_export_time = 1.0
    so.options.simulation_end_time = 1.0
    so.options.no_exports = True
    so.assign_initial_conditions(
        elev=Function(p1).interpolate(lambda x, y: 0.1 * np.exp(
            -(((x - 1.0) / 0.3) ** 2)))
    )
    so.initialize()
    asm = so.asm

    ind = form2indicator(asm, asm.cell_values(f.data))
    assert ind.shape == (mesh.nc,)
    assert abs(float(ind.sum()) - float(asm.integrate(f.data))) < 1e-12

    est = DWRErrorEstimator(so)
    st = so._get_state()
    adj = {"uv": jnp.ones_like(st["uv"]), "elev": jnp.ones_like(st["elev"])}
    eta_k = est.compute({"uv": st["uv"], "elev": st["elev"]}, adj)
    assert eta_k.shape == (mesh.nc,)
    assert np.isfinite(np.asarray(eta_k)).all()
    # the residual concentrates where the free surface gradient is:
    # cells near the bump (x ~ 1) carry more indicator than the far field
    e = np.asarray(eta_k)
    xc = np.asarray(mesh.cell_midpoints())[:, 0]
    near = np.abs(xc - 1.0) < 0.4
    assert e[near].mean() > 2.0 * e[~near].mean()


def test_timed_stage_profiling():
    """timed_stage accumulates wall clock + emits profiler annotations
    (the reference's timed_stage/-log_view analogue, SURVEY.md section
    5.1)."""
    from thetis_tpu.utils.profiling import (
        timed_stage, get_timers, reset_timers, print_timers,
    )

    reset_timers()
    with timed_stage("stage_a"):
        sum(range(1000))
    with timed_stage("stage_a"):
        pass
    with timed_stage("stage_b"):
        pass
    t = get_timers()
    assert t["stage_a"][1] == 2 and t["stage_b"][1] == 1
    assert t["stage_a"][0] >= 0.0
    print_timers()
    reset_timers()
    assert get_timers() == {}


def test_docs_generator(tmp_path):
    """The docs subsystem generates field/options/API pages from the code
    (the reference's Sphinx-generated tables analogue)."""
    import runpy
    import sys
    import docs.generate_docs as gd

    gd.gen_field_docs(str(tmp_path))
    gd.gen_option_docs(str(tmp_path))
    gd.gen_api_docs(str(tmp_path))
    field_doc = (tmp_path / "field_documentation.md").read_text()
    assert "elev_2d" in field_doc and "tke_3d" in field_doc
    opt_doc = (tmp_path / "model_options.md").read_text()
    assert "ModelOptions3d" in opt_doc and "use_modesplit_2d" in opt_doc
    api_doc = (tmp_path / "api.md").read_text()
    assert "thetis_tpu.solvers.schur" in api_doc
