"""Distributed-execution tests on the 8-device virtual CPU mesh
(standing in for the reference's 2-rank MPI tests, SURVEY.md section 4 item
10): the shard_map halo-exchange tracer operator must match the serial
operator to machine precision, and the GSPMD-sharded SWE step must match
the single-device step."""
import pytest as _pytest

#: long-running integration tier: run with `pytest -m slow`
pytestmark = _pytest.mark.slow

from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thetis_tpu import RectangleMesh, FunctionSpace, DGAssembler
from thetis_tpu.equations.tracer_2d import TracerEquation2D
from thetis_tpu.parallel.partition import StripePartition
from thetis_tpu.parallel.shard import (
    make_device_mesh,
    sharded_tracer_advection,
)

N_DEV = 8


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= N_DEV
    mesh = RectangleMesh(16, 4, 8e3, 2e3)  # 128 cells = 16 per device
    V = FunctionSpace(mesh, "DG", 1)
    asm = DGAssembler(mesh, V)
    return mesh, V, asm


def test_partition_roundtrip(setup):
    mesh, V, asm = setup
    part = StripePartition(mesh, N_DEV)
    u = np.random.RandomState(0).rand(mesh.nc, 3)
    u2 = part.gather_cells(part.scatter_cells(u))
    assert np.allclose(u2, u)


def test_sharded_tracer_advection_matches_serial(setup):
    mesh, V, asm = setup
    part = StripePartition(mesh, N_DEV)
    dmesh = make_device_mesh(N_DEV)
    rhs = sharded_tracer_advection(part, V, dmesh)

    rng = np.random.RandomState(1)
    c = rng.rand(mesh.nc, 3)
    uv = 0.5 * rng.rand(mesh.nc, 3, 2)

    # serial reference: advection + LF (no diffusivity field -> no SIPG)
    opts = SimpleNamespace(use_lax_friedrichs_tracer=True,
                           sipg_factor_tracer=1.0, tracer={})
    eq = TracerEquation2D(mesh, asm, opts, bathymetry=1.0,
                          labels=["tracer_2d"], bnd_conditions={})
    fields = {"uv_2d": jnp.asarray(uv), "elev_2d": 0.0,
              "lax_friedrichs_tracer_scaling_factor": 1.0}
    r_serial = np.asarray(
        eq.residual("all", {"tracer_2d": jnp.asarray(c)},
                    {"tracer_2d": jnp.asarray(c)}, fields, fields, {})
        ["tracer_2d"]
    )

    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(dmesh, P("cells"))
    c_sh = jax.device_put(jnp.asarray(part.scatter_cells(c)), sh)
    uv_sh = jax.device_put(jnp.asarray(part.scatter_cells(uv)), sh)
    r_sh = rhs(c_sh, uv_sh)
    r_dist = part.gather_cells(np.asarray(r_sh))
    assert np.allclose(r_dist, r_serial, atol=1e-11), (
        np.abs(r_dist - r_serial).max()
    )
    # and it really ran on 8 devices
    assert len(r_sh.sharding.device_set) == N_DEV


def test_gspmd_swe_step_matches_serial(setup):
    """GSPMD-sharded CN SWE step equals the single-device step."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft", "/root/repo/__graft_entry__.py"
    )
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    mesh2d, step, sol = g._build(8, 8, "CrankNicolson", dt=30.0)
    ref = jax.jit(step)(sol)

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    dmesh = Mesh(np.array(jax.devices()[:N_DEV]), axis_names=("cells",))
    sh = NamedSharding(dmesh, P("cells"))
    sol_sh = {k: jax.device_put(v, sh) for k, v in sol.items()}
    out = jax.jit(step, in_shardings=({"uv": sh, "elev": sh},),
                  out_shardings={"uv": sh, "elev": sh})(sol_sh)
    for k in ("uv", "elev"):
        assert np.allclose(np.asarray(out[k]), np.asarray(ref[k]),
                           atol=1e-10)


# ===================== halo-partition full-equation tests ==================
# The round-2 distributed path: serial equations run per device on SubMesh
# clones inside shard_map with ppermute halo refresh (parallel.sharded).

@pytest.fixture(scope="module")
def swe_setup():
    from thetis_tpu.equations.shallowwater_2d import (
        ShallowWaterEquations, swe_state,
    )
    from thetis_tpu.parallel.submesh import HaloPartition
    from thetis_tpu.parallel.sharded import ShardedEquation

    lx, ly = 40e3, 10e3
    mesh = RectangleMesh(16, 8, lx, ly)
    opts = SimpleNamespace(
        use_nonlinear_equations=True, use_wetting_and_drying=False,
        use_lax_friedrichs_velocity=True, use_grad_div_viscosity_term=False,
        use_grad_depth_viscosity_term=True, sipg_factor=1.0,
        norm_smoother=0.0,
    )
    bathy_g = 20.0 + 5.0 * np.sin(mesh.coords_np[:, 0] / lx * np.pi)
    bnd = {1: {"elev": 0.3}, 2: {"flux": -1000.0}}
    V = FunctionSpace(mesh, "DG", 1)
    asm = DGAssembler(mesh, V)
    eq = ShallowWaterEquations(mesh, asm, opts, bathymetry=jnp.asarray(bathy_g),
                               bnd_conditions=bnd)
    part = HaloPartition(mesh, N_DEV)

    def build_eq(sm, d):
        Vl = FunctionSpace(sm, "DG", 1)
        al = DGAssembler(sm, Vl)
        bl = jnp.asarray(part.local_vertex_values(bathy_g)[d])
        return ShallowWaterEquations(sm, al, opts, bathymetry=bl,
                                     bnd_conditions=bnd)

    sharded = ShardedEquation(part, build_eq)
    rng = np.random.RandomState(0)
    sol = swe_state(jnp.asarray(rng.randn(mesh.nc, 3, 2) * 0.1),
                    jnp.asarray(rng.randn(mesh.nc, 3) * 0.1))
    fields = {
        "lax_friedrichs_velocity_scaling_factor": jnp.asarray(1.0),
        "quadratic_drag_coefficient": jnp.asarray(2.5e-3),
        "coriolis": jnp.asarray(1e-4),
        "viscosity_h": jnp.asarray(10.0),
    }
    bndv = {1: {"elev": jnp.asarray(0.3)}, 2: {"flux": jnp.asarray(-1000.0)}}
    return mesh, eq, part, sharded, sol, fields, bndv


def _to_sharded(part, sharded, sol):
    return sharded.device_put(
        {k: jnp.asarray(part.scatter_cells(np.asarray(v)))
         for k, v in sol.items()}
    )


def test_sharded_swe_residual_bit_exact(swe_setup):
    """Full SWE residual (all 13 terms incl. SIPG viscosity, LF, drag,
    Coriolis, elev/flux BCs) through the halo path == serial, bit-exact."""
    mesh, eq, part, sharded, sol, fields, bndv = swe_setup
    r_ser = eq.residual("all", sol, sol, fields, fields, bndv)
    sol_s = _to_sharded(part, sharded, sol)
    r_sh = sharded.residual("all", sol_s, sol_s, fields, fields, bndv)
    for k in r_ser:
        a = np.asarray(r_ser[k])
        b = part.gather_cells(np.asarray(r_sh[k]))
        assert np.array_equal(a, b), (k, np.abs(a - b).max())
    # really distributed
    assert len(r_sh["elev"].sharding.device_set) == N_DEV


def test_sharded_swe_mass_ops_bit_exact(swe_setup):
    mesh, eq, part, sharded, sol, fields, bndv = swe_setup
    sol_s = _to_sharded(part, sharded, sol)
    for op in ("mass_term", "mass_inverse"):
        a_t = getattr(eq, op)(sol)
        b_t = getattr(sharded, op)(sol_s)
        for k in a_t:
            a = np.asarray(a_t[k])
            b = part.gather_cells(np.asarray(b_t[k]))
            assert np.array_equal(a, b), (op, k)


def test_sharded_swe_steps_match_serial(swe_setup):
    """The unmodified serial steppers run distributed through the
    ShardedEquation adapter: explicit SSPRK33 and implicit CN (global
    Krylov with GSPMD psum reductions) match serial."""
    from thetis_tpu.timeintegration.steppers import CrankNicolson, SSPRK33

    mesh, eq, part, sharded, sol, fields, bndv = swe_setup
    sol_s = _to_sharded(part, sharded, sol)
    for mk in (lambda e: SSPRK33(e, 5.0),
               lambda e: CrankNicolson(e, 30.0, semi_implicit=True)):
        st_ser, st_sh = mk(eq), mk(sharded)
        ref = jax.jit(lambda s: st_ser.advance(0.0, s, fields, fields, bndv))(sol)
        out = jax.jit(lambda s: st_sh.advance(0.0, s, fields, fields, bndv))(sol_s)
        for k in ref:
            a = np.asarray(ref[k])
            b = part.gather_cells(np.asarray(out[k]))
            err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
            assert err < 1e-12, (k, err)


def test_sharded_assembled_cn_matches_serial(swe_setup):
    """The distributed assembled-Jacobian KSP (analytic block assembly +
    halo-refresh matvecs + psum dot products inside ONE shard_map,
    ``parallel/assembled_sharded.py``) matches the serial assembled-KSP
    CrankNicolson step.  Tight rtol so both Krylov paths solve the same
    linear system essentially exactly."""
    from thetis_tpu.timeintegration.steppers import CrankNicolson
    from thetis_tpu.parallel.assembled_sharded import ShardedAssembledCN
    from thetis_tpu.solvers.newton import NewtonParameters

    mesh, eq, part, sharded, sol, fields, bndv = swe_setup
    sol_s = _to_sharded(part, sharded, sol)
    params = NewtonParameters(ksp_rtol=1e-13, ksp_max_it=400,
                              gmres_restart=40)
    st_ser = CrankNicolson(eq, 30.0, semi_implicit=True,
                           assembled_solve=True, solver_parameters=params)
    st_sh = ShardedAssembledCN(sharded, 30.0, solver_parameters=params)
    ref = jax.jit(lambda s: st_ser.advance(0.0, s, fields, fields, bndv))(sol)
    out = jax.jit(lambda s: st_sh.advance(0.0, s, fields, fields, bndv))(sol_s)
    for k in ref:
        a = np.asarray(ref[k])
        b = part.gather_cells(np.asarray(out[k]))
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        assert err < 1e-10, (k, err)
    assert len(out["elev"].sharding.device_set) == N_DEV


def test_sharded_assembled_cn_with_coarse(swe_setup):
    """Distributed two-level V-cycle (DistributedCoarseCorrection riding
    psum) reproduces the serial coarse-corrected solve."""
    from thetis_tpu.timeintegration.steppers import CrankNicolson
    from thetis_tpu.parallel.assembled_sharded import ShardedAssembledCN
    from thetis_tpu.solvers.newton import NewtonParameters
    from thetis_tpu.solvers.assembled import (
        PackedState, assemble_affine_operator, get_coloring,
        CoarseCorrection,
    )
    from thetis_tpu.equations.shallowwater_2d import swe_state

    mesh, eq, part, sharded, sol, fields, bndv = swe_setup
    dt = 120.0  # larger wave CFL: the coarse correction matters
    zero = swe_state(jnp.zeros((mesh.nc, 3, 2)), jnp.zeros((mesh.nc, 3)))
    ps = PackedState(zero)

    def Fw(x):
        st0 = ps.unpack(x)
        r = eq.residual("all", st0, zero, fields, fields, bndv)
        m = eq.mass_term(st0)
        return ps.pack(swe_state(m["uv"] - 0.5 * dt * r["uv"],
                                 m["elev"] - 0.5 * dt * r["elev"]))

    blocks0, _ = jax.jit(
        lambda x0: assemble_affine_operator(Fw, x0, mesh))(ps.pack(zero))
    ring, _, _ = get_coloring(mesh)
    coarse = CoarseCorrection(blocks0, np.asarray(ring), mesh,
                              target_size=16)
    params = NewtonParameters(ksp_rtol=1e-13, ksp_max_it=400,
                              gmres_restart=40)
    st_ser = CrankNicolson(eq, dt, semi_implicit=True,
                           assembled_solve=True, coarse=coarse,
                           solver_parameters=params)
    st_sh = ShardedAssembledCN(sharded, dt, solver_parameters=params,
                               coarse=coarse)
    sol_s = _to_sharded(part, sharded, sol)
    ref = jax.jit(lambda s: st_ser.advance(0.0, s, fields, fields, bndv))(sol)
    out = jax.jit(lambda s: st_sh.advance(0.0, s, fields, fields, bndv))(sol_s)
    for k in ref:
        a = np.asarray(ref[k])
        b = part.gather_cells(np.asarray(out[k]))
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        assert err < 1e-10, (k, err)


def test_submesh_weak_w_matches_serial():
    """The flux-consistent weak w solve (round-5 default) gathers facet
    traces, so on partition SubMeshes it must reproduce the serial w on
    every facet-complete cell (owned + ring-1) — the invariant the
    sharded 3D step's tracer advection relies on."""
    from thetis_tpu.mesh.extruded import ExtrudedMesh
    from thetis_tpu.fem.assembly3d import Assembler3D
    from thetis_tpu.equations.utility3d import VerticalVelocitySolver
    from thetis_tpu.parallel.submesh import HaloPartition

    nz = 4
    mesh = RectangleMesh(16, 8, 8e3, 4e3)
    rng = np.random.RandomState(3)

    def build_ws(m, bathy_cell):
        V = FunctionSpace(m, "DG", 1)
        asm = DGAssembler(m, V)
        ext = ExtrudedMesh(m, n_layers=nz)
        a3 = Assembler3D(m, asm, ext)
        z = ext.z_interfaces(jnp.asarray(bathy_cell),
                             jnp.zeros((m.nc, 3)))
        return VerticalVelocitySolver(a3, jnp.asarray(bathy_cell)), \
            a3.layer_geometry(z)

    bathy_vert = 20.0 + 5.0 * np.sin(mesh.coords_np[:, 0] / 8e3 * np.pi)
    ws, geom = build_ws(mesh, bathy_vert[mesh.cells_np])
    uv = jnp.asarray(rng.rand(mesh.nc, 3, nz, 2, 2) - 0.5)
    w_ser = np.asarray(ws.solve_weak(uv, geom))

    part = HaloPartition(mesh, 4)
    uv_loc = part.local_cell_values(np.asarray(uv))
    for d, sm in enumerate(part.submeshes):
        b_loc = part.local_vertex_values(bathy_vert)[d][sm.cells_np]
        ws_d, geom_d = build_ws(sm, b_loc)
        w_d = np.asarray(ws_d.solve_weak(jnp.asarray(uv_loc[d]), geom_d))
        w_ref = w_ser[part.ext_ids[d]]
        complete = (np.asarray(sm.cell_facets) != sm.nf - 1).all(axis=1)
        complete[:part.n_loc] = True
        assert np.abs(w_d[complete] - w_ref[complete]).max() == 0.0


def test_sharded_3d_step_matches_serial():
    """One full distributed mode-split 3D baroclinic step (baroclinicity,
    implicit 2D solve, ALE advection, vertical mixing, coupling) == serial."""
    from thetis_tpu.model.flowsolver3d import FlowSolver
    from thetis_tpu.parallel.submesh import HaloPartition
    from thetis_tpu.parallel.sharded3d import ShardedFlowSolver3d

    lx, ly, nz = 40e3, 10e3, 4
    mesh = RectangleMesh(16, 8, lx, ly)
    bathy_g = 20.0 + 5.0 * np.sin(mesh.coords_np[:, 0] / lx * np.pi)

    def make_solver(m, b):
        from thetis_tpu.solvers.newton import NewtonParameters

        s = FlowSolver(m, jnp.asarray(b), nz)
        s.options.update(dict(
            timestep=30.0, simulation_export_time=300.0,
            simulation_end_time=300.0, use_turbulence=False,
            use_smagorinsky_viscosity=False, horizontal_viscosity=5.0,
            coriolis_frequency=1e-4,
            # bit-exactness check: converge the barotropic Krylov to
            # machine precision so serial and sharded solves agree to
            # roundoff (the production default stops at the PETSc-class
            # 1e-5, where the two FP paths halt at different iterates)
            barotropic_solver_parameters=NewtonParameters(
                ksp_rtol=1e-13, ksp_max_it=192, gmres_restart=48),
        ))
        s.initialize()
        return s

    ser = make_solver(mesh, bathy_g)
    x = mesh.coords_np[mesh.cells_np]
    elev0 = 0.3 * np.exp(-(((x[..., 0] - lx / 2) / 6e3) ** 2))
    salt0 = 30.0 + 2.0 * np.exp(-(((x[..., 0] - lx / 2) / 8e3) ** 2))
    ser.assign_initial_conditions(elev=jnp.asarray(elev0),
                                  salt=jnp.asarray(salt0))
    state = ser._get_state()
    swe_fields = ser._gather_swe_fields()
    out_ser = ser._step(state, swe_fields, {})

    part = HaloPartition(mesh, N_DEV)
    sh3 = ShardedFlowSolver3d(
        part,
        lambda sm, d: make_solver(sm, part.local_vertex_values(bathy_g)[d]),
    )
    state_s = sh3.device_put(
        {k: jnp.asarray(part.scatter_cells(np.asarray(v)))
         for k, v in state.items()}
    )
    out_sh = sh3.step(state_s, swe_fields, {})
    for k in sorted(out_ser):
        a = np.asarray(out_ser[k])
        b = part.gather_cells(np.asarray(out_sh[k]))
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        assert err < 1e-11, (k, err)
    assert len(out_sh["salt_3d"].sharding.device_set) == N_DEV
