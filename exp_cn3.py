"""Round-4: CN KSP parameter sweep on TPU (restart / coarse cap /
Schur fieldsplit) at the bench configuration (320x160, wave CFL ~25)."""
import os
import time
import json

import jax
import jax.numpy as jnp
import numpy as np

_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from types import SimpleNamespace  # noqa: E402
from thetis_tpu.mesh.generation import RectangleMesh  # noqa: E402
from thetis_tpu.fem.functionspace import FunctionSpace, Function  # noqa: E402
from thetis_tpu.fem.assembly import DGAssembler  # noqa: E402
from thetis_tpu.equations.shallowwater_2d import (  # noqa: E402
    ShallowWaterEquations, swe_state,
)
from thetis_tpu.timeintegration.steppers import get_stepper  # noqa: E402
from thetis_tpu.solvers.newton import NewtonParameters  # noqa: E402
from thetis_tpu.solvers.assembled import (  # noqa: E402
    PackedState, assemble_affine_operator, get_coloring, CoarseCorrection,
)
from thetis_tpu.solvers.fieldsplit import SchurFieldsplitPC  # noqa: E402


def build(nx=320, ny=160):
    lx, ly = 100e3, 50e3
    mesh = RectangleMesh(nx, ny, lx, ly)
    V = FunctionSpace(mesh, "DG", 1)
    asm = DGAssembler(mesh, V)
    opts = SimpleNamespace(
        use_nonlinear_equations=True, use_wetting_and_drying=False,
        use_lax_friedrichs_velocity=True, use_grad_div_viscosity_term=False,
        use_grad_depth_viscosity_term=True, sipg_factor=1.0,
        norm_smoother=0.0,
    )
    eq = ShallowWaterEquations(mesh, asm, opts, bathymetry=50.0,
                               bnd_conditions={})
    elev0 = Function(V).interpolate(
        lambda x, y: 1.0 * jnp.exp(-(((x - lx / 2) / 15e3) ** 2)
                                   - ((y - ly / 2) / 15e3) ** 2))
    sol = swe_state(jnp.zeros((mesh.nc, 3, 2), dtype=elev0.data.dtype),
                    elev0.data)
    fields = {
        "lax_friedrichs_velocity_scaling_factor": jnp.asarray(1.0),
        "quadratic_drag_coefficient": jnp.asarray(2.5e-3),
    }
    c = np.sqrt(9.81 * 51.0)
    dt = 2.0 * float(mesh.cell_hmin_np.min()) / c
    return mesh, eq, sol, fields, dt


def run(tag, mesh, eq, sol, fields, dt, pc_kind, restart, max_it,
        coarse_cap=4096, n=10):
    zero = swe_state(jnp.zeros((mesh.nc, 3, 2)), jnp.zeros((mesh.nc, 3)))
    ps = PackedState(zero)

    def Fw(x):
        st0 = ps.unpack(x)
        r = eq.residual("all", st0, zero, fields, fields, {})
        m = eq.mass_term(st0)
        return ps.pack(swe_state(m["uv"] - 0.5 * dt * r["uv"],
                                 m["elev"] - 0.5 * dt * r["elev"]))

    blocks0, _ = jax.jit(
        lambda x0: assemble_affine_operator(Fw, x0, mesh))(ps.pack(zero))
    ring, _, _ = get_coloring(mesh)
    if pc_kind == "coarse":
        pc = CoarseCorrection(blocks0, np.asarray(ring), mesh,
                              target_size=max(
                                  48, int(np.ceil(mesh.nc * 9 / coarse_cap))))
    else:
        pc = SchurFieldsplitPC(blocks0, np.asarray(ring), mesh)
    st = get_stepper(
        "CrankNicolson", eq, dt, semi_implicit=True, assembled_solve=True,
        coarse=pc,
        solver_parameters=NewtonParameters(
            ksp_rtol=1e-5, ksp_max_it=max_it, gmres_restart=restart),
    )

    def nsteps(s, n):
        def body(c, _):
            return st.advance(0.0, c, fields, fields, {}), None

        return jax.lax.scan(body, s, None, length=n)[0]

    fn = jax.jit(nsteps, static_argnames=("n",))
    out = jax.block_until_ready(fn(sol, n))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(sol, n))
        best = min(best, time.perf_counter() - t0)
    assert bool(jnp.isfinite(out["elev"]).all()), tag
    ndofs = mesh.nc * 9
    thr = ndofs * n / best
    print(json.dumps({"variant": tag, "ms_per_step": round(best / n * 1e3, 2),
                      "dof_steps_per_sec": round(thr / 1e6, 2)}), flush=True)


if __name__ == "__main__":
    import sys
    variants = sys.argv[1:] or ["coarse_r8", "schur_r8"]
    mesh, eq, sol, fields, dt = build()
    if "coarse_r8" in variants:
        run("coarse_r8_it32 (bench current)", mesh, eq, sol, fields, dt,
            "coarse", 8, 32)
    if "schur_r8" in variants:
        run("schur_r8_it32", mesh, eq, sol, fields, dt, "schur", 8, 32)
    if "schur_r8_it16" in variants:
        run("schur_r8_it16", mesh, eq, sol, fields, dt, "schur", 8, 16)
    if "schur_r16_it16" in variants:
        run("schur_r16_it16", mesh, eq, sol, fields, dt, "schur", 16, 16)
