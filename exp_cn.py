"""Round-4 experiment: 2D semi-implicit CN solver cost breakdown on TPU.

Compares the current monolithic two-level coarse correction against the
SchurFieldsplitPC, and splits assembly vs KSP cost.  Not part of the
test suite; a scratch driver for PERF.md numbers.
"""
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

from bench import build_workload_2d  # noqa: E402


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def build(nx, ny, pc="coarse", ksp_max_it=32, restart=8, s_iters=8,
          u_smooth=2, rtol=1e-5):
    from types import SimpleNamespace
    from thetis_tpu.mesh.generation import RectangleMesh
    from thetis_tpu.fem.functionspace import FunctionSpace, Function
    from thetis_tpu.fem.assembly import DGAssembler
    from thetis_tpu.equations.shallowwater_2d import (
        ShallowWaterEquations, swe_state,
    )
    from thetis_tpu.timeintegration.steppers import get_stepper
    from thetis_tpu.solvers.newton import NewtonParameters
    from thetis_tpu.solvers.assembled import (
        PackedState, assemble_affine_operator, get_coloring,
        CoarseCorrection,
    )

    lx, ly = 100e3, 50e3
    mesh = RectangleMesh(nx, ny, lx, ly)
    V = FunctionSpace(mesh, "DG", 1)
    asm = DGAssembler(mesh, V)
    opts = SimpleNamespace(
        use_nonlinear_equations=True,
        use_wetting_and_drying=False,
        use_lax_friedrichs_velocity=True,
        use_grad_div_viscosity_term=False,
        use_grad_depth_viscosity_term=True,
        sipg_factor=1.0,
        norm_smoother=0.0,
    )
    eq = ShallowWaterEquations(mesh, asm, opts, bathymetry=50.0,
                               bnd_conditions={})
    elev0 = Function(V).interpolate(
        lambda x, y: 1.0
        * jnp.exp(-(((x - lx / 2) / 15e3) ** 2) - ((y - ly / 2) / 15e3) ** 2)
    )
    sol = swe_state(jnp.zeros((mesh.nc, 3, 2), dtype=elev0.data.dtype),
                    elev0.data)
    fields = {
        "lax_friedrichs_velocity_scaling_factor": jnp.asarray(1.0),
        "quadratic_drag_coefficient": jnp.asarray(2.5e-3),
    }
    c = np.sqrt(9.81 * 51.0)
    dt = 2.0 * float(mesh.cell_hmin_np.min()) / c

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
    if pc == "coarse":
        coarse = CoarseCorrection(blocks0, np.asarray(ring), mesh)
    elif pc == "schur":
        from thetis_tpu.solvers.fieldsplit import SchurFieldsplitPC
        coarse = SchurFieldsplitPC(blocks0, np.asarray(ring), mesh,
                                   n_u=6, u_smooth=u_smooth,
                                   s_iters=s_iters, eta_first=True)
    else:
        coarse = None
    st = get_stepper(
        "CrankNicolson", eq, dt, semi_implicit=True,
        assembled_solve=True, coarse=coarse,
        solver_parameters=NewtonParameters(ksp_rtol=rtol,
                                           ksp_max_it=ksp_max_it,
                                           gmres_restart=restart),
    )
    return mesh, eq, st, sol, fields, ps, dt


def run_case(tag, **kw):
    nx, ny = 320, 160
    mesh, eq, st, sol, fields, ps, dt = build(nx, ny, **kw)
    wave_cfl = np.sqrt(9.81 * 51.0) * dt / (100e3 / nx)
    n = 10

    def nsteps(s):
        def body(s, _):
            return st.advance(0.0, s, fields, fields, {}), None
        return jax.lax.scan(body, s, None, length=n)[0]

    fn = jax.jit(nsteps)
    t, out = timeit(fn, sol)
    ms = t / n * 1e3
    thr = mesh.nc * 9 * n / t

    # true residual of the final step's system (quality check): redo one
    # advance from the pre-final state? cheaper: advance once more and
    # check finiteness + solution norm
    fin = bool(jnp.isfinite(out["elev"]).all())
    print(json.dumps(dict(tag=tag, ms_per_step=round(ms, 2),
                          dof_steps_per_s=round(thr / 1e6, 3),
                          wave_cfl=round(float(wave_cfl), 2),
                          finite=fin, **{k: v for k, v in kw.items()
                                         if not callable(v)})),
          flush=True)
    return ms


def main():
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "coarse"):
        run_case("cn_coarse_base", pc="coarse", ksp_max_it=32, restart=8)
    if which in ("all", "schur"):
        run_case("cn_schur_8", pc="schur", s_iters=8, u_smooth=2,
                 ksp_max_it=32, restart=8)
        run_case("cn_schur_4", pc="schur", s_iters=4, u_smooth=1,
                 ksp_max_it=32, restart=8)
    if which in ("all", "parts"):
        # assembly-only cost: ksp_max_it=0 is not representable; use 1
        # cycle of restart 1 as a lower bound for "assembly + 1 it"
        run_case("cn_1it", pc="coarse", ksp_max_it=1, restart=1)





def main_nopc():
    run_case("cn_nopc_r8_it32", pc="none", ksp_max_it=32, restart=8)
    run_case("cn_nopc_r12_it36", pc="none", ksp_max_it=36, restart=12)
    run_case("cn_nopc_r16_it32", pc="none", ksp_max_it=32, restart=16)
    run_case("cn_nopc_r26_it26", pc="none", ksp_max_it=26, restart=26)


if __name__ == "__main__":
    import sys
    (main_nopc if "nopc" in sys.argv else main)()
