"""Round-5: 3D step knob sweep on TPU (barotropic restart / rtol)."""
import os, time, json, sys
import jax
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp


def run(tag, **over):
    import importlib
    import bench
    importlib.reload(bench)
    from thetis_tpu.solvers.newton import NewtonParameters
    # patch the solver params via options before initialize
    orig = bench.build_workload_3d

    def patched(nx, ny, nz):
        from thetis_tpu.model import flowsolver3d as f3
        init0 = f3.FlowSolver.initialize

        def init_patch(self):
            if over.get("params"):
                self.options.barotropic_solver_parameters = over["params"]
            return init0(self)
        f3.FlowSolver.initialize = init_patch
        try:
            return orig(nx, ny, nz)
        finally:
            f3.FlowSolver.initialize = init0

    state, nsteps, ndofs, s = patched(48, 48, 12)
    fn = jax.jit(nsteps, static_argnames=("n",))
    n = 20
    out = jax.block_until_ready(fn(state, n))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(state, n))
        best = min(best, time.perf_counter() - t0)
    assert bool(jnp.isfinite(out["temp_3d"]).all())
    print(json.dumps({"variant": tag, "ms_per_step": round(best/n*1e3, 2),
                      "Mdofsteps": round(ndofs*n/best/1e6, 1)}), flush=True)


from thetis_tpu.solvers.newton import NewtonParameters
which = sys.argv[1:] or ["base", "r4", "r6it12"]
if "base" in which:
    run("base_r8_it48")
if "r4" in which:
    run("r4_it16", params=NewtonParameters(ksp_rtol=1e-5, ksp_max_it=16,
                                           gmres_restart=4))
if "r6it12" in which:
    run("r6_it12", params=NewtonParameters(ksp_rtol=1e-5, ksp_max_it=12,
                                           gmres_restart=6))
