"""Round-4: differential attribution of the scanned 3D step cost.

Single dispatched calls pay a ~5 ms tunnel floor, so each variant runs
20 scanned steps and we difference the per-step times against the full
configuration (bench 48x48x12, ~1.04M DOF).
"""
import os
import time
import json

import jax
import numpy as np

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402


def measure(state, nsteps, n=20, reps=3):
    fn = jax.jit(nsteps, static_argnames=("n",))
    out = jax.block_until_ready(fn(state, n))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(state, n))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3


def run(tag, **opt_overrides):
    state, nsteps, ndofs, s = bench.build_workload_3d(48, 48, 12)
    if opt_overrides:
        s.options.update(opt_overrides)
        # rebuild the step closure with the new options
        state = s._get_state()
        swe_fields = s._gather_swe_fields()

        def nsteps(state, n):
            def body(c, _):
                return s._step(c, swe_fields, {}), None

            return jax.lax.scan(body, state, None, length=n)[0]

    ms = measure(state, nsteps)
    print(json.dumps({"variant": tag, "ms_per_step": round(ms, 2)}),
          flush=True)
    return ms


full = run("full")
run("no_tracer_limiter", use_limiter_for_tracers=False)
run("no_limiters", use_limiter_for_tracers=False,
    use_limiter_for_velocity=False)
run("no_implicit_vdiff", use_implicit_vertical_diffusion=False)
run("no_temp", solve_temperature=False, use_baroclinic_formulation=False)
run("no_smag_or_bottomfric", use_bottom_friction=False)
