"""Per-phase TPU timing of the 3D baroclinic step (PERF.md source).

Times each phase of the mode-split step separately (jitted, averaged over
repeats) plus the fused scan step, at the benchmark size (~1.04M DOF).
Optionally writes a jax.profiler trace (PROFILE_TRACE=1).
"""
import os
import time

import jax
import numpy as np

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402


def timed(fn, *args, repeats=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats


def main():
    import jax.numpy as jnp

    state, nsteps, ndofs, s = bench.build_workload_3d(48, 48, 12)
    swe_fields = s._gather_swe_fields()
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)

    results = {}

    # full step (single, jitted)
    step1 = jax.jit(lambda st: s._step(st, swe_fields, {}))
    results["full_step_single"] = timed(step1, state)

    # scan-20 fused steps
    fn = jax.jit(nsteps, static_argnames=("n",))
    t = timed(fn, state, 20, repeats=2)
    results["full_step_in_scan20"] = t / 20.0

    # phase 1: baroclinicity (density -> head -> int_pg) + geometry
    pre = jax.jit(s._pre_fn)
    results["pre_baroclinicity"] = timed(pre, state)

    int_pg, src2d = pre(state)

    # phase 2: 2D ModeSplit CN solve
    sf = dict(swe_fields)
    sf["momentum_source"] = src2d
    sw0 = {"uv": state["uv"], "elev": state["elev"]}
    swsolve = jax.jit(
        lambda sw: s.swe_stepper.advance(0.0, sw, sf, sf, {})
    )
    results["swe2d_cn_solve"] = timed(swsolve, sw0)

    sw1 = swsolve(sw0)

    # phase 3: everything after the 2D solve (ALE advection, mixing,
    # coupling, turbulence)
    post = jax.jit(lambda st, sw: s._post_fn(st, sw, int_pg, swe_fields))
    results["post_3d_phases"] = timed(post, state, sw1)

    # component pieces inside post
    ext = s.extruded
    asm3d = s.asm3d
    geom_fn = jax.jit(
        lambda e: asm3d.layer_geometry(ext.z_interfaces(s.bathy_cell, e))
    )
    results["geometry"] = timed(geom_fn, state["elev"])
    geom = geom_fn(state["elev"])

    from thetis_tpu.equations.utility3d import expand_function_to_3d

    uv_tot = state["uv_3d"] + expand_function_to_3d(state["uv"], ext.nz)
    wsolve = jax.jit(lambda u: s.w_solver.solve(u, geom))
    results["w_solve"] = timed(wsolve, uv_tot)
    w = wsolve(uv_tot)

    mom_fields = {"w_3d": w, "int_pg_3d": int_pg,
                  "coriolis": swe_fields.get("coriolis"),
                  "viscosity_h": swe_fields.get("viscosity_h")}
    mom_fields = {k: v for k, v in mom_fields.items() if v is not None}
    mom_res = jax.jit(
        lambda u: s.eq_momentum.residual(
            "all", {"uv_3d": u}, {"uv_3d": u}, mom_fields, mom_fields, {},
            geom=geom,
        )["uv_3d"]
    )
    results["momentum_residual"] = timed(mom_res, uv_tot)

    tr_fields = {"uv_3d": uv_tot, "w_3d": w, "diffusivity_v": 1e-5,
                 "diffusivity_h": swe_fields.get("diffusivity_h")}
    tr_fields = {k: v for k, v in tr_fields.items() if v is not None}
    tr_res = jax.jit(
        lambda c: s.eq_temp.residual(
            "all", {"temp_3d": c}, {"temp_3d": c}, tr_fields, tr_fields,
            {}, geom=geom,
        )["temp_3d"]
    )
    results["tracer_residual"] = timed(tr_res, state["temp_3d"])

    from thetis_tpu.equations.momentum_3d import vertical_viscosity_implicit

    Dn = geom["Delta_nodes"]
    vvisc = jax.jit(
        lambda u: vertical_viscosity_implicit(
            u, jnp.full_like(state["temp_3d"], 1e-3), Dn, s.dt
        )
    )
    results["implicit_vdiff_uv"] = timed(vvisc, state["uv_3d"])

    minv = jax.jit(lambda r: s.eq_momentum.mass_inverse(
        {"uv_3d": r}, geom)["uv_3d"])
    results["mass_inverse_3d"] = timed(minv, uv_tot)

    if os.environ.get("PROFILE_TRACE"):
        with jax.profiler.trace("/tmp/thetis_tpu_trace"):
            out = fn(state, 20)
            jax.block_until_ready(out)
        print("trace written to /tmp/thetis_tpu_trace")

    dofs_per_step = ndofs
    print(f"\n== per-phase timings (ms), {dofs_per_step} DOF ==")
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{k:24s} {v*1e3:9.2f} ms")
    print(f"\nthroughput (scan): "
          f"{dofs_per_step/results['full_step_in_scan20']/1e6:.1f} M DOF*steps/s")


if __name__ == "__main__":
    main()
