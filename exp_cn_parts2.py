"""Scanned-loop CN cost split (assembly vs dinv vs KSP-iteration), bench
config.  Single dispatched calls pay ~27 ms tunnel overhead (CLAUDE.md);
everything here is measured as a difference of scanned loops."""
import os, time, json
import jax
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp
from exp_cn import build
from thetis_tpu.solvers.assembled import (
    PackedState, get_coloring, get_stencil, batched_inv_small_T,
)

mesh, eq, st, sol, fields, ps, dt = build(320, 160, pc="none")
ring, _, _ = get_coloring(mesh)
stencil = get_stencil(mesh)
x0 = ps.pack(sol)

def scanloop(body, carry, n=30):
    def f(c):
        return jax.lax.scan(lambda cc, _: (body(cc), None), c, None, length=n)[0]
    fj = jax.jit(f)
    out = jax.block_until_ready(fj(carry))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fj(carry))
        best = min(best, time.perf_counter()-t0)
    return best/n*1e3

# baseline: a cheap elementwise op to subtract loop overhead
base = scanloop(lambda s: jax.tree_util.tree_map(lambda x: x*1.0000001, s), sol)
print(json.dumps({"part":"scan_baseline","ms":round(base,3)}), flush=True)

# assembly (T layout) alone, keep state flowing
def asm_body(s):
    bT = eq.assemble_operator_blocks(s, fields, {}, 0.5*dt, layout="T")
    ds = 1e-12*bT[0,0,0]
    return {"uv": s["uv"]+ds[:,None,None], "elev": s["elev"]+ds[:,None]}
ms_asm = scanloop(asm_body, sol)
print(json.dumps({"part":"assembly_T","ms":round(ms_asm-base,2)}), flush=True)

# assembly + residual
def asm_body2(s):
    bT, r = eq.assemble_operator_blocks(s, fields, {}, 0.5*dt,
                                        return_residual=True, layout="T")
    ds = 1e-12*bT[0,0,0]
    return {"uv": s["uv"]+ds[:,None,None]+1e-12*r["uv"],
            "elev": s["elev"]+ds[:,None]+1e-12*r["elev"]}
ms_asm2 = scanloop(asm_body2, sol)
print(json.dumps({"part":"assembly_T+resid","ms":round(ms_asm2-base,2)}), flush=True)

# assembly + residual + diag inverse
def asm_body3(s):
    bT, r = eq.assemble_operator_blocks(s, fields, {}, 0.5*dt,
                                        return_residual=True, layout="T")
    di = batched_inv_small_T(bT[0])
    ds = 1e-12*(bT[0,0,0]+di[0,0])
    return {"uv": s["uv"]+ds[:,None,None]+1e-12*r["uv"],
            "elev": s["elev"]+ds[:,None]+1e-12*r["elev"]}
ms3 = scanloop(asm_body3, sol)
print(json.dumps({"part":"assembly+resid+dinv","ms":round(ms3-base,2)}), flush=True)

# full CN step (pc none, it32 r8) for reference
def step_body(s):
    return st.advance(0.0, s, fields, fields, {})
ms_step = scanloop(step_body, sol, n=10)
print(json.dumps({"part":"cn_step_nopc","ms":round(ms_step-base,2)}), flush=True)
