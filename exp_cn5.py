"""Round-5: CN throughput on TPU with the extrapolated warm start
(bench config).  Scratch driver."""
import os, time, json
import jax
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp
from bench import build_workload_2d

sol, nsteps, n_dofs = build_workload_2d(320, 160, "CN")
fn = jax.jit(nsteps, static_argnames=("n",))
n = 10
out = jax.block_until_ready(fn(sol, n))
best = np.inf
for _ in range(3):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(sol, n))
    best = min(best, time.perf_counter()-t0)
assert bool(jnp.isfinite(out["elev"]).all())
print(json.dumps({"variant": "cn_extrap_warmstart",
                  "ms_per_step": round(best/n*1e3, 2),
                  "dof_steps_per_sec_M": round(n_dofs*n/best/1e6, 2)}))
