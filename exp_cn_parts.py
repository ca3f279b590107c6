"""Fine-grained CN cost breakdown on TPU: assembly, diag-inv, matvecs."""
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

from exp_cn import build  # noqa: E402


def t(fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    from thetis_tpu.solvers.assembled import (
        PackedState, get_coloring, get_stencil, batched_inv_small,
        ring_apply,
    )

    mesh, eq, st, sol, fields, ps, dt = build(320, 160, pc="none")
    ring, _, _ = get_coloring(mesh)
    ring_j = jnp.asarray(ring)
    stencil = get_stencil(mesh)
    x0 = ps.pack(sol)

    # 1. analytic assembly alone (blocks only)
    f_asm = jax.jit(lambda s: eq.assemble_operator_blocks(
        s, fields, {}, 0.5 * dt))
    ms, blocks = t(f_asm, sol)
    print(json.dumps({"part": "assembly_blocks", "ms": round(ms, 2)}),
          flush=True)

    # 1b. assembly + residual (the stepper's actual call)
    f_asm2 = jax.jit(lambda s: eq.assemble_operator_blocks(
        s, fields, {}, 0.5 * dt, return_residual=True))
    ms, _ = t(f_asm2, sol)
    print(json.dumps({"part": "assembly_blocks+resid", "ms": round(ms, 2)}),
          flush=True)

    # 2. diag inverse from cell-major blocks
    f_dinv = jax.jit(lambda b: batched_inv_small(b[:, 0]))
    ms, dinv = t(f_dinv, blocks)
    print(json.dumps({"part": "diag_inv", "ms": round(ms, 2)}), flush=True)

    # 3. layout transposes paid once per solve
    f_T = jax.jit(lambda b, di: (jnp.transpose(b, (1, 2, 3, 0)),
                                 jnp.transpose(di, (1, 2, 0)),
                                 stencil.corr_blocks(b)))
    ms, (bT, diT, corrB) = t(f_T, blocks, dinv)
    print(json.dumps({"part": "solve_transposes", "ms": round(ms, 2)}),
          flush=True)

    # 4. one T matvec + bjac
    xT = x0.T

    def mv1(bT_, diT_, xT_):
        y = stencil.apply_T(bT_, xT_, corrB)
        return jnp.einsum("ijc,jc->ic", diT_, y)

    ms, _ = t(jax.jit(mv1), bT, diT, xT, n=20)
    print(json.dumps({"part": "matvec_T+bjac", "ms": round(ms, 2)}),
          flush=True)

    # 5. cell-major warm-start matvec (ring_apply w/ stencil.apply)
    f_mv0 = jax.jit(lambda b, x: ring_apply(b, ring_j, x, stencil=stencil))
    ms, _ = t(f_mv0, blocks, x0, n=20)
    print(json.dumps({"part": "matvec_cell_major", "ms": round(ms, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
