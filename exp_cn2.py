"""Round-4 CN micro-benchmarks, measured INSIDE lax.scan loops (a single
dispatched call pays ~27 ms of axon-tunnel latency, so per-op costs are
only measurable as scanned-loop differences)."""
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


def scan_time(fn, x0, n=100, reps=3):
    """Wall time per iteration of x = norm_step(fn(x)) inside one jit."""

    @jax.jit
    def loop(x):
        def body(c, _):
            y = fn(c)
            # cheap rescale keeps values finite without a full norm
            return y * 0.999, None

        out, _ = jax.lax.scan(body, x, None, length=n)
        return out

    out = jax.block_until_ready(loop(x0))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(loop(x0))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3


def main():
    from thetis_tpu.solvers.assembled import (
        PackedState, get_coloring, get_stencil, batched_inv_small_T,
        ring_apply_T, CoarseCorrection,
    )
    from thetis_tpu.kernels.ringmv import ring_mv_pallas

    mesh, eq, st, sol, fields, ps, dt = build(320, 160, pc="none")
    ring, _, _ = get_coloring(mesh)
    stencil = get_stencil(mesh)
    x0 = ps.pack(sol)
    nc, d = x0.shape

    blocks_T, r_lag = jax.jit(
        lambda s: eq.assemble_operator_blocks(
            s, fields, {}, 0.5 * dt, return_residual=True, layout="T")
    )(sol)
    blocks_T = jax.block_until_ready(blocks_T)
    diag_T = batched_inv_small_T(blocks_T[0])
    corrB = stencil.corr_blocks_T(blocks_T)

    xT = x0.T

    # einsum (XLA) matvec
    def mv_xla(v):
        y = jnp.einsum("ijc,jc->ic", blocks_T[0], v)
        for s, dd, mask in stencil.terms:
            xs = stencil._shift_T(v, dd) * mask[:, 0].astype(v.dtype)[None, :]
            y = y + jnp.einsum("ijc,jc->ic", blocks_T[s], xs)
        if stencil.n_corr:
            xsrc = v[:, stencil.corr_srcs]
            contrib = jnp.einsum("kij,jk->ik", corrB, xsrc)
            y = y.at[:, stencil.corr_rows].add(contrib)
        return y

    ms = scan_time(mv_xla, xT)
    print(json.dumps({"op": "mv_xla_T", "ms": round(ms, 3)}), flush=True)

    # pallas fused matvec
    def mv_pl(v):
        y = ring_mv_pallas(stencil, blocks_T, v)
        if stencil.n_corr:
            xsrc = v[:, stencil.corr_srcs]
            contrib = jnp.einsum("kij,jk->ik", corrB, xsrc)
            y = y.at[:, stencil.corr_rows].add(contrib)
        return y

    ms = scan_time(mv_pl, xT)
    print(json.dumps({"op": "mv_pallas_T", "ms": round(ms, 3)}), flush=True)

    err = float(jnp.abs(mv_pl(xT) - mv_xla(xT)).max()
                / jnp.abs(mv_xla(xT)).max())
    print(json.dumps({"op": "mv_rel_err", "err": err}), flush=True)

    # block-jacobi
    def bjac(v):
        return jnp.einsum("ijc,jc->ic", diag_T, v)

    ms = scan_time(bjac, xT)
    print(json.dumps({"op": "bjac_xla", "ms": round(ms, 3)}), flush=True)

    from thetis_tpu.kernels.ringmv import block_diag_mv_pallas

    ms = scan_time(lambda v: block_diag_mv_pallas(diag_T, v), xT)
    print(json.dumps({"op": "bjac_pallas", "ms": round(ms, 3)}), flush=True)

    # full V-cycle with coarse
    coarse = CoarseCorrection(
        jnp.transpose(blocks_T, (3, 0, 1, 2)), np.asarray(ring), mesh)

    def vcycle(v):
        r = v
        z = bjac(r)
        r2 = r - mv_pl(z)
        z = z + coarse(r2.T).T
        r3 = r - mv_pl(z)
        return z + bjac(r3)

    ms = scan_time(vcycle, xT)
    print(json.dumps({"op": "vcycle_pallas_mv", "ms": round(ms, 3)}),
          flush=True)

    def vcycle_xla(v):
        r = v
        z = bjac(r)
        r2 = r - mv_xla(z)
        z = z + coarse(r2.T).T
        r3 = r - mv_xla(z)
        return z + bjac(r3)

    ms = scan_time(vcycle_xla, xT)
    print(json.dumps({"op": "vcycle_xla_mv", "ms": round(ms, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
