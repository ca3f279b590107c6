r"""Fused assembled-ring matvec (Pallas).

The assembled-KSP Krylov loop (``solvers/assembled.py``) is
kernel-latency bound on TPU (PERF.md round 3): one T-layout ring matvec
``y = A x`` decomposes into ~6-8 masked slice-shift einsums (one per
(slot, offset) stencil term), each a separate XLA kernel with ~0.3-0.5
ms fixed dispatch cost, and slots shared by several offsets re-read
their (d, d, nc) block slab once per offset.

Here the matvec is split by *memory traffic*:

* the (tiny) neighbour-value preparation — per slot, sum the masked
  static slice-shifts of ``x`` — stays in XLA, where the pad/mask/add
  chains fuse into one or two elementwise kernels over (d, nc) arrays
  (Mosaic cannot load lane-unaligned shifted slices in-kernel: the
  stencil offsets are arbitrary cell counts, not multiples of 128);
* the (heavy) block contraction ``y_i = sum_s sum_k B[s,i,k] xs[s,k]``
  runs as ONE Pallas kernel over cell tiles — each block byte is read
  exactly once, unrolled multiply-adds on (1, tile) lane rows, all
  loads tile-aligned.

The nonconforming correction entries (O(boundary) rows) stay in XLA as
a compact gather + scatter-add, exactly as in ``ShiftStencil.apply_T``.

Non-TPU backends (the f64 CPU test suite) use the existing einsum path;
set ``THETIS_TPU_PALLAS_INTERPRET=1`` to exercise the kernels in Pallas
interpret mode on any backend (correctness tests).
"""
import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["ring_mv_pallas", "block_diag_mv_pallas"]

_TILE = 2048  # lanes per grid step
_INTERPRET = bool(int(os.environ.get("THETIS_TPU_PALLAS_INTERPRET", "0")))


def _on_fused_backend():
    return jax.default_backend() == "tpu" or _INTERPRET


def _mv_kernel(d, ns, xs_ref, blocks_ref, y_ref):
    """One cell tile: y_i = sum_s sum_k B[s*d*d + i*d + k] * xs[s*d + k]."""
    for i in range(d):
        acc = None
        for s in range(ns):
            b0 = s * d * d + i * d
            x0 = s * d
            for k in range(d):
                t = blocks_ref[b0 + k:b0 + k + 1, :] * \
                    xs_ref[x0 + k:x0 + k + 1, :]
                acc = t if acc is None else acc + t
        y_ref[i:i + 1, :] = acc


def _bjac_kernel(d, diag_ref, r_ref, z_ref):
    for i in range(d):
        row = diag_ref[i * d:i * d + 1, :] * r_ref[0:1, :]
        for k in range(1, d):
            row += diag_ref[i * d + k:i * d + k + 1, :] * r_ref[k:k + 1, :]
        z_ref[i:i + 1, :] = row


@functools.partial(jax.jit, static_argnums=(2, 3))
def _mv_call(blocks_flat, xs_flat, d, ns):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows_b = blocks_flat.shape[0]
    rows_x = xs_flat.shape[0]
    ntile = blocks_flat.shape[1] // _TILE
    kern = functools.partial(_mv_kernel, d, ns)
    return pl.pallas_call(
        kern,
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((rows_x, _TILE), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_b, _TILE), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, _TILE), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, blocks_flat.shape[1]),
                                       xs_flat.dtype),
        interpret=_INTERPRET,
    )(xs_flat, blocks_flat)


def _slot_inputs(stencil, xT, ns):
    """Per-slot masked shifted sums xs (ns*d, nc) — the XLA side of the
    fused matvec (fuses into 1-2 elementwise kernels)."""
    xs = [None] * ns
    xs[0] = xT
    for s, off, mask in stencil.terms:
        xk = stencil._shift_T(xT, off) * mask[:, 0].astype(xT.dtype)[None, :]
        xs[s] = xk if xs[s] is None else xs[s] + xk
    zero = jnp.zeros_like(xT)
    return jnp.concatenate([x if x is not None else zero for x in xs],
                           axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ring_mv_fused(stencil, blocks_T, xT):
    ns, d, _, nc = blocks_T.shape
    xs = _slot_inputs(stencil, xT, ns)
    ncp = -(-nc // _TILE) * _TILE
    bf = jnp.pad(blocks_T.reshape(ns * d * d, nc), ((0, 0), (0, ncp - nc)))
    xsf = jnp.pad(xs, ((0, 0), (0, ncp - nc)))
    return _mv_call(bf, xsf, d, ns)[:, :nc]


def _ring_mv_fwd(stencil, blocks_T, xT):
    return _ring_mv_fused(stencil, blocks_T, xT), (blocks_T, xT)


def _ring_mv_bwd(stencil, res, ybar):
    """Pallas kernels carry no AD rule; the (rare) backward pass runs in
    plain XLA.  y = sum_s B_s (M_s x) with M_s = sum_d mask_d shift_d:

    * xbar  = sum_s M_s^T (B_s^T ybar)  — reverse shifts after masking
    * B_s-bar = ybar (x) (M_s x)        — per-slot outer products
    """
    blocks_T, xT = res
    ns, d, _, nc = blocks_T.shape
    xs = _slot_inputs(stencil, xT, ns)          # (ns*d, nc)
    xs = xs.reshape(ns, d, nc)
    blocks_bar = jnp.einsum("ic,sjc->sijc", ybar, xs)
    # slot-0 (self) contribution
    xbar = jnp.einsum("ijc,ic->jc", blocks_T[0], ybar)
    for s, off, mask in stencil.terms:
        w = mask[:, 0].astype(ybar.dtype)[None, :]
        t = jnp.einsum("ijc,ic->jc", blocks_T[s], ybar) * w
        xbar = xbar + stencil._shift_T(t, -off)
    return blocks_bar, xbar


_ring_mv_fused.defvjp(_ring_mv_fwd, _ring_mv_bwd)


def ring_mv_pallas(stencil, blocks_T, xT):
    """Fused ring matvec: blocks_T (ns, d, d, nc), xT (d, nc) -> (d, nc).

    Correction (nonconforming) entries are NOT applied here — the caller
    adds them exactly as in :meth:`ShiftStencil.apply_T`.  Returns
    ``None`` when the fused path does not apply (backend).
    Reverse-differentiable via a custom VJP (backward in plain XLA)."""
    if not _on_fused_backend() or (
            jax.default_backend() == "tpu"
            and blocks_T.dtype == jnp.float64):
        # Mosaic has no f64 path (the TPU X64 rewriter cannot demote a
        # pallas custom call); f64 traces take the XLA einsum fallback.
        # Interpret mode (CPU tests) runs any dtype.
        return None
    return _ring_mv_fused(stencil, blocks_T, xT)


@functools.partial(jax.jit, static_argnums=(2,))
def _bjac_call(diag_flat, r_padded, d):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ntile = r_padded.shape[1] // _TILE
    kern = functools.partial(_bjac_kernel, d)
    return pl.pallas_call(
        kern,
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((d * d, _TILE), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, _TILE), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, _TILE), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(r_padded.shape, r_padded.dtype),
        interpret=_INTERPRET,
    )(diag_flat, r_padded)


def block_diag_mv_pallas(diag_T, rT):
    """Fused block-diagonal action: diag_T (d, d, nc), rT (d, nc)."""
    if not _on_fused_backend() or (
            jax.default_backend() == "tpu"
            and diag_T.dtype == jnp.float64):
        return None
    d, _, nc = diag_T.shape
    ncp = -(-nc // _TILE) * _TILE
    rp = jnp.pad(rT, ((0, 0), (0, ncp - nc)))
    df = jnp.pad(diag_T.reshape(d * d, nc), ((0, 0), (0, ncp - nc)))
    return _bjac_call(df, rp, d)[:, :nc]
