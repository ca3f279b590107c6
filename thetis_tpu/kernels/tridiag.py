r"""Fused batched tridiagonal (Thomas) solve.

Every implicit vertical operator in the 3D solver is a batched
tridiagonal column solve: implicit vertical viscosity of momentum (ref
``VerticalViscosityTerm`` / ``CoupledTwoStageRK`` implicit stage,
``coupled_timeintegrator.py:688-699``), implicit vertical diffusion of
tracers, and the GLS TKE/psi updates (ref ``turbulence.py`` vertical
solves).  The reference leaves these to PETSc columnwise solves; the
``lax.scan`` Thomas formulation costs 2*nz sequential device kernels
per solve (~0.5 ms fixed cost each on v5e — the scans dominate the
measured 7.2 ms/step implicit-vdiff phase at 12 layers).

Here the whole forward-elimination + back-substitution sweep runs as
ONE Pallas kernel: columns ride the 128-wide lane axis, the (static,
small) vertical extent is fully unrolled as straight-line VPU code, and
the grid tiles the column batch.  Non-TPU backends (the f64 CPU test
suite) fall back to the identical ``lax.scan`` formulation.

System convention (rows ``i = 0..n-1`` along the LAST axis):

    dl[i] x[i-1] + dd[i] x[i] + du[i] x[i+1] = rhs[i]

``dl[0]`` and ``du[n-1]`` are ignored.  All four operands share one
shape ``(..., n)``; the solve is batched over every leading axis.
"""
import jax
import jax.numpy as jnp

__all__ = ["tridiag_solve"]

_LANE = 128
_MAX_TILE = 4096   # lanes per grid step: (n, 4096) f32 rows stay ~2 MB
_MAX_UNROLL = 256  # straight-line unroll bound for the vertical extent


def _thomas_scan(dl, dd, du, rhs):
    """Reference ``lax.scan`` Thomas solve along the last axis (used on
    CPU and as the fallback for unsupported shapes)."""
    n = dd.shape[-1]

    def fwd(carry, i):
        cp_prev, dp_prev = carry
        m = dd[..., i] - dl[..., i] * cp_prev
        cp = du[..., i] / m
        dp = (rhs[..., i] - dl[..., i] * dp_prev) / m
        return (cp, dp), (cp, dp)

    z = jnp.zeros(dd.shape[:-1], dtype=dd.dtype)
    _, (cps, dps) = jax.lax.scan(fwd, (z, z), jnp.arange(n))
    cps = jnp.moveaxis(cps, 0, -1)
    dps = jnp.moveaxis(dps, 0, -1)

    def bwd(x_next, i):
        x = dps[..., i] - cps[..., i] * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, z, jnp.arange(n - 1, -1, -1))
    return jnp.moveaxis(xs, 0, -1)[..., ::-1]


def _thomas_kernel(dl_ref, dd_ref, du_ref, r_ref, x_ref):
    """Straight-line Thomas sweep; rows = vertical index (sublanes),
    columns = batched columns (lanes)."""
    n = dd_ref.shape[0]
    cp = [None] * n
    dp = [None] * n
    inv0 = 1.0 / dd_ref[0:1, :]
    cp[0] = du_ref[0:1, :] * inv0
    dp[0] = r_ref[0:1, :] * inv0
    for i in range(1, n):
        dli = dl_ref[i:i + 1, :]
        m = 1.0 / (dd_ref[i:i + 1, :] - dli * cp[i - 1])
        cp[i] = du_ref[i:i + 1, :] * m
        dp[i] = (r_ref[i:i + 1, :] - dli * dp[i - 1]) * m
    x = dp[n - 1]
    x_ref[n - 1:n, :] = x
    for i in range(n - 2, -1, -1):
        x = dp[i] - cp[i] * x
        x_ref[i:i + 1, :] = x


def _pallas_thomas(dl, dd, du, rhs):
    """(n, B) operands, B a multiple of the lane tile."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, B = dd.shape
    tile = min(_MAX_TILE, B)
    spec = pl.BlockSpec((n, tile), lambda j: (0, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _thomas_kernel,
        grid=(B // tile,),
        in_specs=[spec] * 4,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, B), dd.dtype),
    )(dl, dd, du, rhs)


def tridiag_solve(dl, dd, du, rhs):
    """Solve batched tridiagonal systems along the last axis.

    On TPU: one fused Pallas launch (vs ~2n ``lax.scan`` kernels).
    Elsewhere (or for extents beyond the unroll bound): ``lax.scan``.
    Operands broadcast against each other over the leading (batch) axes.
    """
    shape = jnp.broadcast_shapes(dl.shape, dd.shape, du.shape, rhs.shape)
    dl, dd, du, rhs = (jnp.broadcast_to(x, shape)
                       for x in (dl, dd, du, rhs))
    if (jax.default_backend() != "tpu"
            or dd.shape[-1] > _MAX_UNROLL or dd.shape[-1] < 1):
        return _thomas_scan(dl, dd, du, rhs)
    n = shape[-1]
    B = 1
    for s in shape[:-1]:
        B *= s
    dtype = dd.dtype
    tile = min(_MAX_TILE, max(_LANE, B))
    Bp = -(-B // tile) * tile

    def prep(x, pad):
        x = jnp.broadcast_to(x, shape).reshape(B, n)
        x = jnp.pad(x, ((0, Bp - B), (0, 0)), constant_values=pad)
        return x.T  # (n, Bp): vertical on sublanes, columns on lanes

    x = _pallas_thomas(prep(dl, 0.0), prep(dd, 1.0), prep(du, 0.0),
                       prep(rhs, 0.0))
    return x.T[:B].reshape(shape).astype(dtype)
