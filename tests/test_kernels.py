"""Pallas-kernel fallbacks: the fused ops must agree with dense
references on CPU (the TPU fast paths share the same call sites; the
dispatch in ``thetis_tpu/kernels`` picks the backend)."""
import numpy as np
import jax.numpy as jnp

from thetis_tpu.kernels import tridiag_solve


def test_tridiag_matches_dense():
    rng = np.random.default_rng(0)
    n = 13
    B = (5, 7)
    dl = rng.normal(size=B + (n,)) * 0.3
    du = rng.normal(size=B + (n,)) * 0.3
    dd = 2.0 + rng.random(B + (n,))
    rhs = rng.normal(size=B + (n,))
    x = np.asarray(tridiag_solve(jnp.asarray(dl), jnp.asarray(dd),
                                 jnp.asarray(du), jnp.asarray(rhs)))
    for i in np.ndindex(*B):
        A = (np.diag(dd[i]) + np.diag(dl[i][1:], -1)
             + np.diag(du[i][:-1], 1))
        assert np.abs(A @ x[i] - rhs[i]).max() < 1e-10


def test_tridiag_broadcasts_batch_axes():
    rng = np.random.default_rng(1)
    n = 9
    dl = rng.normal(size=(4, n)) * 0.2
    du = rng.normal(size=(4, n)) * 0.2
    dd = 2.0 + rng.random((4, n))
    rhs = rng.normal(size=(2, 4, n))  # extra leading axis on rhs only
    x = np.asarray(tridiag_solve(jnp.asarray(dl), jnp.asarray(dd),
                                 jnp.asarray(du), jnp.asarray(rhs)))
    assert x.shape == (2, 4, n)
    for k in range(2):
        for i in range(4):
            A = (np.diag(dd[i]) + np.diag(dl[i][1:], -1)
                 + np.diag(du[i][:-1], 1))
            assert np.abs(A @ x[k, i] - rhs[k, i]).max() < 1e-10


def test_ring_mv_pallas_matches_einsum_and_grads():
    """The fused Pallas ring matvec (interpret mode) must match the
    XLA einsum path in value AND in reverse-mode gradients (the custom
    VJP added round 5 — gradients through the assembled-KSP warm-start
    matvec flow through this kernel on TPU)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from thetis_tpu.mesh.generation import RectangleMesh
    from thetis_tpu.solvers.assembled import (
        cell_ring, get_stencil, ring_apply)
    from thetis_tpu.kernels import ringmv

    mesh = RectangleMesh(8, 4, 1e3, 5e2)
    ring, valid = cell_ring(mesh)
    stencil = get_stencil(mesh)
    assert stencil is not None
    nc = mesh.nc
    d = 3
    rng = np.random.RandomState(0)
    blocks = jnp.asarray(rng.randn(nc, 4, d, d))
    blocks = blocks * jnp.asarray(valid, blocks.dtype)[:, :, None, None]
    x = jnp.asarray(rng.randn(nc, d))
    ref = ring_apply(blocks, jnp.asarray(ring), x, stencil=None)
    # corrections handled by the caller: subtract them from the einsum
    # reference so the kernel-only outputs compare
    blocks_T = jnp.transpose(blocks, (1, 2, 3, 0))
    xT = x.T

    old = ringmv._INTERPRET
    ringmv._INTERPRET = True
    try:
        y = ringmv.ring_mv_pallas(stencil, blocks_T, xT)
        corr = jnp.zeros_like(ref)
        if stencil.n_corr:
            cb = stencil.corr_blocks_T(blocks_T)
            contrib = jnp.einsum("kij,jk->ik", cb, xT[:, stencil.corr_srcs])
            corr = corr.at[stencil.corr_rows].add(contrib.T)
        np.testing.assert_allclose(np.asarray(y.T + corr), np.asarray(ref),
                                   rtol=1e-12)

        # gradients: d/dx and d/dblocks of a scalar functional
        w = jnp.asarray(rng.randn(d, nc))

        def f_pallas(bT, xT):
            return jnp.vdot(w, ringmv.ring_mv_pallas(stencil, bT, xT))

        def f_ref(bT, xT):
            out = None
            bT0 = jnp.einsum("ijc,jc->ic", bT[0], xT)
            out = bT0
            for s, off, mask in stencil.terms:
                xs = stencil._shift_T(xT, off) * mask[:, 0].astype(
                    xT.dtype)[None, :]
                out = out + jnp.einsum("ijc,jc->ic", bT[s], xs)
            return jnp.vdot(w, out)

        g1 = jax.grad(f_pallas, argnums=(0, 1))(blocks_T, xT)
        g2 = jax.grad(f_ref, argnums=(0, 1))(blocks_T, xT)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-11, atol=1e-13)
    finally:
        ringmv._INTERPRET = old
