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
