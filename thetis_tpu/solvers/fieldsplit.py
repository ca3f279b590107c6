r"""Schur-complement fieldsplit preconditioner on assembled ring blocks.

The TPU-native analogue of the reference's fieldsplit/Schur KSP
configuration for the implicit SWE system (ref ``options.py:44-48``
``pc_fieldsplit_type`` over (U_2d, H_2d); ref ``assembledschur.py:24-75``
``AssembledSchurPC`` assembling the elevation Schur complement for the
pressure-projection path).

Motivation (PERF.md round 3): the one-level block-Jacobi GMRES on the
monolithic assembled wave operator needs O(mesh-diameter) iterations at
large implicit wave CFL, and a Galerkin coarse correction on the
*monolithic* operator gains only ~2x — piecewise-constant coarse spaces
are a poor basis for the oscillatory coupled (uv, eta) wave operator.
The velocity-eliminated elevation Schur complement

    S = A_ee - A_eu diag(A_uu)^{-1} A_ue
      ~ M_eta + (theta dt)^2 g H (div grad)_DG  + jump penalties

is *elliptic* (a shifted DG Laplacian), exactly the operator class where
piecewise-constant aggregation coarse spaces are textbook-effective.
(Defining S with the velocity MASS inverse instead — the reference's
``AssembledSchurPC`` choice, ref ``assembledschur.py:36`` — was measured
*worse* here at large CFL: the factorization's velocity solves use
block-Jacobi sweeps anchored to diag(A_uu), and an S that is consistent
with that approximate inverse beats an S that is exact for an inverse
the sweeps don't realize.  96x48 bench, wave CFL 24: diag-S reaches
1.4e-2 in 24 outer FGMRES iterations where mass-S stalls at 0.9.)
This class applies the standard full Schur factorization

    z_u0  = Auu^{-1} r_u                (block-Jacobi-smoothed approx)
    z_eta = S^{-1} (r_eta - A_eu z_u0)  (fixed-iteration GMRES, two-level
                                         V-cycle preconditioner)
    z_u   = Auu^{-1} (r_u - A_ue z_eta)

as a complete preconditioner (``is_full_pc``) for the per-step assembled
KSP (``solvers/assembled.py::ring_gmres``).  Every inner S iteration
touches only elevation-row blocks (~90 MB of block traffic on the 102k
cell bench vs ~530 MB for a monolithic 9x9 iteration), so the inner
sweep is both cheaper per iteration AND O(1) in the wave CFL.

Setup is host-side (scipy.sparse Galerkin triple product for the coarse
matrix) from concrete rest-state blocks, once per solver; the per-step
application is pure gathers + batched small matmuls.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .assembled import (
    ring_apply, aggregate_cells, _ring_transpose,
    get_stencil,
)

__all__ = ["SchurFieldsplitPC"]


def _ring_to_csr(blocks, ring, p, q):
    """Host-side CSR of a 1-ring block operator (nc*p, nc*q)."""
    import scipy.sparse as sp

    nc = blocks.shape[0]
    ns = blocks.shape[1]
    rows = (np.arange(nc)[:, None, None, None] * p
            + np.arange(p)[None, None, :, None])
    cols = (ring[:, :, None, None] * q + np.arange(q)[None, None, None, :])
    rows = np.broadcast_to(rows, (nc, ns, p, q)).ravel()
    cols = np.broadcast_to(cols, (nc, ns, p, q)).ravel()
    return sp.coo_matrix(
        (np.asarray(blocks, dtype=np.float64).ravel(), (rows, cols)),
        shape=(nc * p, nc * q),
    ).tocsr()


def _rev_slots(ring):
    """rev[c, s] = slot of cell c inside ring[c, s]'s own ring."""
    nc = ring.shape[0]
    rr = ring[ring]  # (nc, 4, 4)
    return np.argmax(rr == np.arange(nc)[:, None, None], axis=-1)


class SchurFieldsplitPC:
    """Velocity-eliminated Schur fieldsplit on assembled ring blocks.

    :arg blocks: monolithic assembled blocks (nc, 4, d, d).  Packed
        layout per cell: ``[elev (d - n_u), uv (n_u)]`` when
        ``eta_first`` (the ``PackedState`` order of ``swe_state`` —
        dict keys flatten alphabetically), else ``[uv, elev]``.
    :arg ring: (nc, 4) closed 1-ring table
    :arg mesh: mesh (for the coarse-space cell aggregation)
    :arg n_u: leading packed dofs belonging to the velocity block
    :arg u_smooth: extra block-Jacobi refinement sweeps per velocity
        solve (0 = pure block-diagonal inverse)
    :arg s_iters: fixed inner GMRES iterations for the S solve
    :arg coarse_cap: max coarse-space dimension (dense inverse; kept
        small so the embedded constant stays compiler-friendly)
    :arg eta_first: packed-dof layout (see below)
    """

    is_full_pc = True

    def __init__(self, blocks, ring, mesh, n_u=6, u_smooth=2, s_iters=8,
                 coarse_cap=2048, eta_first=True):
        ring = np.asarray(ring)
        blocks_np = np.asarray(blocks, dtype=np.float64)
        nc, ns, d, _ = blocks_np.shape
        ne = d - n_u
        self.nc, self.n_u, self.ne = nc, n_u, ne
        self.u_smooth = int(u_smooth)
        self.s_iters = int(s_iters)
        dtype = jnp.asarray(blocks).dtype
        # packed-dof layout: PackedState of swe_state flattens dict keys
        # alphabetically -> [elev (ne), uv (n_u)] (eta_first); the
        # AssembledWavePC packing is [uv, elev] (eta_first=False)
        self.eta_first = bool(eta_first)
        if eta_first:
            se, su = slice(0, ne), slice(ne, d)
        else:
            su, se = slice(0, n_u), slice(n_u, d)
        self._su, self._se = su, se

        Auu = blocks_np[:, :, su, su]
        Aue = blocks_np[:, :, su, se]
        Aeu = blocks_np[:, :, se, su]
        Aee = blocks_np[:, :, se, se]
        Duu_inv = np.linalg.inv(Auu[:, 0])

        # ---- exact S diagonal blocks (for the Jacobi smoother):
        # S[c,c] = Aee[c,c] - sum_m Aeu[c,m] Duu_inv[m] Aue[m,c], with m
        # over the closed ring (the only cells coupling eta_c -> u -> eta_c)
        rev = _rev_slots(ring)
        Aue_back = Aue[ring, rev]          # (nc, 4, n_u, ne): u_{ring} <- eta_c
        Sdiag = Aee[:, 0] - np.einsum(
            "csem,csmn,csnf->cef", Aeu, Duu_inv[ring], Aue_back)
        Sdiag_inv = np.linalg.inv(Sdiag)

        # ---- Galerkin coarse matrix of S via scipy sparse (setup only)
        import scipy.sparse as sp

        S_sp = (_ring_to_csr(Aee, ring, ne, ne)
                - _ring_to_csr(Aeu, ring, ne, n_u)
                @ _ring_to_csr(Duu_inv[:, None], np.arange(nc)[:, None],
                               n_u, n_u)
                @ _ring_to_csr(Aue, ring, n_u, ne))
        target_size = max(16, int(np.ceil(nc * ne / float(coarse_cap))))
        agg, n_agg = aggregate_cells(mesh, target_size)
        P = sp.coo_matrix(
            (np.ones(nc * ne),
             (np.arange(nc * ne),
              (agg[:, None] * ne + np.arange(ne)[None, :]).ravel())),
            shape=(nc * ne, n_agg * ne),
        ).tocsr()
        A_c = (P.T @ S_sp @ P).toarray()
        self.agg = jnp.asarray(agg)
        self.n_agg = n_agg
        self.Ac_inv = jnp.asarray(np.linalg.inv(A_c), dtype=dtype)

        self.ring = jnp.asarray(ring)
        self.stencil = get_stencil(mesh)
        self.Auu = jnp.asarray(Auu, dtype=dtype)
        self.Aue = jnp.asarray(Aue, dtype=dtype)
        self.Aeu = jnp.asarray(Aeu, dtype=dtype)
        self.Aee = jnp.asarray(Aee, dtype=dtype)
        self.Duu_inv = jnp.asarray(Duu_inv, dtype=dtype)
        self.Sdiag_inv = jnp.asarray(Sdiag_inv, dtype=dtype)
        self._mesh = mesh
        self._transposed = None

    # ---- block applications ---------------------------------------------
    def _S(self, e):
        y = ring_apply(self.Aue, self.ring, e, stencil=self.stencil)
        y = jnp.einsum("cij,cj->ci", self.Duu_inv, y)
        return ring_apply(self.Aee, self.ring, e, stencil=self.stencil) \
            - ring_apply(self.Aeu, self.ring, y, stencil=self.stencil)

    def _usolve(self, r):
        z = jnp.einsum("cij,cj->ci", self.Duu_inv, r)
        for _ in range(self.u_smooth):
            z = z + jnp.einsum(
                "cij,cj->ci", self.Duu_inv,
                r - ring_apply(self.Auu, self.ring, z, stencil=self.stencil))
        return z

    def _coarse(self, r):
        r_c = jax.ops.segment_sum(r, self.agg, num_segments=self.n_agg)
        z_c = (self.Ac_inv @ r_c.reshape(-1)).reshape(self.n_agg, self.ne)
        return z_c[self.agg]

    def _vcycle(self, r):
        """Multiplicative two-level V-cycle on S: Jacobi - coarse - Jacobi."""
        z = jnp.einsum("cij,cj->ci", self.Sdiag_inv, r)
        r2 = r - self._S(z)
        z = z + self._coarse(r2)
        r3 = r - self._S(z)
        return z + jnp.einsum("cij,cj->ci", self.Sdiag_inv, r3)

    def _ssolve(self, b):
        """Fixed-iteration non-restarted GMRES on S, V-cycle
        right-preconditioned (static control flow for jit/scan; the outer
        KSP is FGMRES, so the fixed sweep being a nonlinear map is fine)."""
        nc, ne, m = self.nc, self.ne, self.s_iters
        bf = b.reshape(-1)
        n = bf.shape[0]
        dtype = bf.dtype
        tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype=dtype)
        brk = jnp.asarray(jnp.finfo(dtype).eps, dtype=dtype)
        beta = jnp.linalg.norm(bf)
        V0 = jnp.zeros((m + 1, n), dtype=dtype)
        V0 = V0.at[0].set(bf / jnp.maximum(beta, tiny))
        Z0 = jnp.zeros((m, n), dtype=dtype)
        H0 = jnp.zeros((m + 1, m), dtype=dtype)

        def arnoldi(j, VZH):
            V, Z, H = VZH
            z = self._vcycle(V[j].reshape(nc, ne)).reshape(-1)
            w = self._S(z.reshape(nc, ne)).reshape(-1)
            h = V @ w
            w = w - h @ V
            hj1 = jnp.linalg.norm(w)
            v_next = jnp.where(
                hj1 > brk * jnp.maximum(beta, tiny),
                w / jnp.maximum(hj1, tiny),
                jnp.zeros_like(w),
            )
            H = H.at[:, j].set(h).at[j + 1, j].set(hj1)
            V = V.at[j + 1].set(v_next)
            Z = Z.at[j].set(z)
            return V, Z, H

        V, Z, H = jax.lax.fori_loop(0, m, arnoldi, (V0, Z0, H0))
        e1 = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)
        y = jnp.linalg.lstsq(H, e1)[0]
        return (y @ Z).reshape(nc, ne)

    # ---- the preconditioner ----------------------------------------------
    def __call__(self, r):
        """r (nc, d) -> z (nc, d): one full Schur-factorization sweep."""
        r_u, r_e = r[:, self._su], r[:, self._se]
        w_u = self._usolve(r_u)
        z_e = self._ssolve(r_e - ring_apply(self.Aeu, self.ring, w_u,
                                            stencil=self.stencil))
        z_u = self._usolve(r_u - ring_apply(self.Aue, self.ring, z_e,
                                            stencil=self.stencil))
        if self.eta_first:
            return jnp.concatenate([z_e, z_u], axis=-1)
        return jnp.concatenate([z_u, z_e], axis=-1)

    def transpose(self):
        """PC for the transposed monolithic operator (implicit-diff
        adjoint solves).  Built lazily from the transposed ring blocks;
        its Schur complement is exactly S^T (diag(A_uu)^T block inverses
        commute with the per-cell transpose), so it preconditions A^T as
        well as the forward PC preconditions A."""
        if self._transposed is None:
            # may first fire inside an adjoint trace; the transposed PC
            # is cached on this object, so its device tables must be
            # concrete (CLAUDE.md tracer-leak convention)
            with jax.ensure_compile_time_eval():
                d = self.n_u + self.ne
                su, se = self._su, self._se
                blocks = jnp.zeros(
                    (self.nc, self.ring.shape[1], d, d),
                    dtype=self.Auu.dtype)
                blocks = blocks.at[:, :, su, su].set(self.Auu)
                blocks = blocks.at[:, :, su, se].set(self.Aue)
                blocks = blocks.at[:, :, se, su].set(self.Aeu)
                blocks = blocks.at[:, :, se, se].set(self.Aee)
                bT = _ring_transpose(blocks, self.ring)
                self._transposed = SchurFieldsplitPC(
                    bT, np.asarray(self.ring), self._mesh, n_u=self.n_u,
                    u_smooth=self.u_smooth, s_iters=self.s_iters,
                    eta_first=self.eta_first,
                )
        return self._transposed
