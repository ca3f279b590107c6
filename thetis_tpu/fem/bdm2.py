r"""Degree-2 Brezzi-Douglas-Marini space BDM2 on planar triangles.

The reference's ``bdm-dg`` family at ``polynomial_degree = 1``
(ref ``solver2d.py:329-336``: ``U = BDM(p+1)``, ``H = P(p)DG``) pairs
**BDM2 x P1DG**.  BDM2 is the full 12-dimensional ``(P2)^2``
(contravariant-Piola-mapped); the normal component is quadratic along
each facet.  Degrees of freedom (nodal, any unisolvent set spans the
space):

* per facet, v . n at THREE points — the two endpoints and the
  midpoint, in the facet's global vertex order along its global normal
  (9 dofs, shared between the adjacent cells: H(div) conformity);
* per cell, the two components of the cell-mean velocity plus one
  interior moment ``int_T v . curl(b_T)`` against the cubic bubble
  ``b_T = lambda0 lambda1 lambda2`` (3 dofs) — the standard BDM2
  interior functional, which the mean alone cannot close.

Dof array layout: flat ``(3*nf + 3*nc,)`` — facet dofs first
(``f*3 + point``), then cell dofs (``3*nf + c*3 + k``).

Construction, tabulation and the assembler API mirror
:class:`~thetis_tpu.fem.rt2.RT2Space`; the paired DG assembler must
carry ``quad_degree >= 5`` ((P2)^2 products are quartic and the bubble
moment is quintic).
"""
import numpy as np
import jax.numpy as jnp

__all__ = ["BDM2Space"]

_R = np.array([[0.0, 1.0], [-1.0, 0.0]])  # 2D curl: c = R grad(b)


def _w_eval(xi):
    """(..., 2) -> (..., 12, 2): e_comp * {1, x, y, x^2, xy, y^2}."""
    x, y = xi[..., 0], xi[..., 1]
    one = np.ones_like(x)
    polys = np.stack([one, x, y, x * x, x * y, y * y], axis=-1)
    out = np.zeros(xi.shape[:-1] + (12, 2))
    out[..., 0:6, 0] = polys
    out[..., 6:12, 1] = polys
    return out


def _w_div(xi):
    """(..., 2) -> (..., 12) reference divergences."""
    x, y = xi[..., 0], xi[..., 1]
    z = np.zeros_like(x)
    one = np.ones_like(x)
    return np.stack(
        [z, one, z, 2 * x, y, z,
         z, z, one, z, x, 2 * y], axis=-1)


def _w_grad(xi):
    """(..., 2) -> (..., 12, 2, 2) with [..., m, i, j] = d w_m[i]/d xi_j."""
    x, y = xi[..., 0], xi[..., 1]
    shp = xi.shape[:-1]
    dp = np.zeros(shp + (6, 2))     # d polys / d xi
    dp[..., 1, 0] = 1.0
    dp[..., 2, 1] = 1.0
    dp[..., 3, 0] = 2 * x
    dp[..., 4, 0] = y
    dp[..., 4, 1] = x
    dp[..., 5, 1] = 2 * y
    g = np.zeros(shp + (12, 2, 2))
    g[..., 0:6, 0, :] = dp
    g[..., 6:12, 1, :] = dp
    return g


class BDM2Space:
    """BDM2 function space + assembler over a planar Mesh2d (same API
    as :class:`~thetis_tpu.fem.rt2.RT2Space`)."""

    family = "BDM"
    degree = 2
    dim = 2
    is_dg = False

    def __init__(self, mesh, asm):
        self.mesh = mesh
        self.asm = asm
        if asm.space.quad_degree < 5:
            raise ValueError(
                "BDM2 needs a paired DG space with quad_degree >= 5 "
                f"(got {asm.space.quad_degree})")
        nc, nf = mesh.nc, mesh.nf
        self.n_facet_dofs = 3 * nf
        self.ndofs = 3 * nf + 3 * nc
        self.node_count = self.ndofs

        cells = np.asarray(mesh.cells_np)
        coords = np.asarray(mesh.coords_np)
        if coords.shape[1] != 2:
            raise NotImplementedError(
                "BDM2 supports planar meshes (use BDM1 on manifolds)")
        cf = np.asarray(mesh.cell_facets_np)
        fverts = np.asarray(mesh.facet_verts_np)
        nrm = np.asarray(mesh.facet_normal_np)
        detJ = np.asarray(mesh.detJ_np)

        ref_v = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        qp = np.asarray(asm.space._tab_np["qp"])
        qt = np.asarray(asm.space._tab_np["qt"])
        w_q = np.asarray(asm.space._tab_np["qw"])
        nq, nqf = len(w_q), len(qt)

        p0 = coords[cells[:, 0]]
        d1 = coords[cells[:, 1]] - p0
        d2 = coords[cells[:, 2]] - p0
        if getattr(mesh, "periodic_x_len", None) is not None or \
                getattr(mesh, "periodic_y_len", None) is not None:
            d1 = mesh._wrap_dx(d1)
            d2 = mesh._wrap_dx(d2)
        J = np.stack([d1, d2], axis=2)
        Jinv = np.asarray(mesh.Jinv_np)

        # facet-point reference coordinates per (cell, local facet,
        # point) in the GLOBAL facet direction: endpoints + midpoint
        lverts = cells[:, [[1, 2], [2, 0], [0, 1]]]
        gverts = fverts[cf]
        is_first = gverts[..., 0] == lverts[..., 0]
        ends_ref = ref_v[np.array([[1, 2], [2, 0], [0, 1]])]  # (3, 2, 2)
        e_ref = np.broadcast_to(ends_ref[None], (nc, 3, 2, 2)).copy()
        swap = ~is_first
        e_ref[swap] = e_ref[swap][:, ::-1]
        mid_ref = e_ref.mean(axis=2, keepdims=True)           # (nc, 3, 1, 2)
        # points ordered [end0, mid, end1] along the global traversal
        pts_ref = np.concatenate(
            [e_ref[:, :, :1], mid_ref, e_ref[:, :, 1:]], axis=2
        )                                                      # (nc, 3, 3, 2)

        W_p = _w_eval(pts_ref)                                 # (nc,3,3,12,2)
        v_p = np.einsum("cij,clpMj->clpMi", J, W_p) \
            / detJ[:, None, None, None, None]
        n_cl = nrm[cf]                                         # (nc, 3, 2)
        D_f = np.einsum("clpMi,cli->clpM", v_p, n_cl)          # (nc,3,3,12)

        W_q = _w_eval(qp)                                      # (nq, 12, 2)
        v_qm = np.einsum("cij,qMj->cqMi", J, W_q) / detJ[:, None, None, None]
        D_mean = np.einsum("q,cqMi->ciM", w_q, v_qm) * 2.0     # (nc, 2, 12)
        # bubble-curl moment: b = l0 l1 l2; c = R grad_x(b)
        lam = np.stack([1 - qp[:, 0] - qp[:, 1], qp[:, 0], qp[:, 1]],
                       axis=1)                                 # (nq, 3)
        dlam_ref = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
        # grad_ref(b) at quads: sum_k (prod_{j!=k} lam_j) dlam_k
        gb_ref = (lam[:, 1] * lam[:, 2])[:, None] * dlam_ref[0] \
            + (lam[:, 0] * lam[:, 2])[:, None] * dlam_ref[1] \
            + (lam[:, 0] * lam[:, 1])[:, None] * dlam_ref[2]   # (nq, 2)
        gb_x = np.einsum("qj,cji->cqi", gb_ref, Jinv)          # (nc, nq, 2)
        c_q = np.einsum("ij,cqj->cqi", _R, gb_x)
        D_bub = np.einsum("q,c,cqi,cqMi->cM", w_q, detJ, c_q, v_qm)
        # normalize the bubble functional per cell (it scales like
        # area/h against the O(1) point/mean dofs, which pushes the
        # nodal mass condition number to ~1e5 otherwise)
        D_bub = D_bub / np.linalg.norm(D_bub, axis=1, keepdims=True)
        D = np.concatenate(
            [D_f.reshape(nc, 9, 12), D_mean, D_bub[:, None, :]], axis=1)
        C = np.linalg.inv(D)                                   # (nc, 12, 12)

        # --- tabulations ---------------------------------------------------
        self.psi_q_np = np.einsum("cqMi,cMk->ckqi", v_qm, C)
        div_qm = _w_div(qp)[None] / detJ[:, None, None]
        self.div_q_np = np.einsum("cqM,cMk->ckq", div_qm, C)
        G_q = _w_grad(qp)
        g_qm = np.einsum("cij,qMjl,clk->cqMik", J, G_q, Jinv) \
            / detJ[:, None, None, None, None]
        self.grad_q_np = np.einsum("cqMik,cMm->cmqik", g_qm, C)

        fl = np.asarray(mesh.facet_local_np)
        fcells = np.asarray(mesh.facet_cells_np)
        variant = np.asarray(mesh.facet_variant_np)
        ref_fpts = np.zeros((6, nqf, 2))
        for loc in range(3):
            a = ref_v[(loc + 1) % 3]
            b = ref_v[(loc + 2) % 3]
            ref_fpts[2 * loc] = a[None] + qt[:, None] * (b - a)[None]
            ref_fpts[2 * loc + 1] = b[None] + qt[:, None] * (a - b)[None]
        tr = np.zeros((nf, 2, nqf, 12, 2))
        for side in range(2):
            c = fcells[:, side]
            pts = ref_fpts[variant[:, side]]
            Wp = _w_eval(pts)
            vp = np.einsum("fij,fqMj->fqMi", J[c], Wp) \
                / detJ[c][:, None, None, None]
            tr[:, side] = np.einsum("fqMi,fMk->fqki", vp, C[c])
        self.psi_tr_np = tr

        fmap = (cf[:, :, None] * 3
                + np.arange(3)[None, None, :]).reshape(nc, 9)
        cmap = 3 * nf + (np.arange(nc)[:, None] * 3
                         + np.arange(3)[None, :])
        self.dofmap_np = np.concatenate([fmap, cmap], axis=1).astype(
            np.int32)

        Mloc = np.einsum("q,c,ckqi,clqi->ckl", w_q, detJ,
                         self.psi_q_np, self.psi_q_np)
        self.Mloc_np = Mloc
        diag = np.zeros(self.ndofs)
        np.add.at(diag, self.dofmap_np.ravel(),
                  np.einsum("ckk->ck", Mloc).ravel())
        self._diag_np = np.maximum(diag, np.finfo(diag.dtype).tiny)

        self.psi_q = jnp.asarray(self.psi_q_np)
        self.div_q = jnp.asarray(self.div_q_np)
        self.grad_q = jnp.asarray(self.grad_q_np)
        self.psi_tr = jnp.asarray(self.psi_tr_np)
        self.dofmap = jnp.asarray(self.dofmap_np)
        self.Mloc = jnp.asarray(Mloc)
        self.mass_diag = jnp.asarray(self._diag_np)
        self.wdetJ = jnp.asarray(w_q[None, :] * detJ[:, None])
        flen = np.asarray(mesh.facet_len_np)
        self.wlen = jnp.asarray(
            np.asarray(asm.space._tab_np["qwf"])[None, :] * flen[:, None])
        a = coords[fverts[:, 0]]
        wrap = getattr(mesh, "_wrap_dx", lambda d: d)
        bv = a + wrap(coords[fverts[:, 1]] - a)
        self._fpts_np = np.stack([a, 0.5 * (a + bv), bv], axis=1)
        self._nrm_np = nrm

    # -- Function compatibility -----------------------------------------
    def zero_dofs(self):
        return jnp.zeros(self.ndofs)

    def dof_shape(self):
        return (self.ndofs,)

    def project_vector(self, value):
        """Nodal interpolation: facet dofs = v.n at [end0, mid, end1],
        cell dofs = [mean_x, mean_y, bubble moment] (the moment is set
        from pointwise evaluation over the cell quadrature)."""
        mesh = self.mesh
        nc = mesh.nc
        if callable(value):
            fp = self._fpts_np
            vf = np.asarray(value(fp[..., 0], fp[..., 1]))  # (nf, 3, 2)
            fd = np.einsum("fpi,fi->fp", vf, self._nrm_np)
            # cell means + bubble moments via quadrature
            qp = np.asarray(self.asm.space._tab_np["qp"])
            verts = np.asarray(mesh.coords_np)[np.asarray(mesh.cells_np)]
            lam = np.stack([1 - qp[:, 0] - qp[:, 1], qp[:, 0], qp[:, 1]],
                           axis=1)
            xy = np.einsum("qd,cdi->cqi", lam, verts)
            vq = np.asarray(value(xy[..., 0], xy[..., 1]))  # (nc, nq, 2)
            w = np.asarray(self.asm.space._tab_np["qw"])
            mean = np.einsum("q,cqi->ci", w, vq) * 2.0
            # reuse the construction's c_q? recompute cheaply:
            del mean
            # interior dofs: with the facet dofs fixed, L2-match the
            # remaining 3 per-cell coefficients to the target at the
            # quadrature points (exact whenever v is in BDM2)
            U = np.zeros(self.ndofs)
            U[: 3 * mesh.nf] = fd.ravel()
            dm = self.dofmap_np
            psi = np.asarray(self.psi_q_np)       # (nc, 12, nq, 2)
            wdet = np.asarray(self.wdetJ)
            known = fd.reshape(-1)[dm[:, :9]]      # (nc, 9)
            r = vq - np.einsum("ck,ckqi->cqi", known, psi[:, :9])
            A = psi[:, 9:]                         # (nc, 3, nq, 2)
            G = np.einsum("cq,ckqi,clqi->ckl", wdet, A, A)
            b = np.einsum("cq,ckqi,cqi->ck", wdet, A, r)
            cm = np.linalg.solve(G, b[:, :, None])[:, :, 0]
            U[3 * mesh.nf:] = cm.ravel()
            return jnp.asarray(U)
        value = jnp.asarray(value)
        if value.shape == (self.ndofs,):
            return value
        if value.ndim == 1 and value.shape[0] == 2:  # constant vector
            v0, v1 = float(value[0]), float(value[1])
            return self.project_vector(
                lambda x, y: np.stack(
                    [np.full_like(np.asarray(x, dtype=float), v0),
                     np.full_like(np.asarray(x, dtype=float), v1)],
                    axis=-1))
        raise ValueError(f"cannot project {value.shape} onto BDM2 dofs")

    # -- evaluation / projection (same API as RT2Space) ------------------
    def _cell_dofs(self, U):
        return U[self.dofmap]

    def cell_values(self, U):
        return jnp.einsum("ck,ckqi->cqi", self._cell_dofs(U), self.psi_q)

    def cell_div_q(self, U):
        return jnp.einsum("ck,ckq->cq", self._cell_dofs(U), self.div_q)

    def facet_traces(self, U):
        Uf = self._cell_dofs(U)[self.mesh.facet_cells]
        return jnp.einsum("fsk,fsqki->fsqi", Uf, self.psi_tr)

    def facet_un_quad(self, U):
        tr0 = jnp.einsum(
            "fk,fqki->fqi",
            self._cell_dofs(U)[self.mesh.facet_cells[:, 0]],
            self.psi_tr[:, 0],
        )
        n = self.mesh.facet_normal[:, None, :]
        return (tr0 * n).sum(-1)

    def _scatter(self, loc):
        return jnp.zeros(self.ndofs).at[self.dofmap].add(loc)

    def cell_to_dofs(self, Fq):
        loc = jnp.einsum("cq,cqi,ckqi->ck", self.wdetJ, Fq, self.psi_q)
        return self._scatter(loc)

    def div_to_dofs(self, Sq):
        loc = jnp.einsum("cq,cq,ckq->ck", self.wdetJ, Sq, self.div_q)
        return self._scatter(loc)

    def grad_to_dofs(self, Gq):
        loc = jnp.einsum("cq,cqij,ckqij->ck", self.wdetJ, Gq, self.grad_q)
        return self._scatter(loc)

    def facet_to_dofs(self, Ff):
        loc = jnp.einsum("fq,fsqi,fsqki->fsk", self.wlen, Ff, self.psi_tr)
        targets = self.dofmap[self.mesh.facet_cells]
        return jnp.zeros(self.ndofs).at[targets].add(loc)

    def bnd_normal_to_dofs(self, Fq):
        n = self.mesh.facet_normal[:, None, None, :]
        psin = (self.psi_tr[:, 0] * n).sum(-1)
        loc = jnp.einsum("fq,fq,fqk->fk", self.wlen, Fq, psin)
        targets = self.dofmap[self.mesh.facet_cells[:, 0]]
        return jnp.zeros(self.ndofs).at[targets].add(loc)

    def mass_apply(self, U):
        loc = jnp.einsum("ckl,cl->ck", self.Mloc, self._cell_dofs(U))
        return self._scatter(loc)

    def mass_inverse(self, r, iters=50):
        from jax import lax

        D = self.mass_diag

        def pcg(b):
            x = b / D
            res = b - self.mass_apply(x)
            z = res / D
            rz = (res * z).sum()

            def body(carry, _):
                x, p, res, rz = carry
                Ap = self.mass_apply(p)
                alpha = rz / jnp.maximum((p * Ap).sum(),
                                         jnp.finfo(rz.dtype).tiny)
                x = x + alpha * p
                res = res - alpha * Ap
                z = res / D
                rz_new = (res * z).sum()
                p = z + (rz_new / jnp.maximum(
                    rz, jnp.finfo(rz.dtype).tiny)) * p
                return (x, p, res, rz_new), None

            (x, _, _, _), _ = lax.scan(body, (x, z, res, rz), None,
                                       length=iters)
            return x

        return lax.custom_linear_solve(
            self.mass_apply, r, solve=lambda mv, b: pcg(b), symmetric=True
        )
