r"""Lowest-order Brezzi-Douglas-Marini space BDM1 on triangles.

The reference's ``bdm-dg`` family (ref ``solver2d.py:329-336``) pairs a
BDM H(div) velocity with DG elevation; this implements the lowest-order
member **BDM1 x P0**.  BDM1 is the full vector-P1 space (6 dofs/cell)
with H(div) conformity imposed through the facet dofs: the normal
component is *linear* along each facet, and the two dofs per facet are
its values at the facet's endpoints (in the facet's global vertex
order), shared between the adjacent cells.

The basis is built numerically per cell: tangent vector-P1 functions
``v(xi) = J w(xi)`` (``w`` a 2-vector of P1 polynomials on the reference
triangle, ``J`` the (gdim, 2) cell Jacobian — tangent-plane valued on
embedded manifolds), with coefficients solving the 6x6 dof system
``psi_k . n_f (endpoint) = delta``.  Divergence and gradient are cell
constants via the planar pseudo-inverse ``J^+``.

Dof array layout: ``(nf, 2)`` — normal velocity at the two endpoints of
each facet along the facet's global normal.
"""
import numpy as np
import jax.numpy as jnp

__all__ = ["BDMSpace"]


class BDMSpace:
    """Lowest-order BDM function space + assembler over a Mesh2d or
    SphereMesh; mirrors the :class:`~thetis_tpu.fem.rt.RTSpace` API."""

    family = "BDM"
    degree = 1
    dim = 2
    is_dg = False

    def __init__(self, mesh, asm):
        self.mesh = mesh
        self.asm = asm
        self.ndofs = 2 * mesh.nf
        self.node_count = 2 * mesh.nf
        nc = mesh.nc

        cells = np.asarray(mesh.cells_np)
        coords = np.asarray(mesh.coords_np)
        cf = np.asarray(mesh.cell_facets_np)       # (nc, 3)
        flen = np.asarray(mesh.facet_len_np)
        fverts = np.asarray(mesh.facet_verts_np)   # (nf, 2) global order
        nrm = np.asarray(mesh.facet_normal_np)     # (nf, gdim)
        detJ = np.asarray(mesh.detJ_np)
        gdim = coords.shape[1]
        self.gdim = gdim

        ref_v = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        qp = np.asarray(asm.space._tab_np["qp"])
        qt = np.asarray(asm.space._tab_np["qt"])
        w_q = np.asarray(asm.space._tab_np["qw"])
        nq = len(w_q)
        nqf = len(qt)

        p0 = coords[cells[:, 0]]
        d1 = coords[cells[:, 1]] - p0
        d2 = coords[cells[:, 2]] - p0
        if getattr(mesh, "periodic_x_len", None) is not None:
            d1 = mesh._wrap_dx(d1)
            d2 = mesh._wrap_dx(d2)
        J = np.stack([d1, d2], axis=2)             # (nc, gdim, 2)
        JtJ = np.einsum("cik,cil->ckl", J, J)
        Jpinv = np.einsum("ckl,cil->cki", np.linalg.inv(JtJ), J)  # (nc,2,gdim)

        # monomial basis of w: index m -> (component, poly) with
        # polys {1, xi1, xi2}: w_m(xi) = e_comp * poly(xi)
        def w_eval(xi):
            """(..., 2) ref points -> (..., 6, 2) monomial values."""
            one = np.ones_like(xi[..., 0])
            polys = np.stack([one, xi[..., 0], xi[..., 1]], axis=-1)  # (...,3)
            out = np.zeros(xi.shape[:-1] + (6, 2))
            out[..., 0:3, 0] = polys
            out[..., 3:6, 1] = polys
            return out

        # dof evaluation points: local facet i (opposite vertex i) has
        # global endpoints fverts[f] — find their reference coords within
        # the cell via the cell's vertex ids
        f_of = cf                                   # (nc, 3) facet ids
        # reference coords of each cell vertex id
        ref_of_vertex = np.zeros((nc, 3, 2))
        for loc in range(3):
            ref_of_vertex[:, loc] = ref_v[loc]
        # endpoint reference coords per (cell, local facet, endpoint)
        dof_ref = np.zeros((nc, 3, 2, 2))
        dof_n = np.zeros((nc, 3, 2, gdim))
        for i in range(3):
            fids = f_of[:, i]
            for e in range(2):
                gv = fverts[fids, e]                # global vertex id
                # local index of gv within the cell
                loc_idx = np.argmax(cells == gv[:, None], axis=1)
                dof_ref[:, i, e] = ref_v[loc_idx]
                dof_n[:, i, e] = nrm[fids]
        dof_ref = dof_ref.reshape(nc, 6, 2)
        dof_n = dof_n.reshape(nc, 6, gdim)

        # D[c, j, m] = (J w_m(xi_j)) . n_j
        wm = w_eval(dof_ref)                        # (nc, 6, 6, 2)
        Jw = np.einsum("cik,cjmk->cjmi", J, wm)     # (nc, 6dof, 6mono, gdim)
        D = np.einsum("cjmi,cji->cjm", Jw, dof_n)
        C = np.linalg.inv(D)                        # coeffs: psi_k = sum_m C[m,k] w_m
        self.C = C

        # cell-quad tabulation: psi (nc, 6, nq, gdim)
        wq = w_eval(qp)                             # (nq, 6, 2)
        psi_q = np.einsum("cik,qmk,cmj->cjqi", J, wq, C)
        self.psi_q_np = psi_q

        # divergence (constant): dw/dxi of monomials
        dw = np.zeros((6, 2, 2))                    # (mono, comp, dxi)
        dw[1, 0, 0] = 1.0
        dw[2, 0, 1] = 1.0
        dw[4, 1, 0] = 1.0
        dw[5, 1, 1] = 1.0
        # grad psi_k = J (sum_m C[m,k] dw_m) J^+  (nc, 6, gdim, gdim)
        dwk = np.einsum("mkl,cmj->cjkl", dw, C)     # (nc, 6, comp, dxi)
        grad = np.einsum("cik,cjkl,clh->cjih", J, dwk, Jpinv)
        self.grad_np = grad                         # (nc,6,gdim,gdim)
        self.div_np = np.einsum("cjii->cj", grad)   # (nc, 6)

        # facet traces of all 6 cell basis functions: (nf, 2side, nqf, 6, gdim)
        variant = np.asarray(mesh.facet_variant_np)
        fcells = np.asarray(mesh.facet_cells_np)
        ref_fpts = np.zeros((6, nqf, 2))
        for loc in range(3):
            a = ref_v[(loc + 1) % 3]
            b = ref_v[(loc + 2) % 3]
            ref_fpts[2 * loc] = a[None] + qt[:, None] * (b - a)[None]
            ref_fpts[2 * loc + 1] = b[None] + qt[:, None] * (a - b)[None]
        tr = np.zeros((mesh.nf, 2, nqf, 6, gdim))
        for side in range(2):
            c = fcells[:, side]
            pts = ref_fpts[variant[:, side]]        # (nf, nqf, 2)
            wf = w_eval(pts)                        # (nf, nqf, 6, 2)
            tr[:, side] = np.einsum("fik,fqmk,fmj->fqji", J[c], wf, C[c])
        self.psi_tr_np = tr

        # dof scatter: cell local dof j=(i,e) -> (facet f_of[c,i], e)
        self.cell_facets_np = cf
        self.dof_facets = jnp.asarray(
            np.repeat(cf, 2, axis=1), dtype=jnp.int32)        # (nc, 6)
        self.dof_ends = jnp.asarray(
            np.tile(np.array([0, 1], dtype=np.int32), (nc, 3)))  # (nc, 6)

        # mass matrix (6x6 per cell)
        Mloc = np.einsum("q,c,cjqi,ckqi->cjk", w_q, detJ, psi_q, psi_q)
        diag = np.zeros((mesh.nf, 2))
        np.add.at(
            diag,
            (np.asarray(np.repeat(cf, 2, axis=1)),
             np.tile(np.array([0, 1]), (nc, 3))),
            np.einsum("cjj->cj", Mloc),
        )
        self._diag = jnp.asarray(np.maximum(diag, np.finfo(float).tiny))

        self.psi_q = jnp.asarray(psi_q)
        self.psi_tr = jnp.asarray(tr)
        self.div = jnp.asarray(self.div_np)
        self.grad = jnp.asarray(grad)
        self.Mloc = jnp.asarray(Mloc)
        self.wdetJ = jnp.asarray(w_q[None, :] * detJ[:, None])
        self.wlen = jnp.asarray(
            np.asarray(asm.space._tab_np["qwf"])[None, :] * flen[:, None]
        )
        # normal trace of each basis on its OWN facet at facet quad
        # points, from the owning (side-0) cell — for boundary terms
        qt_tab = np.stack([1.0 - qt, qt], axis=-1)  # (nqf, 2): hats at av,bv
        self._own_trace = jnp.asarray(qt_tab)       # psi_(f,e).n_f = hat_e
        self.sigma_np = np.where(
            np.asarray(mesh.cell_sides_np) == 0, 1.0, -1.0)

    # -- Function compatibility ----------------------------------------
    def zero_dofs(self):
        return jnp.zeros((self.mesh.nf, 2))

    def dof_shape(self):
        return (self.mesh.nf, 2)

    def project_vector(self, value):
        """U[f, e] = u(endpoint_e) . n_f (exact for BDM1 fields)."""
        mesh = self.mesh
        nrm = mesh.facet_normal
        value = jnp.asarray(value)
        fv = mesh.facet_verts
        if value.ndim <= 1 and value.shape != (mesh.nf,):
            un = (jnp.broadcast_to(value, (mesh.nf, self.gdim))
                  * nrm).sum(-1)
            return jnp.stack([un, un], axis=-1)
        if value.shape[:1] == (mesh.nv,) and value.ndim == 2:
            return jnp.stack(
                [(value[fv[:, 0]] * nrm).sum(-1),
                 (value[fv[:, 1]] * nrm).sum(-1)], axis=-1)
        if value.shape == (mesh.nf, 2) and self.gdim == 2:
            # ambiguous with a vector per facet: treat as dof array
            return value
        if value.shape == (mesh.nf, 2):
            return value
        raise ValueError(f"cannot project {value.shape} onto BDM dofs")

    # -- evaluation -----------------------------------------------------
    def _cell_dofs(self, U):
        """(nf, 2) -> (nc, 6) local dof values."""
        return U[self.dof_facets, self.dof_ends]

    def cell_values(self, U):
        return jnp.einsum("cj,cjqi->cqi", self._cell_dofs(U), self.psi_q)

    def cell_div(self, U):
        return (self._cell_dofs(U) * self.div).sum(axis=1)

    def facet_traces(self, U):
        Uc = self._cell_dofs(U)                     # (nc, 6)
        fcells = self.mesh.facet_cells
        Uf = Uc[fcells]                             # (nf, 2, 6)
        return jnp.einsum("fsj,fsqji->fsqi", Uf, self.psi_tr)

    def facet_un_mean(self, U):
        """Mean normal velocity per facet (exact facet-flux density for
        the linear normal trace)."""
        return U.mean(axis=-1)

    def facet_un_quad(self, U):
        """Normal velocity at facet quad points (nf, nqf)."""
        return jnp.einsum("fe,qe->fq", U, self._own_trace)

    # -- projections ----------------------------------------------------
    def _scatter(self, loc):
        """(nc, 6) local contributions -> (nf, 2) dofs."""
        return jnp.zeros((self.mesh.nf, 2)).at[
            self.dof_facets, self.dof_ends].add(loc)

    def cell_to_dofs(self, Fq):
        loc = jnp.einsum("cq,cqi,cjqi->cj", self.wdetJ, Fq, self.psi_q)
        return self._scatter(loc)

    def div_to_dofs(self, Sq):
        cell_int = jnp.einsum("cq,cq->cq", self.wdetJ, Sq)
        loc = jnp.einsum("cq,cj->cj", cell_int, self.div)
        return self._scatter(loc)

    def grad_to_dofs(self, Gq):
        """Tensor integrand (nc, nq, gdim, gdim) against grad(psi)."""
        loc = jnp.einsum("cq,cqih,cjih->cj", self.wdetJ, Gq, self.grad)
        return self._scatter(loc)

    def facet_to_dofs(self, Ff):
        """(nf, 2side, nqf, gdim) integrand against psi traces."""
        loc = jnp.einsum("fq,fsqi,fsqji->fsj", self.wlen, Ff, self.psi_tr)
        fcells = self.mesh.facet_cells
        tgt_f = self.dof_facets[fcells]             # (nf, 2, 6)
        tgt_e = self.dof_ends[fcells]
        return jnp.zeros((self.mesh.nf, 2)).at[tgt_f, tgt_e].add(loc)

    def bnd_normal_to_dofs(self, Fq):
        """Boundary term: integrand (nf, nqf) against the own-facet
        normal trace (endpoint hats), accumulated on the facet's own
        dofs (side-0 owner)."""
        loc = jnp.einsum("fq,qe->fe", self.wlen * Fq, self._own_trace)
        return loc  # (nf, 2) — caller masks to boundary facets

    # -- mass -----------------------------------------------------------
    def mass_apply(self, U):
        loc = jnp.einsum("cjk,ck->cj", self.Mloc, self._cell_dofs(U))
        return self._scatter(loc)

    def mass_inverse(self, r, iters=40):
        from jax import lax

        D = self._diag

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
