r"""Degree-2 Raviart-Thomas space RT2 on planar triangles.

The reference's DEFAULT ``rt-dg`` family member: ``get_functionspace``
builds ``RT(p+1) x P(p)DG`` and ``polynomial_degree`` defaults to 1,
i.e. **RT2 x P1DG** (ref ``thetis/utility.py:163-225``,
``solver2d.py:307-336``).  :mod:`thetis_tpu.fem.rt` provides the p = 0
member (RT1 x P0); this module provides RT2.

RT2 on a triangle is the 8-dimensional space ``(P1)^2 + x Phom1``
(contravariant-Piola-mapped from the reference cell).  Degrees of
freedom, chosen nodal for cheap TPU evaluation (any unisolvent set
spans the same space):

* per facet, the normal component (linear along the facet) is pinned by
  its values at the facet's two ENDPOINTS, in the facet's global vertex
  order and along its global normal — shared between the adjacent
  cells, giving H(div) conformity (same convention as BDM1,
  ``fem/bdm.py``);
* per cell, the two components of the cell-mean velocity.

Dof array layout: flat ``(2*nf + 2*nc,)`` — facet dofs first
(``f*2 + endpoint``), then cell dofs (``2*nf + c*2 + component``).

The basis is built numerically per cell at setup: physical monomials
``v_m(x) = J w_m(xi) / detJ`` (contravariant Piola) with the 8 x 8
nodal system solved by numpy; all quadrature tabulations are dense
mesh-static device tables, evaluation/projection are gathers + batched
contractions exactly like the RT1/BDM1 assemblers.
"""
import numpy as np
import jax.numpy as jnp

__all__ = ["RT2Space"]


def _w_eval(xi):
    """Reference monomials: (..., 2) points -> (..., 8, 2) values.

    m = 0..5: (P1)^2 = e_comp * {1, xi1, xi2}; m = 6, 7: xi * xi_k."""
    one = np.ones_like(xi[..., 0])
    polys = np.stack([one, xi[..., 0], xi[..., 1]], axis=-1)  # (..., 3)
    out = np.zeros(xi.shape[:-1] + (8, 2))
    out[..., 0:3, 0] = polys
    out[..., 3:6, 1] = polys
    out[..., 6, 0] = xi[..., 0] * xi[..., 0]
    out[..., 6, 1] = xi[..., 0] * xi[..., 1]
    out[..., 7, 0] = xi[..., 1] * xi[..., 0]
    out[..., 7, 1] = xi[..., 1] * xi[..., 1]
    return out


def _w_div(xi):
    """Reference divergence of the monomials: (..., 2) -> (..., 8)."""
    z = np.zeros_like(xi[..., 0])
    one = np.ones_like(z)
    return np.stack(
        [z, one, z, z, z, one, 3.0 * xi[..., 0], 3.0 * xi[..., 1]],
        axis=-1,
    )


def _w_grad(xi):
    """Reference gradients d w_m / d xi: (..., 2) -> (..., 8, 2, 2)
    with [..., m, i, j] = d w_m[i] / d xi_j."""
    shp = xi.shape[:-1]
    g = np.zeros(shp + (8, 2, 2))
    g[..., 1, 0, 0] = 1.0
    g[..., 2, 0, 1] = 1.0
    g[..., 4, 1, 0] = 1.0
    g[..., 5, 1, 1] = 1.0
    # w6 = (xi1^2, xi1 xi2)
    g[..., 6, 0, 0] = 2.0 * xi[..., 0]
    g[..., 6, 1, 0] = xi[..., 1]
    g[..., 6, 1, 1] = xi[..., 0]
    # w7 = (xi1 xi2, xi2^2)
    g[..., 7, 0, 0] = xi[..., 1]
    g[..., 7, 0, 1] = xi[..., 0]
    g[..., 7, 1, 1] = 2.0 * xi[..., 1]
    return g


class RT2Space:
    """RT2 function space + assembler over a planar Mesh2d.

    :arg asm: a P1DG :class:`~thetis_tpu.fem.assembly.DGAssembler`
        whose quadrature rules are shared (so the paired elevation
        space evaluates coefficients at identical points)."""

    family = "RT"
    degree = 2
    dim = 2
    is_dg = False

    def __init__(self, mesh, asm):
        self.mesh = mesh
        self.asm = asm
        if asm.space.quad_degree < 4:
            # RT2 basis products are quartic; the default P1DG rule
            # (degree 3, negative-weight 4-point) makes the quadrature
            # Gram indefinite.  Pair with
            # FunctionSpace(mesh, 'DG', 1, quad_degree=5).
            raise ValueError(
                "RT2 needs a paired DG space with quad_degree >= 4 "
                f"(got {asm.space.quad_degree})")
        nc, nf = mesh.nc, mesh.nf
        self.n_facet_dofs = 2 * nf
        self.ndofs = 2 * nf + 2 * nc
        self.node_count = self.ndofs

        cells = np.asarray(mesh.cells_np)
        coords = np.asarray(mesh.coords_np)
        if coords.shape[1] != 2:
            raise NotImplementedError(
                "RT2 supports planar meshes (use RT1/BDM1 on manifolds)")
        cf = np.asarray(mesh.cell_facets_np)        # (nc, 3)
        fverts = np.asarray(mesh.facet_verts_np)    # (nf, 2) global order
        nrm = np.asarray(mesh.facet_normal_np)      # (nf, 2)
        detJ = np.asarray(mesh.detJ_np)

        ref_v = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        qp = np.asarray(asm.space._tab_np["qp"])    # (nq, 2)
        qt = np.asarray(asm.space._tab_np["qt"])    # (nqf,)
        w_q = np.asarray(asm.space._tab_np["qw"])
        nq, nqf = len(w_q), len(qt)

        p0 = coords[cells[:, 0]]
        d1 = coords[cells[:, 1]] - p0
        d2 = coords[cells[:, 2]] - p0
        if getattr(mesh, "periodic_x_len", None) is not None or \
                getattr(mesh, "periodic_y_len", None) is not None:
            d1 = mesh._wrap_dx(d1)
            d2 = mesh._wrap_dx(d2)
        J = np.stack([d1, d2], axis=2)              # (nc, 2, 2)
        Jinv = np.asarray(mesh.Jinv_np)             # (nc, 2, 2) = J^-1

        # local facet endpoints in the GLOBAL facet vertex order: for the
        # cell's local facet l (vertices (l+1)%3 -> (l+2)%3), endpoint k
        # is global vertex fverts[cf[c, l], k]
        lverts = cells[:, [[1, 2], [2, 0], [0, 1]]]  # (nc, 3, 2) global ids
        gverts = fverts[cf]                          # (nc, 3, 2)
        # reference coordinates of each (local facet, global endpoint):
        # match global id to the local traversal's two ends
        is_first = gverts[..., 0] == lverts[..., 0]  # (nc, 3)
        # ref coords of traversal ends
        ends_ref = ref_v[np.array([[1, 2], [2, 0], [0, 1]])]  # (3, 2, 2)
        e_ref = np.broadcast_to(ends_ref[None], (nc, 3, 2, 2)).copy()
        swap = ~is_first
        e_ref[swap] = e_ref[swap][:, ::-1]

        # dof functionals on the monomials: D[c, k, m] = l_k(v_m)
        # facet dofs k = l*2 + end: v . n_global at the endpoint
        W_ends = _w_eval(e_ref)                      # (nc, 3, 2, 8, 2)
        v_ends = np.einsum("cij,cleMj->cleMi", J, W_ends) \
            / detJ[:, None, None, None, None]
        n_cl = nrm[cf]                               # (nc, 3, 2) global nrm
        D_f = np.einsum("cleMi,cli->cleM", v_ends, n_cl)  # (nc, 3, 2, 8)
        # cell dofs: mean of each component = (1/A) int v dx
        W_q = _w_eval(qp)                            # (nq, 8, 2)
        v_qm = np.einsum("cij,qMj->cqMi", J, W_q) / detJ[:, None, None, None]
        # mean over the reference cell with weights w_q (sum w = 1/2 =
        # ref area; physical mean = int v detJ dxi / (A = detJ/2))
        D_c = np.einsum("q,cqMi->ciM", w_q, v_qm) * 2.0   # (nc, 2, 8)
        D = np.concatenate(
            [D_f.reshape(nc, 6, 8), D_c.transpose(0, 1, 2)], axis=1
        )                                             # (nc, 8, 8)
        C = np.linalg.inv(D)                          # coeffs: psi_k = C[:, :, k] . w

        # --- tabulations of the nodal basis --------------------------------
        # cell quad values psi (nc, 8, nq, 2) and divergence (nc, 8, nq)
        self.psi_q_np = np.einsum("cqMi,cMk->ckqi", v_qm, C)
        dW_q = _w_div(qp)                             # (nq, 8)
        div_qm = dW_q[None] / detJ[:, None, None]     # (nc, nq, 8)
        self.div_q_np = np.einsum("cqM,cMk->ckq", div_qm, C)
        # physical gradients at quad points (nc, 8, nq, 2, 2):
        # grad_x v_m = J gradxi(w_m) J^-1 / detJ
        G_q = _w_grad(qp)                             # (nq, 8, 2, 2)
        g_qm = np.einsum("cij,qMjl,clk->cqMik", J, G_q, Jinv) \
            / detJ[:, None, None, None, None]
        self.grad_q_np = np.einsum("cqMik,cMm->cmqik", g_qm, C)

        # facet traces from both sides: (nf, 2, nqf, 8, 2)
        fl = np.asarray(mesh.facet_local_np)
        fcells = np.asarray(mesh.facet_cells_np)
        variant = np.asarray(mesh.facet_variant_np)
        ref_fpts = np.zeros((6, nqf, 2))
        for loc in range(3):
            a = ref_v[(loc + 1) % 3]
            b = ref_v[(loc + 2) % 3]
            ref_fpts[2 * loc] = a[None] + qt[:, None] * (b - a)[None]
            ref_fpts[2 * loc + 1] = b[None] + qt[:, None] * (a - b)[None]
        tr = np.zeros((nf, 2, nqf, 8, 2))
        for side in range(2):
            c = fcells[:, side]
            pts = ref_fpts[variant[:, side]]          # (nf, nqf, 2)
            Wp = _w_eval(pts)                         # (nf, nqf, 8, 2)
            vp = np.einsum("fij,fqMj->fqMi", J[c], Wp) \
                / detJ[c][:, None, None, None]
            tr[:, side] = np.einsum("fqMi,fMk->fqki", vp, C[c])
        self.psi_tr_np = tr

        # --- global dof map (nc, 8) ---------------------------------------
        fmap = (cf[:, :, None] * 2
                + np.arange(2)[None, None, :]).reshape(nc, 6)
        cmap = 2 * nf + (np.arange(nc)[:, None] * 2
                         + np.arange(2)[None, :])
        self.dofmap_np = np.concatenate([fmap, cmap], axis=1).astype(
            np.int32)

        # --- mass ----------------------------------------------------------
        Mloc = np.einsum("q,c,ckqi,clqi->ckl", w_q, detJ,
                         self.psi_q_np, self.psi_q_np)
        self.Mloc_np = Mloc
        diag = np.zeros(self.ndofs)
        np.add.at(diag, self.dofmap_np.ravel(),
                  np.einsum("ckk->ck", Mloc).ravel())
        self._diag_np = np.maximum(diag, np.finfo(diag.dtype).tiny)

        # --- device tables -------------------------------------------------
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
        # facet-endpoint coordinates for nodal interpolation
        a = coords[fverts[:, 0]]
        wrap = getattr(mesh, "_wrap_dx", lambda d: d)
        b = a + wrap(coords[fverts[:, 1]] - a)
        self._fpts_np = np.stack([a, b], axis=1)      # (nf, 2, 2)
        self._nrm_np = nrm

    # -- Function compatibility -----------------------------------------
    def zero_dofs(self):
        return jnp.zeros(self.ndofs)

    def dof_shape(self):
        return (self.ndofs,)

    def project_vector(self, value):
        """Nodal interpolation of a velocity field: facet dofs = v.n at
        the facet endpoints, cell dofs = cell-mean components.  ``value``
        may be a constant (2,) vector, a callable f(x, y) -> (..., 2),
        or a ready flat dof array."""
        mesh = self.mesh
        if callable(value):
            fp = self._fpts_np
            vf = np.asarray(value(fp[..., 0], fp[..., 1]))  # (nf, 2, 2)
            fd = np.einsum("fei,fi->fe", vf, self._nrm_np)
            mid = np.asarray(mesh.coords_np)[np.asarray(
                mesh.cells_np)].mean(axis=1)
            vc = np.asarray(value(mid[:, 0], mid[:, 1]))    # (nc, 2)
            return jnp.asarray(np.concatenate([fd.ravel(), vc.ravel()]))
        value = jnp.asarray(value)
        if value.shape == (self.ndofs,):
            return value
        if value.ndim == 1 and value.shape[0] == 2:  # constant vector
            fd = (value[None, None, :] * jnp.asarray(
                self._nrm_np)[:, None, :]).sum(-1)    # (nf, 2)
            vc = jnp.broadcast_to(value, (mesh.nc, 2))
            return jnp.concatenate([fd.reshape(-1), vc.reshape(-1)])
        raise ValueError(f"cannot project {value.shape} onto RT2 dofs")

    # -- evaluation ------------------------------------------------------
    def _cell_dofs(self, U):
        return U[self.dofmap]                        # (nc, 8)

    def cell_values(self, U):
        return jnp.einsum("ck,ckqi->cqi", self._cell_dofs(U), self.psi_q)

    def cell_div_q(self, U):
        """div(u) at cell quad points: (nc, nq)."""
        return jnp.einsum("ck,ckq->cq", self._cell_dofs(U), self.div_q)

    def facet_traces(self, U):
        """(nf, 2, nqf, 2) both-side velocity traces."""
        Uf = self._cell_dofs(U)[self.mesh.facet_cells]   # (nf, 2, 8)
        return jnp.einsum("fsk,fsqki->fsqi", Uf, self.psi_tr)

    def facet_un_quad(self, U):
        """Normal velocity at facet quad points (single-valued by
        conformity; evaluated from side 0): (nf, nqf)."""
        tr0 = jnp.einsum(
            "fk,fqki->fqi",
            self._cell_dofs(U)[self.mesh.facet_cells[:, 0]],
            self.psi_tr[:, 0],
        )
        n = self.mesh.facet_normal[:, None, :]
        return (tr0 * n).sum(-1)

    # -- projection ------------------------------------------------------
    def _scatter(self, loc):
        """(nc, 8) local test contributions -> flat dofs."""
        return jnp.zeros(self.ndofs).at[self.dofmap].add(loc)

    def cell_to_dofs(self, Fq):
        """(nc, nq, 2) vector integrand against psi."""
        loc = jnp.einsum("cq,cqi,ckqi->ck", self.wdetJ, Fq, self.psi_q)
        return self._scatter(loc)

    def div_to_dofs(self, Sq):
        """(nc, nq) scalar integrand against div(psi)."""
        loc = jnp.einsum("cq,cq,ckq->ck", self.wdetJ, Sq, self.div_q)
        return self._scatter(loc)

    def grad_to_dofs(self, Gq):
        """(nc, nq, 2, 2) tensor integrand against grad(psi):
        G : grad(psi_k)."""
        loc = jnp.einsum("cq,cqij,ckqij->ck", self.wdetJ, Gq, self.grad_q)
        return self._scatter(loc)

    def facet_to_dofs(self, Ff):
        """(nf, 2, nqf, 2) per-side vector integrand against the side
        cells' traces."""
        loc = jnp.einsum("fq,fsqi,fsqki->fsk", self.wlen, Ff, self.psi_tr)
        targets = self.dofmap[self.mesh.facet_cells]     # (nf, 2, 8)
        return jnp.zeros(self.ndofs).at[targets].add(loc)

    def bnd_normal_to_dofs(self, Fq):
        """(nf, nqf) scalar integrand against psi.n of the side-0 cell
        (caller masks to boundary facets)."""
        n = self.mesh.facet_normal[:, None, None, :]     # (nf, 1, 1, 2)
        psin = (self.psi_tr[:, 0] * n).sum(-1)           # (nf, nqf, 8)
        loc = jnp.einsum("fq,fq,fqk->fk", self.wlen, Fq, psin)
        targets = self.dofmap[self.mesh.facet_cells[:, 0]]
        return jnp.zeros(self.ndofs).at[targets].add(loc)

    # -- mass ------------------------------------------------------------
    def mass_apply(self, U):
        loc = jnp.einsum("ckl,cl->ck", self.Mloc, self._cell_dofs(U))
        return self._scatter(loc)

    def mass_inverse(self, r, iters=40):
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
