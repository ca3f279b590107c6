r"""Lowest-order Raviart-Thomas space RT1 on triangles.

TPU-native H(div) element for the mimetic ``rt-dg`` shallow-water pair
(ref ``solver2d.py:307-336``: velocity in RT, elevation in DG; this
implementation provides the lowest-order member RT1 x P0).

Degrees of freedom are the facet normal velocities: one dof per mesh
facet, globally shared between the two adjacent cells so the normal
component is continuous (the H(div) conformity).  The basis function of
cell ``c`` attached to its local facet ``i`` (opposite local vertex
``i``) is, in physical coordinates,

    psi_i(x) = sigma * |e_i| / (2 A_c) * (x - p_i),

with sigma = +1 when the cell is the facet's side-0 owner and -1
otherwise, so that ``psi_i . n_f = 1`` along the facet's global normal
from both sides and ``psi_i . n_j = 0`` on the other two facets.  Its
divergence is the cell constant ``sigma |e_i| / A_c`` and its gradient
``sigma |e_i| / (2 A_c) I``.

All tabulations are built eagerly with numpy (mesh-static) and
materialised as device arrays; evaluation/projection are dense gathers
and scatter-adds, TPU-friendly like the P1DG assembler.
"""
import numpy as np
import jax.numpy as jnp

__all__ = ["RTSpace"]


class RTSpace:
    """Lowest-order RT function space + assembler over a Mesh2d."""

    #: Function-compatibility attributes
    family = "RT"
    degree = 1
    dim = 2
    is_dg = False

    def __init__(self, mesh, asm):
        """:arg asm: a DGAssembler providing the quadrature rules (its
        cell/facet quad points are reused so RT terms can share
        coefficient tabulations with the scalar spaces)."""
        self.mesh = mesh
        self.asm = asm
        self.ndofs = mesh.nf
        self.node_count = mesh.nf
        nc = mesh.nc

        cells = np.asarray(mesh.cells_np)
        coords = np.asarray(mesh.coords_np)
        cf = np.asarray(mesh.cell_facets_np)      # (nc, 3) facet ids
        cs = np.asarray(mesh.cell_sides_np)       # (nc, 3) side of cell
        flen = np.asarray(mesh.facet_len_np)
        area = np.asarray(mesh.cell_area_np)
        sigma = np.where(cs == 0, 1.0, -1.0)      # (nc, 3)
        elen = flen[cf]                            # (nc, 3)

        # reference-space vertices of the P1 triangle.  gdim = 2 for
        # planar meshes, 3 for embedded manifolds (SphereMesh) — the RT
        # basis lives in each (flat) cell's own plane, so all formulas
        # below carry a generic trailing coordinate dimension.
        gdim = coords.shape[1]
        self.gdim = gdim
        ref_v = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        qp = np.asarray(asm.space._tab_np["qp"])   # (nq, 2)
        qt = np.asarray(asm.space._tab_np["qt"])   # (nqf,) facet params
        J = np.zeros((nc, gdim, 2))
        p0 = coords[cells[:, 0]]
        d1 = coords[cells[:, 1]] - p0
        d2 = coords[cells[:, 2]] - p0
        if getattr(mesh, "periodic_x_len", None) is not None:
            d1 = mesh._wrap_dx(d1)
            d2 = mesh._wrap_dx(d2)
        J[:, :, 0] = d1
        J[:, :, 1] = d2

        # cell-quad tabulation: psi (nc, 3, nq, 2)
        dxi = qp[None, :, :] - ref_v[:, None, :]   # (3, nq, 2)
        xq_rel = np.einsum("cij,vqj->cvqi", J, dxi)  # (nc, 3, nq, 2)
        fac = (sigma * elen / (2.0 * area[:, None]))  # (nc, 3)
        self.psi_q_np = fac[:, :, None, None] * xq_rel
        # divergence (cell constant) and gradient factor
        self.div_np = sigma * elen / area[:, None]          # (nc, 3)
        self.gradfac_np = fac                                # (nc, 3)

        # facet-trace tabulation: psi of all 3 local basis functions of
        # each side's cell at the facet quad points: (nf, 2, nqf, 3, 2)
        fl = np.asarray(mesh.facet_local_np)       # (nf, 2)
        fcells = np.asarray(mesh.facet_cells_np)   # (nf, 2)
        variant = np.asarray(mesh.facet_variant_np)  # (nf, 2)
        nqf = len(qt)
        # reference coordinates of facet quad points for each
        # (local facet, reversed?) variant: local facet i runs from
        # vertex (i+1)%3 to (i+2)%3
        ref_fpts = np.zeros((6, nqf, 2))
        for loc in range(3):
            a = ref_v[(loc + 1) % 3]
            b = ref_v[(loc + 2) % 3]
            ref_fpts[2 * loc] = a[None, :] + qt[:, None] * (b - a)[None, :]
            ref_fpts[2 * loc + 1] = b[None, :] + qt[:, None] * (a - b)[None, :]
        tr = np.zeros((mesh.nf, 2, nqf, 3, gdim))
        for side in range(2):
            c = fcells[:, side]
            pts = ref_fpts[variant[:, side]]       # (nf, nqf, 2)
            rel = pts[:, None, :, :] - ref_v[None, :, None, :]  # (nf,3,nqf,2)
            xrel = np.einsum("fij,fvqj->fvqi", J[c], rel)
            tr[:, side] = (fac[c][:, :, None, None] * xrel).transpose(
                0, 2, 1, 3)
        self.psi_tr_np = tr

        # scatter table: (nc, 3) -> facet dofs
        self.cell_facets_np = cf
        self.sigma_np = sigma

        # RT mass matrix: per-cell 3x3, M_ij = sum_q w detJ psi_i.psi_j
        w = np.asarray(asm.space._tab_np["qw"])
        detJ = np.asarray(mesh.detJ_np)
        Mloc = np.einsum("q,c,cvqi,cwqi->cvw", w, detJ,
                         self.psi_q_np, self.psi_q_np)
        self.Mloc_np = Mloc
        diag = np.zeros(mesh.nf)
        np.add.at(diag, cf.ravel(),
                  np.einsum("cvv->cv", Mloc).ravel())
        self._diag_np = np.maximum(diag, np.finfo(diag.dtype).tiny)

        # device tables
        self.psi_q = jnp.asarray(self.psi_q_np)
        self.psi_tr = jnp.asarray(self.psi_tr_np)
        self.div = jnp.asarray(self.div_np)
        self.gradfac = jnp.asarray(self.gradfac_np)
        self.cell_facets = jnp.asarray(cf, dtype=jnp.int32)
        self.Mloc = jnp.asarray(Mloc)
        self.mass_diag = jnp.asarray(self._diag_np)
        self.wdetJ = jnp.asarray(w[None, :] * detJ[:, None])  # (nc, nq)
        self.wlen = jnp.asarray(
            np.asarray(asm.space._tab_np["qwf"])[None, :]
            * flen[:, None]
        )  # (nf, nqf)

    # -- Function compatibility -------------------------------------------
    def zero_dofs(self):
        return jnp.zeros(self.mesh.nf)

    def dof_shape(self):
        return (self.mesh.nf,)

    def project_vector(self, value):
        """Interpolate a velocity vector field onto the facet-normal
        dofs: U_f = u(midpoint_f) . n_f (exact for RT1 fields)."""
        mesh = self.mesh
        nrm = mesh.facet_normal
        gdim = self.gdim
        value = jnp.asarray(value)
        if value.ndim <= 1 and value.shape != (mesh.nf,):  # constant vector
            return (jnp.broadcast_to(value, (mesh.nf, gdim)) * nrm).sum(-1)
        if value.shape[:1] == (mesh.nv,) and value.ndim == 2:  # CG1 vector
            fv = mesh.facet_verts
            vmid = 0.5 * (value[fv[:, 0]] + value[fv[:, 1]])
            return (vmid * nrm).sum(-1)
        if value.shape == (mesh.nf, gdim):
            return (value * nrm).sum(-1)
        if value.shape == (mesh.nf,):
            return value
        raise ValueError(f"cannot project {value.shape} onto RT dofs")

    # -- evaluation ------------------------------------------------------
    def cell_values(self, U):
        """(nf,) dofs -> velocity at cell quad points (nc, nq, 2)."""
        Uc = U[self.cell_facets]                   # (nc, 3)
        return jnp.einsum("cv,cvqi->cqi", Uc, self.psi_q)

    def cell_div(self, U):
        """div(u) per cell (constant): (nc,)."""
        return (U[self.cell_facets] * self.div).sum(axis=1)

    def facet_normal_values(self, U):
        """Normal velocity at facet quad points (single-valued):
        (nf, nqf)."""
        nqf = self.psi_tr.shape[2]
        return jnp.broadcast_to(U[:, None], (self.mesh.nf, nqf))

    def facet_un_mean(self, U):
        """Mean normal velocity per facet (= the dof for RT1)."""
        return U

    def facet_un_quad(self, U):
        """Normal velocity at facet quad points (nf, nqf)."""
        return self.facet_normal_values(U)

    def bnd_normal_to_dofs(self, Fq):
        """Boundary term: integrand (nf, nqf) against the own-facet
        normal trace (= 1 for RT1); caller masks to boundary facets."""
        return (self.wlen * Fq).sum(axis=-1)

    def facet_traces(self, U):
        """Full velocity vector at facet quad points from each side:
        (nf, 2, nqf, 2)."""
        Uc = U[self.cell_facets]                   # (nc, 3)
        fcells = self.mesh.facet_cells             # (nf, 2)
        Uf = Uc[fcells]                            # (nf, 2, 3)
        return jnp.einsum("fsv,fsqvi->fsqi", Uf, self.psi_tr)

    # -- projection (residual assembly) ----------------------------------
    def cell_to_dofs(self, Fq):
        """Vector integrand at cell quads (nc, nq, 2) tested against
        psi -> (nf,)."""
        loc = jnp.einsum("cq,cqi,cvqi->cv", self.wdetJ, Fq, self.psi_q)
        return jnp.zeros(self.mesh.nf).at[self.cell_facets].add(loc)

    def div_to_dofs(self, Sq):
        """Scalar integrand (nc, nq) tested against div(psi) -> (nf,)."""
        cell_int = jnp.einsum("cq,cq->c", self.wdetJ, Sq)  # integral of S
        loc = cell_int[:, None] * self.div
        return jnp.zeros(self.mesh.nf).at[self.cell_facets].add(loc)

    def grad_to_dofs(self, Gq):
        """Tensor integrand (nc, nq, 2, 2) tested against grad(psi)
        (= gradfac * I, so G : grad(psi) = gradfac * tr(G)) -> (nf,)."""
        trG = Gq[..., 0, 0] + Gq[..., 1, 1]
        cell_int = jnp.einsum("cq,cq->c", self.wdetJ, trG)
        loc = cell_int[:, None] * self.gradfac
        return jnp.zeros(self.mesh.nf).at[self.cell_facets].add(loc)

    def facet_to_dofs(self, Ff):
        """Vector integrand at facet quads per side (nf, 2, nqf, 2)
        tested against the side-cell's psi traces -> (nf,)."""
        loc = jnp.einsum("fq,fsqi,fsqvi->fsv", self.wlen, Ff, self.psi_tr)
        fcells = self.mesh.facet_cells
        targets = self.cell_facets[fcells]         # (nf, 2, 3)
        return jnp.zeros(self.mesh.nf).at[targets].add(loc)

    # -- mass ------------------------------------------------------------
    def mass_apply(self, U):
        Uc = U[self.cell_facets]
        loc = jnp.einsum("cvw,cw->cv", self.Mloc, Uc)
        return jnp.zeros(self.mesh.nf).at[self.cell_facets].add(loc)

    def mass_inverse(self, r, iters=30):
        """Jacobi-preconditioned CG on the (SPD, facet-coupled) RT mass,
        wrapped in custom_linear_solve so it is transposable and
        differentiable inside Newton-GMRES (same pattern as the CG2
        elevation mass in shallowwater_dgcg)."""
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
                p = z + (rz_new / jnp.maximum(rz,
                                              jnp.finfo(rz.dtype).tiny)) * p
                return (x, p, res, rz_new), None

            (x, _, _, _), _ = lax.scan(body, (x, z, res, rz), None,
                                       length=iters)
            return x

        return lax.custom_linear_solve(
            self.mass_apply, r, solve=lambda mv, b: pcg(b), symmetric=True
        )
