r"""Matrix-free assembly on extruded prisms (P1DG x P1DG).

The 3D counterpart of ``fem.assembly``: fields live on dense column-local
arrays ``(nc, 3, nz, 2[, k])`` (cell, horizontal node, layer, vertical node)
— the reference's extruded function spaces + op2 column kernels (SURVEY.md
sections 2.6, 2.9) become contiguous tensor contractions with the layer axis
fully vectorised.

Geometry: horizontal map is the 2D affine map; vertically
``z = (1-s) z_bot(x,y) + s z_top(x,y)`` with P1 interface surfaces, so

  detJ3 = detJ2 * Delta,         Delta = z_top - z_bot (layer thickness)
  d/dz  = (1/Delta) d/ds
  d/dx  = d/dx|_s - (dz/dx|_s / Delta) d/ds     (sigma-coordinate chain rule)

Quadrature-point array convention: ``(nc, nz, nq, nqv[, k])`` for cells,
``(nf, 2, nz, nqf, nqv[, k])`` for vertical (inter-column) facets and
``(nc, nz+1, nq[, k])`` for horizontal (inter-layer) facets.
"""
import numpy as np
import jax.numpy as jnp

__all__ = ["Assembler3D"]


def _wx(w, acc, head):
    return w.reshape(w.shape + (1,) * (acc.ndim - head))


class Assembler3D:
    def __init__(self, mesh2d, asm2d, extruded):
        self.mesh = mesh2d
        self.asm2d = asm2d
        self.ext = extruded
        self.nz = extruded.nz
        # vertical quadrature (degree 3) and P1 basis on [0,1]
        t, wv = np.polynomial.legendre.leggauss(2)
        t = 0.5 * (t + 1)
        wv = 0.5 * wv
        self.qv_np, self.wv_np = t, wv
        self.qv = jnp.asarray(t)
        self.wv = jnp.asarray(wv)
        self.psi = jnp.asarray(np.stack([1 - t, t], axis=1))   # (nqv, 2)
        self.dpsi = jnp.asarray(np.array([[-1.0, 1.0]] * len(t)))  # (nqv, 2)
        self.nq = len(asm2d.space._tab_np["qw"])
        self.nqf = len(asm2d.space._tab_np["qwf"])

    # -- geometry --------------------------------------------------------
    def layer_geometry(self, z_interfaces):
        """Per-(cell, layer) geometry at horizontal quad points.

        :arg z_interfaces: (nc, 3, nz+1)
        :returns: dict with
           Delta_q   (nc, nz, nq)     layer thickness
           dzdx_q    (nc, nz, nq, nqv, 2)  horizontal gradient of z at
                                            each (s-)quad point
           Delta_nodes (nc, 3, nz)
        """
        asm = self.asm2d
        z = jnp.moveaxis(z_interfaces, -1, 1)  # (nc, nz+1, 3)
        zq = jnp.einsum("qd,cld->clq", asm.space.phi, z)  # (nc, nz+1, nq)
        # cell_grads treats trailing axes as components: (nc, 3, nz+1)
        # -> (nc, nq, nz+1, 2)
        gz = asm.cell_grads(z_interfaces)
        gz = jnp.moveaxis(gz, 2, 1)  # (nc, nz+1, nq, 2)
        zb, zt = zq[:, :-1], zq[:, 1:]           # (nc, nz, nq)
        gb, gt = gz[:, :-1], gz[:, 1:]           # (nc, nz, nq, 2)
        Delta_q = zt - zb
        # dz/dx at vertical point s: (1-s) gb + s gt
        s = self.qv  # (nqv,)
        dzdx = (
            gb[:, :, :, None, :] * (1 - s)[None, None, None, :, None]
            + gt[:, :, :, None, :] * s[None, None, None, :, None]
        )  # (nc, nz, nq, nqv, 2)
        Delta_nodes = z_interfaces[..., 1:] - z_interfaces[..., :-1]
        return dict(Delta_q=Delta_q, dzdx_q=dzdx, Delta_nodes=Delta_nodes,
                    z_q=zq, gz_q=gz, z_if=z_interfaces)

    # -- evaluation ------------------------------------------------------
    def cell_values(self, u):
        """(nc, 3, nz, 2[, k]) -> (nc, nz, nq, nqv[, k])."""
        return jnp.einsum(
            "qd,vp,cdlp...->clqv...", self.asm2d.space.phi, self.psi, u
        )

    def cell_grads(self, u, geom):
        """Full physical gradient: (..., 3) with components (d/dx, d/dy,
        d/dz)."""
        asm = self.asm2d
        # reference-horizontal derivative at fixed s
        gh = jnp.einsum(
            "qdj,cji,vp,cdlp...->clqv...i",
            asm.space.dphi, self.mesh.Jinv, self.psi, u,
        )  # (nc, nz, nq, nqv, ..., 2)
        dds = jnp.einsum(
            "qd,vp,cdlp...->clqv...", asm.space.phi, self.dpsi, u
        )
        Delta = geom["Delta_q"][:, :, :, None]  # (nc,nz,nq,1)
        Dx = _wx(Delta, dds, 4)
        dfdz = dds / Dx
        dzdx = geom["dzdx_q"]  # (nc,nz,nq,nqv,2)
        extra = dds.ndim - 4
        dzdx_b = dzdx.reshape(dzdx.shape[:4] + (1,) * extra + (2,))
        ghx = gh - dfdz[..., None] * dzdx_b
        return jnp.concatenate([ghx, dfdz[..., None]], axis=-1)

    def interface_values(self, u):
        """Values at layer interfaces, horizontal quad points:
        returns (below, above): each (nc, nz+1, nq[, k]); at the bottom
        boundary 'below' duplicates 'above' and vice versa at the top."""
        phi = self.asm2d.space.phi
        top = jnp.einsum("qd,cdl...->clq...", phi, u[:, :, :, 1])   # top of each layer
        bot = jnp.einsum("qd,cdl...->clq...", phi, u[:, :, :, 0])
        below = jnp.concatenate([bot[:, :1], top], axis=1)   # (nc, nz+1, ...)
        above = jnp.concatenate([bot, top[:, -1:]], axis=1)
        return below, above

    def facet_traces(self, u):
        """Vertical-facet traces: (nc,3,nz,2[,k]) -> (nf,2,nz,nqf,nqv[,k])."""
        asm = self.asm2d
        mesh = self.mesh
        out = []
        for sde in (0, 1):
            cd = u[mesh.facet_cells[:, sde]]  # (nf, 3, nz, 2, ...)
            tab = asm.space.phi_f[mesh.facet_variant[:, sde]]  # (nf,nqf,3)
            out.append(
                jnp.einsum("fqd,vp,fdlp...->flqv...", tab, self.psi, cd)
            )
        return jnp.stack(out, axis=1)

    def _facet_side_geom(self, sde, geom):
        """Per-side facet tabulation + sigma-coordinate geometry at
        vertical-facet quad points: (tab, dtabJ, D_tr, dzdx_f) with
        tab (nf,nqf,3), dtabJ (nf,nqf,3,2) physical-reference gradients,
        D_tr (nf,nz,nqf) layer thickness and dzdx_f (nf,nz,nqf,nqv,2)."""
        asm = self.asm2d
        mesh = self.mesh
        cidx = mesh.facet_cells[:, sde]
        var = mesh.facet_variant[:, sde]
        tab = asm.space.phi_f[var]
        dtabJ = jnp.einsum(
            "fqdj,fji->fqdi", asm.space.dphi_f[var], mesh.Jinv[cidx]
        )
        z_if = geom["z_if"][cidx]  # (nf, 3, nz+1)
        D_tr = jnp.einsum("fqd,fdl->flq", tab, z_if[:, :, 1:] - z_if[:, :, :-1])
        gz = jnp.einsum("fqdi,fdl->flqi", dtabJ, z_if)  # (nf, nz+1, nqf, 2)
        s = self.qv
        dzdx_f = (
            gz[:, :-1, :, None, :] * (1 - s)[None, None, None, :, None]
            + gz[:, 1:, :, None, :] * s[None, None, None, :, None]
        )  # (nf, nz, nqf, nqv, 2)
        return cidx, tab, dtabJ, D_tr, dzdx_f

    def facet_trace_grads_h(self, u, geom):
        """Horizontal physical gradients of both-side traces at
        vertical-facet quad points (sigma-coordinate chain rule):
        (nc,3,nz,2[,k]) -> (nf,2,nz,nqf,nqv[,k],2)."""
        out = []
        for sde in (0, 1):
            cidx, tab, dtabJ, D_tr, dzdx_f = self._facet_side_geom(sde, geom)
            cd = u[cidx]  # (nf, 3, nz, 2, ...)
            gh = jnp.einsum("fqdi,vp,fdlp...->flqv...i", dtabJ, self.psi, cd)
            dds = jnp.einsum("fqd,vp,fdlp...->flqv...", tab, self.dpsi, cd)
            Dx = _wx(D_tr[:, :, :, None], dds, 4)
            dfdz = dds / Dx
            extra = dds.ndim - 4
            dzdx_b = dzdx_f.reshape(dzdx_f.shape[:4] + (1,) * extra + (2,))
            out.append(gh - dfdz[..., None] * dzdx_b)
        return jnp.stack(out, axis=1)

    def vfacet_grad_to_dofs(self, acc, geom):
        """Vertical-facet accumulator tested against the *horizontal
        gradient* of the test traces (sigma chain rule included):
        (nf, 2, nz, nqf, nqv[, k], 2) -> (nc, 3, nz, 2[, k])."""
        asm = self.asm2d
        mesh = self.mesh
        sides = []
        for sde in (0, 1):
            cidx, tab, dtabJ, D_tr, dzdx_f = self._facet_side_geom(sde, geom)
            w = (
                asm.space.qwf[None, None, :, None]
                * mesh.facet_len[:, None, None, None]
                * D_tr[..., None]
                * self.wv
            )  # (nf, nz, nqf, nqv)
            a = acc[:, sde]
            aw = a * _wx(w[..., None], a, 5)
            t1 = jnp.einsum("flqv...i,fqdi,vp->fdlp...", aw, dtabJ, self.psi)
            extra = a.ndim - 5
            dzdx_b = dzdx_f.reshape(dzdx_f.shape[:4] + (1,) * extra + (2,))
            Dx = D_tr[:, :, :, None].reshape(
                D_tr.shape + (1,) * (1 + extra)
            )
            corr = (aw * dzdx_b).sum(-1) / Dx
            t2 = jnp.einsum("flqv...,fqd,vp->fdlp...", corr, tab, self.dpsi)
            sides.append(t1 - t2)
        contrib = jnp.stack(sides, axis=1)  # (nf, 2, 3, nz, 2, ...)
        g = contrib[mesh.cell_facets, mesh.cell_sides]
        return g.sum(axis=1)

    # -- projection ------------------------------------------------------
    def wq(self, geom):
        """Combined cell quadrature weights (nc, nz, nq, nqv)."""
        asm = self.asm2d
        w2 = asm.space.qw[None, None, :] * self.mesh.detJ[:, None, None]
        return w2[..., None] * geom["Delta_q"][..., None] * self.wv

    def cell_to_dofs(self, acc, geom):
        """(nc, nz, nq, nqv[, k]) -> (nc, 3, nz, 2[, k])."""
        accw = acc * _wx(self.wq(geom), acc, 4)
        return jnp.einsum(
            "clqv...,qd,vp->cdlp...", accw, self.asm2d.space.phi, self.psi
        )

    def grad_to_dofs(self, acc, geom):
        """(nc, nz, nq, nqv[, k], 3) tested against grad(test)."""
        accw = acc * _wx(self.wq(geom)[..., None], acc, 5)
        asm = self.asm2d
        acc_h = accw[..., 0:2]
        acc_z = accw[..., 2]
        # d test/dx_i = dphi Jinv psi - phi (dz/dx / Delta) dpsi;  d/dz =
        # phi dpsi / Delta
        r = jnp.einsum(
            "clqv...i,qdj,cji,vp->cdlp...",
            acc_h, asm.space.dphi, self.mesh.Jinv, self.psi,
        )
        Delta = geom["Delta_q"][:, :, :, None]
        dzdx = geom["dzdx_q"]
        extra = acc_z.ndim - 4
        dzdx_b = dzdx.reshape(dzdx.shape[:4] + (1,) * extra + (2,))
        Dx = Delta.reshape(Delta.shape + (1,) * extra)
        sigma_corr = (acc_h * dzdx_b).sum(-1) / Dx
        r = r - jnp.einsum(
            "clqv...,qd,vp->cdlp...", sigma_corr, asm.space.phi, self.dpsi
        )
        r = r + jnp.einsum(
            "clqv...,qd,vp->cdlp...", acc_z / Dx, asm.space.phi, self.dpsi
        )
        return r

    def vfacet_to_dofs(self, acc, geom):
        """Vertical-facet accumulator (nf, 2, nz, nqf, nqv[, k]) tested
        against test traces -> (nc, 3, nz, 2[, k]).

        Facet area element: facet_len * layer thickness at the facet
        (approximated by the side-0 cell's mean thickness at facet quad
        points -- exact for matching interfaces)."""
        asm = self.asm2d
        mesh = self.mesh
        # layer thickness along the facet: trace of Delta_nodes
        Dn = geom["Delta_nodes"]  # (nc, 3, nz)
        sides = []
        for sde in (0, 1):
            tab = asm.space.phi_f[mesh.facet_variant[:, sde]]  # (nf,nqf,3)
            D_tr = jnp.einsum("fqd,fdl->flq", tab, Dn[mesh.facet_cells[:, sde]])
            w = (
                asm.space.qwf[None, None, :, None]
                * mesh.facet_len[:, None, None, None]
                * D_tr[..., None]
                * self.wv
            )  # (nf, nz, nqf, nqv)
            a = acc[:, sde]
            aw = a * _wx(w, a, 4)
            sides.append(
                jnp.einsum("flqv...,fqd,vp->fdlp...", aw, tab, self.psi)
            )
        contrib = jnp.stack(sides, axis=1)  # (nf, 2, 3, nz, 2, ...)
        g = contrib[mesh.cell_facets, mesh.cell_sides]  # (nc,3,3,nz,2,...)
        return g.sum(axis=1)

    def hfacet_to_dofs(self, acc_below, acc_above, geom):
        """Horizontal-facet (layer-interface) accumulators tested against
        the test traces from below/above: each (nc, nz+1, nq[, k])
        -> (nc, 3, nz, 2[, k]).  Area element = horizontal detJ2 * qw
        (interfaces are projected; consistent with the sigma-coordinate
        vertical-flux convention)."""
        asm = self.asm2d
        w2 = asm.space.qw[None, None, :] * self.mesh.detJ[:, None, None]
        out = 0.0
        # below-trace = top of layer l-1 -> tested against dofs (l-1, top)
        ab = acc_below[:, 1:]  # contributions on interfaces 1..nz ->
        # interfaces 0..nz-1 from below are the layer tops  (interface i
        # belongs to top of layer i-1); interface 0 has no below side
        abw = ab * _wx(w2, ab, 3)
        r_top = jnp.einsum("clq...,qd->cdl...", abw, asm.space.phi)
        aa = acc_above[:, :-1]  # interfaces 0..nz-1, above side = bottom of layer l
        aaw = aa * _wx(w2, aa, 3)
        r_bot = jnp.einsum("clq...,qd->cdl...", aaw, asm.space.phi)
        return jnp.stack([r_bot, r_top], axis=3)  # (nc,3,nz,2,...)

    # -- mass ------------------------------------------------------------
    def _mass_factors(self, geom):
        """The prism mass matrix is an exact Kronecker product
        M = Mh(c, l) (x) Mv: the horizontal 3x3 block weighted by the
        layer thickness, times the constant vertical 2x2 block.  Keeping
        it factored avoids ever forming (or inverting) the 6x6 matrices —
        a batched ``linalg.inv`` on (nc*nz) 6x6 blocks measured ~65 ms on
        TPU v5e vs <1 ms for the factored closed form."""
        asm = self.asm2d
        w2 = asm.space.qw[None, :] * self.mesh.detJ[:, None]  # (nc, nq)
        phi = asm.space.phi  # (nq,3)
        Mh = jnp.einsum(
            "cq,clq,qa,qb->clab", w2, geom["Delta_q"], phi, phi
        )  # (nc,nz,3,3)
        Mv = jnp.einsum("v,vp,vr->pr", self.wv, self.psi, self.psi)  # (2,2)
        return Mh, Mv

    @staticmethod
    def _inv3(A):
        """Closed-form batched 3x3 inverse (adjugate / determinant)."""
        a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
        d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
        g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
        A11 = e * i - f * h
        A12 = c * h - b * i
        A13 = b * f - c * e
        A21 = f * g - d * i
        A22 = a * i - c * g
        A23 = c * d - a * f
        A31 = d * h - e * g
        A32 = b * g - a * h
        A33 = a * e - b * d
        det = a * A11 + b * A21 + c * A31
        adj = jnp.stack([
            jnp.stack([A11, A12, A13], axis=-1),
            jnp.stack([A21, A22, A23], axis=-1),
            jnp.stack([A31, A32, A33], axis=-1),
        ], axis=-2)
        return adj / det[..., None, None]

    @staticmethod
    def _inv2(A):
        a, b = A[..., 0, 0], A[..., 0, 1]
        c, d = A[..., 1, 0], A[..., 1, 1]
        det = a * d - b * c
        return jnp.stack([
            jnp.stack([d, -b], axis=-1),
            jnp.stack([-c, a], axis=-1),
        ], axis=-2) / det[..., None, None]

    def _kron_apply(self, Mh, Mv, u):
        """Apply (Mh (x) Mv) to u with axes (c, node, layer, vnode[, k])."""
        t = jnp.einsum("clab,cblp...->calp...", Mh, u)
        return jnp.einsum("pr,calr...->calp...", Mv, t)

    def mass_matrices(self, geom):
        """Dense per-(cell,layer) 6x6 mass matrices (kept for
        inspection/tests; the hot path uses the Kronecker factors)."""
        Mh, Mv = self._mass_factors(geom)
        M = jnp.einsum("clab,pr->clapbr", Mh, Mv)  # (nc,nz,3,2,3,2)
        return M.reshape(M.shape[0], M.shape[1], 6, 6)

    def mass_apply(self, u, geom):
        Mh, Mv = self._mass_factors(geom)
        return self._kron_apply(Mh, Mv, u)

    def mass_inverse(self, r, geom):
        Mh, Mv = self._mass_factors(geom)
        return self._kron_apply(self._inv3(Mh), self._inv2(Mv), r)

    # -- vertical operators (ref utility3d.py) ---------------------------
    def vertical_integral(self, u, geom, average=False):
        """Column integral (or average) of a 3D field -> 2D nodal array
        (nc, 3[, k]) (ref ``VerticalIntegrator``, ``utility3d.py:132-210``;
        exact for P1 vertical)."""
        Dn = geom["Delta_nodes"]  # (nc,3,nz)
        layer_int = 0.5 * (u[:, :, :, 0] + u[:, :, :, 1]) * _wx(
            Dn, u[:, :, :, 0], 3
        )
        total = layer_int.sum(axis=2)
        if average:
            H = Dn.sum(axis=2)
            return total / _wx(H, total, 2)
        return total

    def cumulative_integral(self, u, geom, from_top=True):
        """Cumulative integral along the column, returned at layer dof
        points (nc, 3, nz, 2[, k]): e.g. the baroclinic head
        r = -1/rho0 int_z^eta rho' dz (ref ``utility.py:478-492``)."""
        Dn = geom["Delta_nodes"]
        ub, ut = u[:, :, :, 0], u[:, :, :, 1]
        layer_int = 0.5 * (ub + ut) * _wx(Dn, ub, 3)
        if from_top:
            # integral from the surface down to each interface
            csum = jnp.flip(
                jnp.cumsum(jnp.flip(layer_int, axis=2), axis=2), axis=2
            )
            # value at top of layer l = csum(l+1..end) = csum - layer_int
            at_top = csum - layer_int
            at_bot = csum
        else:
            csum = jnp.cumsum(layer_int, axis=2)
            at_bot = csum - layer_int
            at_top = csum
        return jnp.stack([at_bot, at_top], axis=3)
