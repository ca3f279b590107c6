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
        # host-scalar tabulations: the evaluation/projection contractions
        # below unroll over them (tiny-minor-axis einsums make XLA pad
        # every operand onto (8,128) tiles — the uniform ~5-7 ms/phase
        # tax in the round-3 3D profile came from exactly this)
        t2 = asm2d.space._tab_np
        self._phi_h = np.asarray(t2["phi"])        # (nq, 3)
        self._dphi_h = np.asarray(t2["dphi"])      # (nq, 3, 2)
        self._qw_h = np.asarray(t2["qw"])          # (nq,)
        self._qwf_h = np.asarray(t2["qwf"])        # (nqf,)
        self._psi_h = np.stack([1 - t, t], axis=1)         # (nqv, 2)
        self._dpsi_h = np.array([[-1.0, 1.0]] * len(t))    # (nqv, 2)
        self._wv_h = wv
        # quadratic vertical Lagrange basis at nodes {0, 1/2, 1} (the
        # ``use_quadratic_pressure`` head space, ref ``solver.py:454``,
        # ``options.py:1135-1156``): evaluated at the SAME 2-point Gauss
        # rule — the int-PG projection integrand (quadratic head x P1
        # test) is cubic in s, which degree-3 Gauss integrates exactly
        self._psi2_h = np.stack(
            [2 * (t - 0.5) * (t - 1.0), 4 * t * (1 - t),
             2 * t * (t - 0.5)], axis=1)                   # (nqv, 3)
        self._dpsi2_h = np.stack(
            [4 * t - 3.0, 4.0 - 8 * t, 4 * t - 1.0], axis=1)  # (nqv, 3)
        # P2 horizontal Lagrange tabs at the SAME 2D quadrature points,
        # derived from the P1 tabs (P1 phi rows ARE the barycentric
        # coordinates lambda of the quad points, and P1 dphi their
        # constant reference gradients).  Node order: 3 vertices then
        # edge midpoints opposite vertex 0, 1, 2 (m12, m02, m01).
        lam = self._phi_h                                  # (nq, 3)
        dlam = self._dphi_h                                # (nq, 3, 2)
        phi2 = [lam[:, i] * (2 * lam[:, i] - 1) for i in range(3)]
        dphi2 = [dlam[:, i] * (4 * lam[:, i] - 1)[:, None]
                 for i in range(3)]
        for (j, k) in ((1, 2), (0, 2), (0, 1)):
            phi2.append(4 * lam[:, j] * lam[:, k])
            dphi2.append(4 * (lam[:, j, None] * dlam[:, k]
                              + lam[:, k, None] * dlam[:, j]))
        self._phi2d_h = np.stack(phi2, axis=1)             # (nq, 6)
        self._dphi2d_h = np.stack(dphi2, axis=1)           # (nq, 6, 2)

    # -- unrolled contraction helpers ---------------------------------
    @staticmethod
    def _stack_lead2(rows, n1, n2):
        """rows: flat list (n1*n2) of (B, L, ...) slabs ->
        (B, L, n1, n2, ...)."""
        out = jnp.stack(rows)                       # (n1*n2, B, L, ...)
        out = jnp.moveaxis(out, 0, 2)               # (B, L, n1*n2, ...)
        return out.reshape(out.shape[:2] + (n1, n2) + out.shape[3:])

    def _eval_qv(self, u, htab, vtab):
        """out[b, l, q, v, ...] = sum_{d,p} htab[q,d] vtab[v,p]
        u[b, d, l, p, ...], unrolled with host-scalar tabs."""
        nq, nd = htab.shape
        nqv, npp = vtab.shape
        rows = []
        for q in range(nq):
            for v in range(nqv):
                acc = None
                for d in range(nd):
                    for pp in range(npp):
                        w = float(htab[q, d] * vtab[v, pp])
                        if w == 0.0:
                            continue
                        term = w * u[:, d, :, pp]
                        acc = term if acc is None else acc + term
                rows.append(acc)
        return self._stack_lead2(rows, nq, nqv)

    def _project_qv(self, accw_qv, htab, vtab):
        """Adjoint of :meth:`_eval_qv` on pre-weighted (q, v) slabs:
        ``accw_qv[q][v]`` (B, L, ...) -> (B, nd, L, npp, ...)."""
        nq, nd = htab.shape
        nqv, npp = vtab.shape
        rows = []
        for d in range(nd):
            for pp in range(npp):
                acc = None
                for q in range(nq):
                    for v in range(nqv):
                        w = float(htab[q, d] * vtab[v, pp])
                        if w == 0.0:
                            continue
                        term = w * accw_qv[q][v]
                        acc = term if acc is None else acc + term
                rows.append(acc)
        out = jnp.stack(rows)                      # (nd*npp, B, L, ...)
        out = jnp.moveaxis(out, 0, 1)              # (B, nd*npp, L, ...)
        out = out.reshape(out.shape[:1] + (nd, npp) + out.shape[2:])
        return jnp.moveaxis(out, 2, 3)             # (B, nd, L, npp, ...)

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
        return self._eval_qv(u, self._phi_h, self._psi_h)

    def cell_grads(self, u, geom, vtabs=None, htabs=None):
        """Full physical gradient: (..., 3) with components (d/dx, d/dy,
        d/dz).  ``vtabs=(psi, dpsi)`` selects the vertical basis —
        default P1 (2 nodes); pass ``(self._psi2_h, self._dpsi2_h)`` for
        the quadratic (3-node) head space.  ``htabs=(phi, dphi)``
        likewise selects the horizontal basis (default P1DG; pass
        ``(self._phi2d_h, self._dphi2d_h)`` for the P2DG head space —
        ref ``solver.py:454`` builds P2DGxP2 for the baroclinic head)."""
        # reference-horizontal derivative at fixed s: per (q, v) slab
        # sums over host-scalar tabs; Jinv enters as (nc,) slab factors
        nq, nqv = self.nq, len(self.qv_np)
        psi_v, dpsi_v = vtabs if vtabs is not None else (
            self._psi_h, self._dpsi_h)
        phi_h, dphi_h = htabs if htabs is not None else (
            self._phi_h, self._dphi_h)
        npp = psi_v.shape[1]
        nh = phi_h.shape[1]
        Jinv = self.mesh.Jinv                       # (nc, 2, 2)
        extra = u.ndim - 4
        rows = []
        for q in range(nq):
            for v in range(nqv):
                # dref[j] = sum_{d,p} dphi[q,d,j] psi[v,p] u[:,d,:,p]
                dref = []
                for j in range(2):
                    acc = None
                    for d in range(nh):
                        for pp in range(npp):
                            w = float(dphi_h[q, d, j]
                                      * psi_v[v, pp])
                            if w == 0.0:
                                continue
                            term = w * u[:, d, :, pp]
                            acc = term if acc is None else acc + term
                    dref.append(acc)
                dds = None
                for d in range(nh):
                    for pp in range(npp):
                        w = float(phi_h[q, d] * dpsi_v[v, pp])
                        if w == 0.0:
                            continue
                        term = w * u[:, d, :, pp]
                        dds = term if dds is None else dds + term
                Dx = geom["Delta_q"][:, :, q].reshape(
                    geom["Delta_q"].shape[:2] + (1,) * extra)
                dfdz = dds / Dx
                comps = []
                for i in range(2):
                    gh_i = None
                    for j in range(2):
                        t = Jinv[:, j, i].reshape(
                            (-1,) + (1,) * (1 + extra)) * dref[j]
                        gh_i = t if gh_i is None else gh_i + t
                    dzdx_i = geom["dzdx_q"][:, :, q, v, i].reshape(
                        geom["dzdx_q"].shape[:2] + (1,) * extra)
                    comps.append(gh_i - dfdz * dzdx_i)
                comps.append(dfdz)
                rows.append(jnp.stack(comps, axis=-1))
        return self._stack_lead2(rows, nq, nqv)

    def interface_values(self, u):
        """Values at layer interfaces, horizontal quad points:
        returns (below, above): each (nc, nz+1, nq[, k]); at the bottom
        boundary 'below' duplicates 'above' and vice versa at the top."""
        def hq(ud):
            rows = []
            for q in range(self.nq):
                acc = None
                for d in range(3):
                    term = float(self._phi_h[q, d]) * ud[:, d]
                    acc = term if acc is None else acc + term
                rows.append(acc)
            return jnp.moveaxis(jnp.stack(rows), 0, 2)  # (nc, nz, nq, ...)

        top = hq(u[:, :, :, 1])
        bot = hq(u[:, :, :, 0])
        below = jnp.concatenate([bot[:, :1], top], axis=1)   # (nc, nz+1, ...)
        above = jnp.concatenate([bot, top[:, -1:]], axis=1)
        return below, above

    def facet_traces(self, u):
        """Vertical-facet traces: (nc,3,nz,2[,k]) -> (nf,2,nz,nqf,nqv[,k])."""
        asm = self.asm2d
        mesh = self.mesh
        nqf, nqv = self.nqf, len(self.qv_np)
        out = []
        for sde in (0, 1):
            cd = u[mesh.facet_cells[:, sde]]  # (nf, 3, nz, 2, ...)
            tab = asm.space.phi_f[mesh.facet_variant[:, sde]]  # (nf,nqf,3)
            extra = cd.ndim - 4
            rows = []
            for q in range(nqf):
                for v in range(nqv):
                    acc = None
                    for d in range(3):
                        tb = tab[:, q, d].reshape(
                            (-1,) + (1,) * (1 + extra))
                        for pp in range(2):
                            w = float(self._psi_h[v, pp])
                            term = (w * tb) * cd[:, d, :, pp]
                            acc = term if acc is None else acc + term
                    rows.append(acc)
            out.append(self._stack_lead2(rows, nqf, nqv))
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
        nqf, nqv = self.nqf, len(self.qv_np)
        out = []
        for sde in (0, 1):
            cidx, tab, dtabJ, D_tr, dzdx_f = self._facet_side_geom(sde, geom)
            cd = u[cidx]  # (nf, 3, nz, 2, ...)
            extra = cd.ndim - 4
            rows = []
            for q in range(nqf):
                for v in range(nqv):
                    gh = [None, None]
                    dds = None
                    for d in range(3):
                        tb = tab[:, q, d].reshape(
                            (-1,) + (1,) * (1 + extra))
                        dt = [dtabJ[:, q, d, i].reshape(
                            (-1,) + (1,) * (1 + extra)) for i in range(2)]
                        for pp in range(2):
                            wpsi = float(self._psi_h[v, pp])
                            wdps = float(self._dpsi_h[v, pp])
                            ud = cd[:, d, :, pp]
                            for i in range(2):
                                term = (wpsi * dt[i]) * ud
                                gh[i] = term if gh[i] is None                                     else gh[i] + term
                            t2 = (wdps * tb) * ud
                            dds = t2 if dds is None else dds + t2
                    Dx = D_tr[:, :, q].reshape(
                        D_tr.shape[:2] + (1,) * extra)
                    dfdz = dds / Dx
                    comps = []
                    for i in range(2):
                        dz_i = dzdx_f[:, :, q, v, i].reshape(
                            dzdx_f.shape[:2] + (1,) * extra)
                        comps.append(gh[i] - dfdz * dz_i)
                    rows.append(jnp.stack(comps, axis=-1))
            out.append(self._stack_lead2(rows, nqf, nqv))
        return jnp.stack(out, axis=1)

    def vfacet_grad_to_dofs(self, acc, geom):
        """Vertical-facet accumulator tested against the *horizontal
        gradient* of the test traces (sigma chain rule included):
        (nf, 2, nz, nqf, nqv[, k], 2) -> (nc, 3, nz, 2[, k])."""
        mesh = self.mesh
        nqf, nqv = self.nqf, len(self.qv_np)
        sides = []
        for sde in (0, 1):
            cidx, tab, dtabJ, D_tr, dzdx_f = self._facet_side_geom(sde, geom)
            a = acc[:, sde]                    # (nf, nz, nqf, nqv, .., 2)
            extra = a.ndim - 5
            rows = []
            for d in range(3):
                for pp in range(2):
                    out = None
                    for q in range(nqf):
                        Dq = D_tr[:, :, q].reshape(
                            a.shape[:2] + (1,) * extra)
                        wbase = (float(self._qwf_h[q])
                                 * mesh.facet_len)[:, None].reshape(
                            (-1, 1) + (1,) * extra) * Dq
                        tb = tab[:, q, d].reshape(
                            (-1,) + (1,) * (1 + extra))
                        dt = [dtabJ[:, q, d, i].reshape(
                            (-1,) + (1,) * (1 + extra)) for i in range(2)]
                        for v in range(nqv):
                            av = a[:, :, q, v]
                            wv = float(self._wv_h[v])
                            wpsi = float(self._psi_h[v, pp])
                            wdps = float(self._dpsi_h[v, pp])
                            t1 = (wv * wpsi) * (
                                dt[0] * av[..., 0] + dt[1] * av[..., 1])
                            dz0 = dzdx_f[:, :, q, v, 0].reshape(
                                a.shape[:2] + (1,) * extra)
                            dz1 = dzdx_f[:, :, q, v, 1].reshape(
                                a.shape[:2] + (1,) * extra)
                            corr = (av[..., 0] * dz0
                                    + av[..., 1] * dz1) / Dq
                            t2 = (wv * wdps) * tb * corr
                            term = wbase * (t1 - t2)
                            out = term if out is None else out + term
                    rows.append(out)
            side = jnp.stack(rows)
            side = jnp.moveaxis(side, 0, 1)
            side = side.reshape(side.shape[:1] + (3, 2) + side.shape[2:])
            sides.append(jnp.moveaxis(side, 2, 3))
        contrib = jnp.stack(sides, axis=1)  # (nf, 2, 3, nz, 2, ...)
        g = contrib[mesh.cell_facets, mesh.cell_sides]
        return g.sum(axis=1)

    # -- projection ------------------------------------------------------
    def wq(self, geom):
        """Combined cell quadrature weights (nc, nz, nq, nqv)."""
        asm = self.asm2d
        w2 = asm.space.qw[None, None, :] * self.mesh.detJ[:, None, None]
        return w2[..., None] * geom["Delta_q"][..., None] * self.wv

    def _wq_slab(self, geom, q, v):
        """(nc, nz) quadrature-weight slab for cell point (q, v)."""
        w0 = float(self._qw_h[q] * self._wv_h[v])
        return (w0 * self.mesh.detJ)[:, None] * geom["Delta_q"][:, :, q]

    def cell_to_dofs(self, acc, geom):
        """(nc, nz, nq, nqv[, k]) -> (nc, 3, nz, 2[, k])."""
        extra = acc.ndim - 4
        accw = [[
            acc[:, :, q, v] * self._wq_slab(geom, q, v).reshape(
                acc.shape[:2] + (1,) * extra)
            for v in range(acc.shape[3])] for q in range(acc.shape[2])]
        return self._project_qv(accw, self._phi_h, self._psi_h)

    def grad_to_dofs(self, acc, geom):
        """(nc, nz, nq, nqv[, k], 3) tested against grad(test).

        d test/dx_i = dphi Jinv psi - phi (dz/dx / Delta) dpsi;
        d/dz = phi dpsi / Delta."""
        nq, nqv = acc.shape[2], acc.shape[3]
        Jinv = self.mesh.Jinv
        extra = acc.ndim - 5
        rows = []
        for d in range(3):
            for pp in range(2):
                out = None
                for q in range(nq):
                    for v in range(nqv):
                        wq = self._wq_slab(geom, q, v).reshape(
                            acc.shape[:2] + (1,) * extra)
                        a = acc[:, :, q, v]           # (nc, nz[, k], 3)
                        Dx = geom["Delta_q"][:, :, q].reshape(
                            acc.shape[:2] + (1,) * extra)
                        wpsi = float(self._psi_h[v, pp])
                        wdps = float(self._dpsi_h[v, pp])
                        # horizontal: sum_i a_i * (dphi Jinv)_i
                        term = None
                        for i in range(2):
                            coef = None
                            for j in range(2):
                                cj = float(self._dphi_h[q, d, j])                                     * Jinv[:, j, i]
                                coef = cj if coef is None else coef + cj
                            t = (wpsi * coef.reshape(
                                (-1,) + (1,) * (1 + extra))) * a[..., i]
                            term = t if term is None else term + t
                        # sigma correction + vertical part, both through
                        # phi dpsi / Delta
                        sig = (a[..., 0] * geom["dzdx_q"][:, :, q, v, 0]
                               .reshape(acc.shape[:2] + (1,) * extra)
                               + a[..., 1] * geom["dzdx_q"][:, :, q, v, 1]
                               .reshape(acc.shape[:2] + (1,) * extra))
                        wphi = float(self._phi_h[q, d])
                        term = term + (wdps * wphi) * (
                            (a[..., 2] - sig) / Dx)
                        term = term * wq
                        out = term if out is None else out + term
                rows.append(out)
        out = jnp.stack(rows)                  # (6, nc, nz, ...)
        out = jnp.moveaxis(out, 0, 1)
        out = out.reshape(out.shape[:1] + (3, 2) + out.shape[2:])
        return jnp.moveaxis(out, 2, 3)

    def vfacet_to_dofs(self, acc, geom):
        """Vertical-facet accumulator (nf, 2, nz, nqf, nqv[, k]) tested
        against test traces -> (nc, 3, nz, 2[, k]).

        Facet area element: facet_len * layer thickness at the facet
        (approximated by the side-0 cell's mean thickness at facet quad
        points -- exact for matching interfaces)."""
        asm = self.asm2d
        mesh = self.mesh
        nqf, nqv = self.nqf, len(self.qv_np)
        # layer thickness along the facet: trace of Delta_nodes
        Dn = geom["Delta_nodes"]  # (nc, 3, nz)
        sides = []
        for sde in (0, 1):
            tab = asm.space.phi_f[mesh.facet_variant[:, sde]]  # (nf,nqf,3)
            Dnf = Dn[mesh.facet_cells[:, sde]]       # (nf, 3, nz)
            a = acc[:, sde]                          # (nf, nz, nqf, nqv, ..)
            extra = a.ndim - 4
            rows = []
            for d in range(3):
                for pp in range(2):
                    out = None
                    for q in range(nqf):
                        D_tr = None
                        for dd in range(3):
                            t = tab[:, q, dd, None] * Dnf[:, dd]
                            D_tr = t if D_tr is None else D_tr + t
                        wbase = (float(self._qwf_h[q])
                                 * mesh.facet_len)[:, None] * D_tr
                        wbase = wbase.reshape(
                            a.shape[:2] + (1,) * extra)  # (nf, nz, 1..)
                        tb = tab[:, q, d].reshape(
                            (-1,) + (1,) * (1 + extra))
                        for v in range(nqv):
                            w = float(self._wv_h[v] * self._psi_h[v, pp])
                            term = (w * tb) * (wbase * a[:, :, q, v])
                            out = term if out is None else out + term
                    rows.append(out)
            side = jnp.stack(rows)                   # (6, nf, nz, ...)
            side = jnp.moveaxis(side, 0, 1)
            side = side.reshape(side.shape[:1] + (3, 2) + side.shape[2:])
            sides.append(jnp.moveaxis(side, 2, 3))   # (nf, 3, nz, 2, ..)
        contrib = jnp.stack(sides, axis=1)  # (nf, 2, 3, nz, 2, ...)
        g = contrib[mesh.cell_facets, mesh.cell_sides]  # (nc,3,3,nz,2,...)
        return g.sum(axis=1)

    def hfacet_to_dofs(self, acc_below, acc_above, geom):
        """Horizontal-facet (layer-interface) accumulators tested against
        the test traces from below/above: each (nc, nz+1, nq[, k])
        -> (nc, 3, nz, 2[, k]).  Area element = horizontal detJ2 * qw
        (interfaces are projected; consistent with the sigma-coordinate
        vertical-flux convention)."""
        detJ = self.mesh.detJ
        # below-trace = top of layer l-1 -> tested against dofs (l-1, top)
        ab = acc_below[:, 1:]   # interfaces 1..nz = tops of layers 0..nz-1
        aa = acc_above[:, :-1]  # interfaces 0..nz-1 = bottoms of layers

        def project(a):
            extra = a.ndim - 3
            rows = []
            for d in range(3):
                out = None
                for q in range(self.nq):
                    w = (float(self._qw_h[q] * self._phi_h[q, d])
                         * detJ).reshape((-1, 1) + (1,) * extra)
                    term = w * a[:, :, q]
                    out = term if out is None else out + term
                rows.append(out)
            return jnp.moveaxis(jnp.stack(rows), 0, 1)  # (nc, 3, nz, ..)

        return jnp.stack([project(aa), project(ab)], axis=3)

    # -- mass ------------------------------------------------------------
    def _mass_factors(self, geom):
        """The prism mass matrix is an exact Kronecker product
        M = Mh(c, l) (x) Mv: the horizontal 3x3 block weighted by the
        layer thickness, times the constant vertical 2x2 block.  Keeping
        it factored avoids ever forming (or inverting) the 6x6 matrices —
        a batched ``linalg.inv`` on (nc*nz) 6x6 blocks measured ~65 ms on
        TPU v5e vs <1 ms for the factored closed form.

        Mh is returned as a 3x3 nested list of (nc, nz) slabs (not a
        (nc, nz, 3, 3) array): tensors whose two minor axes are tiny get
        (8,128)-tile padded by XLA, and the batched einsum application
        relayouts on top of that — the slab form runs the whole mass
        inverse at field bandwidth (the phase measured 6.5 ms/step on
        the 1M-DOF 3D bench in array form)."""
        w2 = jnp.asarray(self._qw_h)[None, :]             * self.mesh.detJ[:, None]  # (nc, nq)
        # host tab copies from __init__: the sharded step threads the
        # DEVICE tabs through shard_map as traced arguments, so
        # asm.space.phi may be a tracer here
        phi = self._phi_h  # (nq, 3) host scalars
        dq = geom["Delta_q"]  # (nc, nz, nq)
        nq = phi.shape[0]
        Mh = [[None] * 3 for _ in range(3)]
        for a in range(3):
            for b in range(a, 3):
                acc = None
                for q in range(nq):
                    t = (float(phi[q, a] * phi[q, b])
                         * w2[:, q, None]) * dq[:, :, q]
                    acc = t if acc is None else acc + t
                Mh[a][b] = acc
                Mh[b][a] = acc
        Mv = np.einsum("v,vp,vr->pr", self._wv_h,
                       self._psi_h, self._psi_h)
        return Mh, Mv

    @staticmethod
    def _inv3(A):
        """Closed-form 3x3 inverse on the slab representation (3x3
        nested list of (nc, nz) arrays)."""
        a, b, c = A[0][0], A[0][1], A[0][2]
        d, e, f = A[1][0], A[1][1], A[1][2]
        g, h, i = A[2][0], A[2][1], A[2][2]
        A11 = e * i - f * h
        A12 = c * h - b * i
        A13 = b * f - c * e
        A21 = f * g - d * i
        A22 = a * i - c * g
        A23 = c * d - a * f
        A31 = d * h - e * g
        A32 = b * g - a * h
        A33 = a * e - b * d
        inv_det = 1.0 / (a * A11 + b * A21 + c * A31)
        return [[A11 * inv_det, A12 * inv_det, A13 * inv_det],
                [A21 * inv_det, A22 * inv_det, A23 * inv_det],
                [A31 * inv_det, A32 * inv_det, A33 * inv_det]]

    @staticmethod
    def _inv2(A):
        """2x2 inverse of a (numpy) matrix."""
        a, b = A[0, 0], A[0, 1]
        c, d = A[1, 0], A[1, 1]
        det = a * d - b * c
        return np.asarray([[d, -b], [-c, a]]) / det

    @staticmethod
    def _kron_apply(Mh, Mv, u):
        """Apply (Mh (x) Mv) to u, axes (c, node, layer, vnode[, k]);
        Mh a 3x3 slab list, Mv a host 2x2 — fully unrolled multiply-adds
        so nothing with two tiny minor axes is ever materialized."""
        t = []
        for a in range(3):
            acc = None
            for b in range(3):
                x = Mh[a][b].reshape(
                    Mh[a][b].shape[:1] + (1,) + Mh[a][b].shape[1:]
                    + (1,) * (u.ndim - 3)) * u[:, b:b + 1]
                acc = x if acc is None else acc + x
            t.append(acc)  # (nc, 1, nz, 2[, k])
        t = jnp.concatenate(t, axis=1)  # (nc, 3, nz, 2[, k])
        tb, tt = t[:, :, :, 0], t[:, :, :, 1]
        out_b = float(Mv[0, 0]) * tb + float(Mv[0, 1]) * tt
        out_t = float(Mv[1, 0]) * tb + float(Mv[1, 1]) * tt
        return jnp.stack([out_b, out_t], axis=3)

    def mass_matrices(self, geom):
        """Dense per-(cell,layer) 6x6 mass matrices (kept for
        inspection/tests; the hot path uses the Kronecker factors)."""
        Mh, Mv = self._mass_factors(geom)
        Mh_arr = jnp.stack(
            [jnp.stack(row, axis=-1) for row in Mh], axis=-2)
        M = jnp.einsum("clab,pr->clapbr", Mh_arr, jnp.asarray(
            Mv, dtype=Mh_arr.dtype))
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
