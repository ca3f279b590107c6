"""Matrix-free DG assembly primitives.

This module is the TPU-native replacement for the reference's TSFC-compiled
element kernels + PyOP2 par_loops (SURVEY.md section 2.9 item 2): every weak-form
integral is evaluated as batched dense tensor contractions over the mesh's
static cell/facet tables.

Design (scatter-free):
  1. *evaluate*: gather dof values, tabulate solution/fields at cell and
     facet quadrature points (batched matmuls -> MXU/VPU friendly),
  2. *accumulate*: terms add their integrands into shared quadrature-point
     accumulators (pure elementwise math -> XLA fuses across terms),
  3. *project*: accumulators are tested against basis (matmuls) and facet
     contributions are *gathered* per cell via ``cell_facets``/``cell_sides``
     (no scatter-add in the hot loop).

Accumulator conventions (R = d(u)/dt weak residual, reference sign):
  acc_cell  (nc, nq[, k])       tested against   test value
  acc_grad  (nc, nq[, k], 2)    tested against   d(test)/dx_i
  acc_facet (nf, 2, nqf[, k])   tested against   per-side test trace
  acc_fgrad (nf, 2, nqf[, k], 2) tested against  per-side trace of grad(test)
"""
import numpy as np
import jax.numpy as jnp

__all__ = ["DGAssembler", "coefficient_cell_q"]


def coefficient_cell_q(asm, val, vector=False):
    """Evaluate a coefficient at cell quadrature points: accepts python
    scalars, 0-d arrays, CG1 vertex arrays (nv,), DG dof arrays (nc, nd),
    P0 arrays (nc, 1) or ready (nc, nq) arrays (+ trailing component axis
    for vectors)."""
    mesh = asm.mesh
    tail = (2,) if vector else ()
    nq = len(asm.space._tab_np["qw"])
    if val is None:
        return None
    if np.isscalar(val) or (hasattr(val, "ndim") and val.ndim == len(tail)):
        return jnp.broadcast_to(jnp.asarray(val), (mesh.nc, nq) + tail)
    val = jnp.asarray(val)
    if val.shape[:1] == (mesh.nv,):
        return asm.cg1_values(val[mesh.cells])
    if val.shape[:2] == (mesh.nc, asm.ndofs):
        return asm.cell_values(val)
    if val.shape[:2] == (mesh.nc, 1):  # P0
        return jnp.broadcast_to(val[:, :1], (mesh.nc, nq) + tail)
    if val.shape[:2] == (mesh.nc, nq):
        return val
    raise ValueError(f"cannot evaluate coefficient of shape {val.shape}")


def _wexpand(w, acc, ndim_head):
    """Reshape weight array w to broadcast against acc beyond ndim_head axes."""
    extra = acc.ndim - ndim_head
    return w.reshape(w.shape + (1,) * extra)


class DGAssembler:
    """Assembly context for one (mesh, element, quadrature) combination.

    All methods are pure jnp functions of their array arguments; the tables
    captured at construction are static."""

    def __init__(self, mesh, space):
        self.mesh = mesh
        self.space = space
        el = space.element
        self.ndofs = el.ndofs

        # host-side exact reference mass matrix and inverse
        tab = space._tab_np
        Mref = np.einsum("q,qd,qe->de", tab["qw"], tab["phi"], tab["phi"])
        self._Mref_np = Mref
        self._Mref_inv_np = np.linalg.inv(Mref)
        self.Mref = jnp.asarray(Mref)
        self.Mref_inv = jnp.asarray(self._Mref_inv_np)
        # eager (never under trace): flat (nc, 3) index into (nf*2, ...)
        # per-side facet contribution arrays — one single-axis gather
        # instead of a two-index gather in the hot loop
        self.cell_facet_flat = jnp.asarray(
            np.asarray(mesh.cell_facets) * 2 + np.asarray(mesh.cell_sides)
        )
        # eager mesh-static tabulation tensors: paying O(nf) memory here
        # removes two index-gathers per residual evaluation at trace time
        fv_np = np.asarray(mesh.facet_variant)
        fc_np = np.asarray(mesh.facet_cells)
        phi_f_np = np.asarray(tab["phi_f"])
        dphi_f_np = np.asarray(tab["dphi_f"])
        Jinv_np = np.asarray(mesh.Jinv)
        self.both_tabs = jnp.asarray(phi_f_np[fv_np])  # (nf,2,nqf,nd)
        gt_np = np.einsum(
            "fsqdj,fsji->fsqdi", dphi_f_np[fv_np], Jinv_np[fc_np]
        )
        self.both_gtabs_c = jnp.asarray(gt_np)  # (nf,2,nqf,nd,2)
        # weight-folded flat projection tables: (nf*2, nqf, nd) and
        # (nf*2, nqf, nd, 2) — the projection einsums then run rank-3
        # (flat facet-side axis), which avoids TPU tile padding on the
        # tiny (2, nqf) minor dims (measured ~1 ms/residual)
        wlen_np = (np.asarray(self.space._tab_np["qwf"])[None, :]
                   * np.asarray(mesh.facet_len)[:, None])  # (nf, nqf)
        nfl = fv_np.shape[0]
        self.wtabs_flat = jnp.asarray(
            (phi_f_np[fv_np] * wlen_np[:, None, :, None]).reshape(
                nfl * 2, -1, el.ndofs)
        )
        self.wgtabs_flat = jnp.asarray(
            (gt_np * wlen_np[:, None, :, None, None]).reshape(
                nfl * 2, -1, el.ndofs, 2)
        )
        # CG1 coefficient tabulations at THIS space's quadrature points
        # (identical to phi/dphi on a P1 space): CG1 vertex coefficients
        # (bathymetry, Coriolis, ...) ride any-degree assemblers
        from .reference_element import P1Tri

        self.phi_cg1 = jnp.asarray(P1Tri.eval_basis(np.asarray(tab["qp"])))
        self.dphi_cg1 = jnp.asarray(P1Tri.eval_grad(np.asarray(tab["qp"])))

    # -- cached device tables -------------------------------------------
    @property
    def wdetJ(self):  # (nc, nq)
        return self.space.qw[None, :] * self.mesh.detJ[:, None]

    @property
    def wlen(self):  # (nf, nqf)
        return self.space.qwf[None, :] * self.mesh.facet_len[:, None]

    def both_gtabs(self):
        """Physical facet basis gradients, both sides: (nf, 2, nqf, nd, 2)."""
        return self.both_gtabs_c

    def _side_tab(self, s):
        """Facet basis tabulation for side s: (nf, nqf, nd)."""
        return self.space.phi_f[self.mesh.facet_variant[:, s]]

    def _side_gtab(self, s):
        """Physical facet basis gradients for side s: (nf, nqf, nd, 2)."""
        dphi = self.space.dphi_f[self.mesh.facet_variant[:, s]]  # (nf,nqf,nd,2)
        Jinv = self.mesh.Jinv[self.mesh.facet_cells[:, s]]  # (nf,2,2)
        return jnp.einsum("fqdj,fji->fqdi", dphi, Jinv)

    # ======================= evaluation ================================
    def cell_values(self, u):
        """(nc, nd[, k]) dofs -> (nc, nq[, k]) quad-point values."""
        return jnp.einsum("qd,cd...->cq...", self.space.phi, u)

    def cell_grads(self, u):
        """(nc, nd[, k]) -> (nc, nq[, k], 2) physical gradients."""
        g = jnp.einsum("qdj,cd...->cq...j", self.space.dphi, u)
        return jnp.einsum("cq...j,cji->cq...i", g, self.mesh.Jinv)

    def cg1_values(self, u):
        """CG1 cell-vertex data (nc, 3[, k]) -> (nc, nq[, k]) at this
        space's quadrature points (any degree)."""
        return jnp.einsum("qd,cd...->cq...", self.phi_cg1, u)

    def cg1_grads(self, u):
        """CG1 cell-vertex data (nc, 3[, k]) -> (nc, nq[, k], 2)."""
        g = jnp.einsum("qdj,cd...->cq...j", self.dphi_cg1, u)
        return jnp.einsum("cq...j,cji->cq...i", g, self.mesh.Jinv)

    def _gather_sides(self, u):
        """Gather both-side cell dofs: (nc, nd[, k]) -> (nf, 2, nd[, k]).

        The gather runs on a rank-2 view (trailing dims flattened): TPU
        tiles the two minormost axes to (8, 128), so gathering a rank-3/4
        array with tiny minor dims pads every row to a full tile (~1.6x
        slower, measured).  One gather serves both sides."""
        flat = u.reshape(u.shape[0], -1)
        cd = flat[self.mesh.facet_cells]  # (nf, 2, prod)
        return cd.reshape(cd.shape[:2] + u.shape[1:])

    def facet_traces(self, u):
        """(nc, nd[, k]) -> (nf, 2, nqf[, k]) both-side traces."""
        return jnp.einsum("fsqd,fsd...->fsq...", self.both_tabs,
                          self._gather_sides(u))

    def facet_trace_grads(self, u):
        """(nc, nd[, k]) -> (nf, 2, nqf[, k], 2)."""
        return jnp.einsum("fsqdi,fsd...->fsq...i", self.both_gtabs(),
                          self._gather_sides(u))

    def facet_midpoint_data(self, vertex_field):
        """Evaluate a P1CG (per-vertex) coefficient at facet quad points:
        (nv,) -> (nf, nqf).  Linear along the facet."""
        fv = self.mesh.facet_verts
        a = vertex_field[fv[:, 0]]
        b = vertex_field[fv[:, 1]]
        t = self.space.tab("qt") if "qt" in self.space._tab_np else None
        if t is None:
            raise RuntimeError
        return a[:, None] + (b - a)[:, None] * t[None, :]

    # ======================= projection ================================
    def cell_to_dofs(self, acc):
        """(nc, nq[, k]) -> (nc, nd[, k])."""
        accw = acc * _wexpand(self.wdetJ, acc, 2)
        return jnp.einsum("cq...,qd->cd...", accw, self.space.phi)

    def grad_to_dofs(self, acc):
        """(nc, nq[, k], 2) -> (nc, nd[, k])."""
        accw = acc * _wexpand(self.wdetJ[..., None], acc, 3)
        # d(test_d)/dx_i = dphi[q,d,j] Jinv[c,j,i]
        return jnp.einsum(
            "cq...i,qdj,cji->cd...", accw, self.space.dphi, self.mesh.Jinv
        )

    def _gather_cells(self, contrib):
        """(nf, 2, nd[, k]) per-side facet contributions -> (nc, nd[, k]):
        flat single-axis rank-2 gather (see _gather_sides on why rank-2)
        + sum over the 3 local facets."""
        flat = contrib.reshape(contrib.shape[0] * 2, -1)  # (nf*2, prod)
        g = flat[self.cell_facet_flat]  # (nc, 3, prod)
        return g.sum(axis=1).reshape((-1,) + contrib.shape[2:])

    def _facet_contrib_flat(self, acc):
        """(nf, 2, nqf[, k...]) -> ((nf*2, nd*k) weighted per-side test
        contributions, tail shape).  Flat rank-3 shapes throughout
        (weights pre-folded into wtabs_flat) to avoid TPU tile padding."""
        nqf = acc.shape[2]
        a2 = acc.reshape(acc.shape[0] * 2, nqf, -1)  # (nf*2, nqf, k)
        c = jnp.einsum("fqk,fqd->fdk", a2, self.wtabs_flat)
        return c.reshape(c.shape[0], -1), acc.shape[3:]

    def facet_to_dofs(self, acc):
        """(nf, 2, nqf[, k]) -> (nc, nd[, k])."""
        flat, tail = self._facet_contrib_flat(acc)
        g = flat[self.cell_facet_flat].sum(axis=1)  # (nc, nd*k)
        return g.reshape((g.shape[0], self.ndofs) + tail)

    def _fgrad_contrib_flat(self, acc):
        """(nf, 2, nqf[, k], 2) -> ((nf*2, nd*k) contributions, tail)."""
        nqf = acc.shape[2]
        tail = acc.shape[3:-1]
        a2 = acc.reshape((acc.shape[0] * 2, nqf, -1, 2))  # (nf*2,nqf,k,2)
        c = jnp.einsum("fqki,fqdi->fdk", a2, self.wgtabs_flat)
        return c.reshape(c.shape[0], -1), tail

    def fgrad_to_dofs(self, acc):
        """(nf, 2, nqf[, k], 2) -> (nc, nd[, k])."""
        flat, tail = self._fgrad_contrib_flat(acc)
        g = flat[self.cell_facet_flat].sum(axis=1)
        return g.reshape((g.shape[0], self.ndofs) + tail)

    def facet_fgrad_to_dofs(self, acc_facet, acc_fgrad):
        """Combined facet + facet-gradient projection sharing ONE cell
        gather: acc_facet (nf,2,nqf[,k]), acc_fgrad (nf,2,nqf[,kg],2) with
        kg <= k (missing trailing components padded with zeros)."""
        flat_f, tail = self._facet_contrib_flat(acc_facet)
        flat_g, _ = self._fgrad_contrib_flat(acc_fgrad)
        if flat_g.shape[1] != flat_f.shape[1]:
            # flat layout is (nd, k) row-major: pad each dof block's
            # component axis up to the facet accumulator's k
            kf = flat_f.shape[1] // self.ndofs
            kg = flat_g.shape[1] // self.ndofs
            fg = flat_g.reshape(-1, self.ndofs, kg)
            fg = jnp.pad(fg, ((0, 0), (0, 0), (0, kf - kg)))
            flat_g = fg.reshape(-1, self.ndofs * kf)
        g = (flat_f + flat_g)[self.cell_facet_flat].sum(axis=1)
        return g.reshape((g.shape[0], self.ndofs) + tail)

    # ======================= mass operators ============================
    def mass_apply(self, u):
        """Block-diagonal DG mass matrix action (exact for affine cells)."""
        return jnp.einsum("de,ce...->cd...", self.Mref, u) * _wexpand(
            self.mesh.detJ[:, None], u, 2
        )

    def mass_inverse(self, r):
        """Exact inverse mass action (the reference needs a PETSc solve;
        for DG this is a closed-form 3x3 block inverse)."""
        return jnp.einsum("de,ce...->cd...", self.Mref_inv, r) / _wexpand(
            self.mesh.detJ[:, None], r, 2
        )

    def project_rhs(self, fq):
        """L2-project quad-point values (nc, nq[, k]) onto DG dofs."""
        return self.mass_inverse(self.cell_to_dofs(fq))

    # ======================= integrals =================================
    def integrate_cellq(self, fq):
        """Integrate quad-point values over the domain."""
        return jnp.einsum("cq...,cq->...", fq, self.wdetJ)

    def integrate(self, u):
        return self.integrate_cellq(self.cell_values(u))

    def norm_l2(self, u):
        v = self.cell_values(u)
        if v.ndim == 3:
            v2 = (v**2).sum(-1)
        else:
            v2 = v**2
        return jnp.sqrt(jnp.einsum("cq,cq->", v2, self.wdetJ))
