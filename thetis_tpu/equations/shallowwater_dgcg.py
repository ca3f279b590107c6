r"""dg-cg element family for the 2D shallow-water equations.

The reference's ``element_family = 'dg-cg'`` (``solver2d.py:307-352``):
P1DG velocity paired with **P2 CG elevation**.  All momentum-row terms are
inherited unchanged from :class:`ShallowWaterEquations`; only the
elevation-space machinery differs:

* context: ``eta_q``/``eta_tr`` evaluated from CG2 dofs (single-valued
  traces — both facet sides identical),
* projection: elevation-row buckets are tested against the continuous P2
  basis and scatter-added into shared CG dofs.  Interior facet fluxes are
  written antisymmetrically by the terms ([-f, +f] per side), so they
  cancel to machine precision in the scatter — no term needs to know the
  test space is continuous,
* mass: consistent CG2 mass matrix applied cell-wise + scatter; inverted
  with lumped-Jacobi-preconditioned CG iterations (the reference uses a
  PETSc solve).

Wetting-and-drying requires the DG elevation space and is rejected here
(as in the reference, W&D is a dg-dg feature).
"""
import numpy as np
import jax.numpy as jnp
from jax import lax

from .shallowwater_2d import ShallowWaterEquations, swe_state
from ..fem.reference_element import P2Tri, triangle_quadrature

__all__ = ["ShallowWaterEquationsDGCG"]


class ShallowWaterEquationsDGCG(ShallowWaterEquations):
    def __init__(self, mesh, asm, cg2_space, options, bathymetry,
                 bnd_conditions=None, tidal_farms=None):
        assert not getattr(options, "use_wetting_and_drying", False), (
            "wetting-and-drying requires the dg-dg element family"
        )
        super().__init__(mesh, asm, options, bathymetry=bathymetry,
                         bnd_conditions=bnd_conditions,
                         tidal_farms=tidal_farms)
        self.eta_space = cg2_space
        self.cnm = cg2_space.cell_node_map               # (nc, 6)
        self.n_eta = cg2_space.node_count

        # cross-tabulations of the P2 basis at the P1DG assembler's
        # cell/facet quadrature points (all eager, mesh-static)
        qp = np.asarray(asm.space._tab_np["qp"])
        ts = np.asarray(asm.space._tab_np["qt"])
        Jinv_np = np.asarray(mesh.Jinv)
        self.phi2q = jnp.asarray(P2Tri.eval_basis(qp))   # (nq, 6)
        self.gphi2q = jnp.asarray(np.einsum(
            "qdj,cji->cqdi", P2Tri.eval_grad(qp), Jinv_np))  # (nc,nq,6,2)
        fpts = P2Tri.facet_points(ts)                    # (6, nqf, 2)
        phi2f = np.stack([P2Tri.eval_basis(fpts[v]) for v in range(6)])
        fv_np = np.asarray(mesh.facet_variant)           # (nf, 2)
        self.tr_tabs = jnp.asarray(phi2f[fv_np])         # (nf, 2, nqf, 6)
        fc_np = np.asarray(mesh.facet_cells)
        self.fcell_nodes = jnp.asarray(
            np.asarray(cg2_space.cell_node_map_np)[fc_np])  # (nf, 2, 6)

        # consistent reference P2 mass (exact: degree-4 quadrature) and
        # the lumped global mass for preconditioning
        qp4, qw4 = triangle_quadrature(4)
        phi4 = P2Tri.eval_basis(np.asarray(qp4))
        Mref2 = np.einsum("q,qd,qe->de", np.asarray(qw4), phi4, phi4)
        self.Mref2 = jnp.asarray(Mref2)
        lumped = np.zeros(cg2_space.node_count)
        np.add.at(lumped, np.asarray(cg2_space.cell_node_map_np).ravel(),
                  (Mref2.sum(axis=1)[None, :]
                   * np.asarray(mesh.detJ_np)[:, None]).ravel())
        self._lumped = jnp.asarray(lumped)

    # ---------------- CG2 elevation operators -------------------------
    def eta_cell_values(self, eta):
        return jnp.einsum("qd,cd->cq", self.phi2q, eta[self.cnm])

    def eta_traces(self, eta):
        """Single-valued facet traces broadcast to both sides
        (nf, 2, nqf): evaluated from each side's own cell (identical up
        to roundoff; keeping per-side evaluation preserves the exact
        antisymmetric cancellation of interior fluxes)."""
        cd = eta[self.fcell_nodes]                        # (nf, 2, 6)
        return jnp.einsum("fsqd,fsd->fsq", self.tr_tabs, cd)

    def _eta_scatter(self, local_cells=None, local_facets=None):
        """Accumulate per-cell (nc, 6) and per-facet-side (nf, 2, 6)
        contributions into the global CG dof vector."""
        r = jnp.zeros(self.n_eta)
        if local_cells is not None:
            r = r.at[self.cnm].add(local_cells)
        if local_facets is not None:
            r = r.at[self.fcell_nodes].add(local_facets)
        return r

    def project_eta_buckets(self, B_cell, B_grad, B_facet):
        """CG projection of the elevation-row accumulators."""
        asm = self.asm
        lc = None
        if B_cell is not None or B_grad is not None:
            lc = 0.0
            if B_cell is not None:
                lc = lc + jnp.einsum("cq,cq,qd->cd", B_cell, asm.wdetJ,
                                     self.phi2q)
            if B_grad is not None:
                lc = lc + jnp.einsum("cqi,cq,cqdi->cd", B_grad, asm.wdetJ,
                                     self.gphi2q)
        lf = None
        if B_facet is not None:
            lf = jnp.einsum("fsq,fq,fsqd->fsd", B_facet, asm.wlen,
                            self.tr_tabs)
        return self._eta_scatter(lc, lf)

    def eta_mass_apply(self, eta):
        local = jnp.einsum("de,ce->cd", self.Mref2, eta[self.cnm]) \
            * self.mesh.detJ[:, None]
        return self._eta_scatter(local_cells=local)

    def _eta_mass_pcg(self, r, iters=30):
        """Lumped-Jacobi-preconditioned CG on the consistent CG2 mass."""
        Ml = self._lumped

        def body(carry, _):
            x, p, res, rz = carry
            Ap = self.eta_mass_apply(p)
            alpha = rz / jnp.maximum((p * Ap).sum(),
                                     jnp.finfo(rz.dtype).tiny)
            x = x + alpha * p
            res = res - alpha * Ap
            z = res / Ml
            rz_new = (res * z).sum()
            p = z + (rz_new / jnp.maximum(rz,
                                          jnp.finfo(rz.dtype).tiny)) * p
            return (x, p, res, rz_new), None

        x0 = r / Ml
        res0 = r - self.eta_mass_apply(x0)
        z0 = res0 / Ml
        (x, _, _, _), _ = lax.scan(
            body, (x0, z0, res0, (res0 * z0).sum()), None, length=iters)
        return x

    def eta_mass_inverse(self, r):
        """Consistent CG2 mass inverse wrapped in custom_linear_solve:
        the PCG iteration itself is not (program-)linear, so expose it as
        a symmetric linear solve to make it transposable/differentiable
        (needed when it appears inside Newton-GMRES)."""
        return lax.custom_linear_solve(
            self.eta_mass_apply, r,
            solve=lambda mv, b: self._eta_mass_pcg(b),
            symmetric=True,
        )

    def norm_elev(self, eta):
        """L2 norm of a CG2 elevation field."""
        return jnp.sqrt(jnp.maximum((eta * self.eta_mass_apply(eta)).sum(),
                                    0.0))

    # ---------------- context / residual / mass ------------------------
    def build_context(self, solution, solution_old, fields, bnd_values):
        asm = self.asm
        uv, eta = solution["uv"], solution["elev"]
        uv_old, eta_old = solution_old["uv"], solution_old["elev"]
        c = {}
        bdyn = fields.get("bathymetry_2d")
        if bdyn is not None:
            from .base import facet_quad_value_2s
            c["bathy_q"] = self._any_cell_q(bdyn)
            c["bathy_grad_q"] = self._any_cell_grad(bdyn)
            c["bathy_tr"] = facet_quad_value_2s(asm, bdyn)
        else:
            c["bathy_q"] = self.bathy_q
            c["bathy_grad_q"] = self.bathy_grad_q
            c["bathy_tr"] = self.bathy_tr
        packed = jnp.concatenate([uv, uv_old], axis=-1)   # (nc, nd, 4)
        pq = asm.cell_values(packed)
        c["uv_q"] = pq[..., 0:2]
        c["uv_old_q"] = pq[..., 2:4]
        petr = asm.facet_traces(packed)
        c["uv_tr"] = petr[..., 0:2]
        c["uv_old_tr"] = petr[..., 2:4]
        c["eta_q"] = self.eta_cell_values(eta)
        c["eta_old_q"] = self.eta_cell_values(eta_old)
        # CG2 elevation gradient at cell quad points (direct-form epg)
        c["eta_grad_q"] = jnp.einsum(
            "cqdi,cd->cqi", self.gphi2q, eta[self.cnm])
        c["eta_tr"] = self.eta_traces(eta)
        c["eta_old_tr"] = self.eta_traces(eta_old)
        c["H_q"] = self.depth.total_depth(
            c["bathy_q"], c["eta_old_q"], self.alpha_q)
        c["H_tr"] = self.depth.total_depth(
            c["bathy_tr"], c["eta_old_tr"], self.alpha_tr)
        c["n"] = self.mesh.facet_normal[:, None, :]
        c["eta_ext"], c["uv_ext"] = self._bnd_ext(
            c["eta_tr"][:, 0], c["uv_tr"][:, 0], bnd_values,
            c["bathy_tr"][:, 0])
        c["eta_ext_old"], c["uv_ext_old"] = self._bnd_ext(
            c["eta_old_tr"][:, 0], c["uv_old_tr"][:, 0], bnd_values,
            c["bathy_tr"][:, 0])
        c["fields"] = fields
        c["bnd_values"] = bnd_values
        return c

    def _t_epg(self, c, B):
        """CG elevation: direct-gradient form (ref ``shallowwater_eq.py:
        384-393``, the ``eta_is_dg=False`` branch) — no interior facet
        terms, so the velocity block of the wave system stays a pure DG
        mass matrix (the AssembledSchurPC assumption, ref
        ``timeintegrator.py:358-364``).  Open boundaries get the linear
        Riemann correction ``g (eta_rie - eta) psi.n``."""
        g = self.g
        B["uv_cell"].add(-g * c["eta_grad_q"])
        n = c["n"]
        eta_b = c["eta_tr"][:, 0]
        uv_b = c["uv_tr"][:, 0]
        H_b = c["H_tr"][:, 0]
        srt = jnp.sqrt(jnp.abs(H_b) / g)
        un_jump = ((uv_b - c["uv_ext"]) * n).sum(-1)
        eta_rie = 0.5 * (eta_b + c["eta_ext"]) + srt * un_jump
        contrib = (
            -g * (eta_rie - eta_b)[..., None] * n
            * self._mask_q(self.mask_open, 1)
        )
        B["uv_facet"].add(
            jnp.stack([contrib, jnp.zeros_like(contrib)], axis=1)
        )

    def residual(self, label, solution, solution_old, fields, fields_old,
                 bnd_values):
        from .base import Bucket
        c = self.build_context(solution, solution_old, fields, bnd_values)
        c["_uv_dofs"] = solution["uv"]
        c["_uv_old_dofs"] = solution_old["uv"]
        # CG2 elevation gradient at cell quad points (grad-depth viscosity)
        c["eta_old_grad_q"] = jnp.einsum(
            "cqdi,cd->cqi", self.gphi2q, solution_old["elev"][self.cnm])
        B = {k: Bucket() for k in
             ("uv_cell", "uv_grad", "uv_facet", "uv_fgrad",
              "eta_cell", "eta_grad", "eta_facet")}
        for _, method in self.select_terms(label):
            method(c, B)
        asm = self.asm
        # momentum rows: standard DG projection
        r_uv = jnp.zeros_like(solution["uv"])
        if B["uv_cell"]:
            r_uv += asm.cell_to_dofs(B["uv_cell"].val)
        if B["uv_grad"]:
            r_uv += asm.grad_to_dofs(B["uv_grad"].val)
        if B["uv_facet"] and B["uv_fgrad"]:
            r_uv += asm.facet_fgrad_to_dofs(B["uv_facet"].val,
                                            B["uv_fgrad"].val)
        elif B["uv_facet"]:
            r_uv += asm.facet_to_dofs(B["uv_facet"].val)
        elif B["uv_fgrad"]:
            r_uv += asm.fgrad_to_dofs(B["uv_fgrad"].val)
        # elevation rows: CG projection (interior fluxes cancel in the
        # scatter)
        r_eta = self.project_eta_buckets(
            B["eta_cell"].val if B["eta_cell"] else None,
            B["eta_grad"].val if B["eta_grad"] else None,
            B["eta_facet"].val if B["eta_facet"] else None,
        )
        return swe_state(r_uv, r_eta)

    def mass_term(self, solution):
        return swe_state(self.asm.mass_apply(solution["uv"]),
                         self.eta_mass_apply(solution["elev"]))

    def mass_inverse(self, r):
        return swe_state(self.asm.mass_inverse(r["uv"]),
                         self.eta_mass_inverse(r["elev"]))
