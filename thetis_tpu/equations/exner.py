r"""Exner bed-evolution equation.

Re-implementation of ``thetis/exner_eq.py``:

  ExnerSourceTerm   (ref L56-84)    source   — suspended-load exchange
  ExnerBedloadTerm  (ref L87-129)   implicit — Meyer-Peter-Mueller bedload

solved in the continuous (CG1) bathymetry space like the reference (the
bed is the SWE bathymetry field, positive downward).  CG assembly uses
per-cell integration followed by a scatter-add over the cell->vertex map;
the consistent CG mass system is solved with lumped-Jacobi-preconditioned
CG iterations (the reference uses a PETSc solve).
"""
import numpy as np
import jax
import jax.numpy as jnp

from .base import EquationBase

__all__ = ["ExnerEquation"]


class ExnerEquation(EquationBase):
    def __init__(self, mesh, asm, cg_space, depth, sediment_model, options,
                 bnd_conditions=None, depth_integrated_sediment=False):
        super().__init__(mesh, asm, bnd_conditions)
        self.space = cg_space
        self.depth = depth
        self.sediment_model = sediment_model
        self.options = options
        self.depth_integrated_sediment = depth_integrated_sediment
        so = options.sediment_model_options
        self.fac = float(so.morphological_acceleration_factor) / (
            1.0 - float(so.porosity)
        )
        self.add_term("ExnerSourceTerm", "source", self._t_source)
        if so.use_bedload:
            self.add_term("ExnerBedloadTerm", "implicit", self._t_bedload)
        if so.use_sediment_slide:
            self.add_term("ExnerSedimentSlideTerm", "implicit", self._t_slide)
            sr = so.slide_region
            if sr is None:
                self._slide_region_q = None
            else:
                sr = jnp.asarray(sr.data if hasattr(sr, "data") else sr)
                if sr.shape[:1] == (mesh.nv,):
                    sr = sr[mesh.cells]
                self._slide_region_q = asm.cell_values(sr)

        # lumped CG mass (row sums of the consistent mass matrix)
        ml_cell = np.einsum("q,qd->d", asm.space._tab_np["qw"],
                            asm.space._tab_np["phi"])
        lumped = np.zeros(cg_space.node_count)
        np.add.at(
            lumped,
            cg_space.cell_node_map_np.ravel(),
            (ml_cell[None, :] * mesh.detJ_np[:, None]).ravel(),
        )
        self._lumped = jnp.asarray(lumped)

    # -- CG assembly helpers -------------------------------------------
    def _scatter(self, local):
        """(nc, nd) per-cell dof contributions -> (n_cg,)."""
        return jnp.zeros(
            self.space.node_count, dtype=local.dtype
        ).at[self.space.cell_node_map].add(local)

    def _cell_dofs(self, u):
        return u[self.space.cell_node_map]

    # -- terms -----------------------------------------------------------
    def _ctx(self, solution, solution_old, fields):
        asm = self.asm
        c = {"fields": fields}
        c["uv_q"] = asm.cell_values(fields["uv_2d"])
        c["eta_q"] = asm.cell_values(fields["elev_2d"])
        zb_cell = self._cell_dofs(solution["bathymetry"])
        zb_old_cell = self._cell_dofs(solution_old["bathymetry"])
        c["H_q"] = self.depth.total_depth(
            asm.cell_values(zb_cell), c["eta_q"]
        )
        c["grad_zb"] = asm.cell_grads(zb_cell)
        c["grad_zb_old"] = asm.cell_grads(zb_old_cell)
        return c

    def _t_source(self, c, B):
        """ref ``exner_eq.py:56-84``."""
        f = c["fields"]
        sed = f.get("sediment")
        if sed is None:
            return
        sed_q = self.asm.cell_values(sed) if sed.ndim >= 2 else sed
        m = self.sediment_model
        ero = m.get_erosion_term(c["uv_q"], c["H_q"])
        depo = m.get_deposition_coefficient(c["uv_q"], c["H_q"]) * sed_q
        if self.depth_integrated_sediment:
            depo = depo / c["H_q"]
        B["cell"].add(self.fac * (ero - depo))

    def _t_bedload(self, c, B):
        """ref ``exner_eq.py:87-129``: R = fac * div(Qb) in the bed-depth
        convention; by parts the cell term tests -fac*Qb against grad(psi)
        with sign matching d(zb)/dt = +fac div(Qb)."""
        m = self.sediment_model
        qbx, qby = m.get_bedload_term(
            c["uv_q"], c["H_q"], c["grad_zb_old"], c["grad_zb"]
        )
        qb = jnp.stack([qbx, qby], axis=-1)
        B["grad"].add(self.fac * qb)
        # open-boundary flux (closed boundaries: no contribution,
        # ref L108-126); evaluated from side-0 traces
        if self.open_markers:
            asm = self.asm
            uv_tr = asm.facet_traces(c["fields"]["uv_2d"])[:, 0]
            eta_tr = asm.facet_traces(c["fields"]["elev_2d"])[:, 0]
            # P1 gradients are cellwise constant: take the owner cell's
            gz_tr = c["grad_zb"][self.mesh.facet_cells[:, 0], :1, :]
            zb_tr = asm.facet_traces(
                self._cell_dofs(c["_solution"]["bathymetry"])
            )[:, 0]
            H_b = self.depth.total_depth(zb_tr, eta_tr)
            qbx_b, qby_b = m.get_bedload_term(uv_tr, H_b, gz_tr, gz_tr)
            n = self.mesh.facet_normal[:, None, :]
            qbn = qbx_b * n[..., 0] + qby_b * n[..., 1]
            contrib = -self.fac * qbn * self._mask_q(self.mask_open)
            B["facet"].add(jnp.stack([contrib, jnp.zeros_like(contrib)], axis=1))

    def _t_slide(self, c, B):
        """Sediment-slide bed diffusion (ref ``exner_eq.py:132-150``):
        the weak residual is ``alphaconst * grad(zb) . grad(test)`` with
        the non-positive slide coefficient from the sediment model
        (``sediment_model.py:312-354``); the reference's interior-penalty
        terms vanish identically on the continuous (CG1) bed space used
        here, exactly as they do in the reference's default setup."""
        alpha = self.sediment_model.get_sediment_slide_term(
            c["grad_zb_old"], getattr(self, "_slide_region_q", None)
        )
        B["grad"].add(alpha[..., None] * c["grad_zb"])

    # -- interface -------------------------------------------------------
    def residual(self, label, solution, solution_old, fields, fields_old,
                 bnd_values):
        from .base import Bucket

        c = self._ctx(solution, solution_old, fields)
        c["_solution"] = solution
        B = {"cell": Bucket(), "grad": Bucket(), "facet": Bucket()}
        for _, method in self.select_terms(label):
            method(c, B)
        asm = self.asm
        r = jnp.zeros(self.space.node_count,
                      dtype=solution["bathymetry"].dtype)
        if B["cell"]:
            r = r + self._scatter(asm.cell_to_dofs(B["cell"].val))
        if B["grad"]:
            r = r + self._scatter(asm.grad_to_dofs(B["grad"].val))
        if B["facet"]:
            # facet contributions arrive as per-(facet,side) local-dof
            # arrays; route them through the DG facet machinery then
            # scatter cellwise
            local = asm.facet_to_dofs(B["facet"].val)
            r = r + self._scatter(local)
        return {"bathymetry": r}

    def mass_term(self, solution):
        u = solution["bathymetry"]
        m_local = self.asm.mass_apply(self._cell_dofs(u))
        return {"bathymetry": self._scatter(m_local)}

    def mass_inverse(self, r, iterations=6):
        """Consistent-mass solve by lumped-Jacobi preconditioned
        Richardson/CG iterations."""
        b = r["bathymetry"]
        Ml_inv = 1.0 / self._lumped

        def mass_mv(x):
            return self._scatter(self.asm.mass_apply(self._cell_dofs(x)))

        x = Ml_inv * b
        for _ in range(iterations):
            x = x + Ml_inv * (b - mass_mv(x))
        return {"bathymetry": x}
