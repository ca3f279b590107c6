r"""2D suspended-sediment equation.

Re-implementation of ``thetis/sediment_eq_2d.py``: the tracer
advection-diffusion machinery plus

  SedimentErosionTerm     (ref L84-93)   source
  SedimentDepositionTerm  (ref L96-104)  implicit

and the 'equilibrium' boundary condition (ref L46-55), which sets the
external sediment value to the model's equilibrium concentration.

The advective-velocity correction factor
(``SedimentModel.get_advective_velocity_correction_factor``) is injected as
the tracer machinery's ``tracer_advective_velocity_factor`` field by the
solver layer.
"""
import jax.numpy as jnp

from .tracer_2d import TracerEquation2D

__all__ = ["SedimentEquation2D"]


class SedimentEquation2D(TracerEquation2D):
    def __init__(self, mesh, asm, options, bathymetry, sediment_model,
                 bnd_conditions=None, depth=None, conservative=False):
        self.sediment_model = sediment_model
        self.conservative = conservative
        super().__init__(
            mesh, asm, options, bathymetry, labels=["sediment_2d"],
            bnd_conditions=bnd_conditions, depth=depth,
        )
        self.conservative_map = {"sediment_2d": conservative}
        self.conservative["sediment_2d"] = conservative
        self.add_term("SedimentErosionTerm", "source", self._t_erosion)
        self.add_term("SedimentDepositionTerm", "implicit", self._t_deposition)

    def _H_q(self, c):
        eta_q = self._coeff_q(c["fields"]["elev_2d"])
        bathy_q = self._coeff_q(c["fields"].get("bathymetry_2d", self.bathymetry))
        return self.depth.total_depth(bathy_q, eta_q)

    def _t_erosion(self, c, B):
        """ref ``sediment_eq_2d.py:84-93``."""
        uv_q = c["uv_q"]
        H_q = self._H_q(c)
        ero = self.sediment_model.get_erosion_term(uv_q, H_q)
        if not self.conservative_map["sediment_2d"]:
            ero = ero / H_q
        B["sediment_2d_cell"].add(ero)

    def _t_deposition(self, c, B):
        """ref ``sediment_eq_2d.py:96-104``."""
        uv_q = c["uv_q"]
        H_q = self._H_q(c)
        depo = self.sediment_model.get_deposition_coefficient(uv_q, H_q)
        B["sediment_2d_cell"].add(-depo / H_q * c["c_q"]["sediment_2d"])

    def _c_ext(self, label, c_b, bnd_values):
        """Adds the 'equilibrium' BC (ref L46-55)."""
        c_ext = super()._c_ext(label, c_b, bnd_values)
        ctx = getattr(self, "_bnd_ctx", None)
        for m in self.open_markers:
            keys = self.bnd_keys.get(m)
            if keys is None or "equilibrium" not in keys:
                continue
            assert "value" not in keys, \
                "cannot specify both equilibrium and value for sediment bcs"
            if ctx is None:
                continue
            uv_b, H_b = ctx
            ceq = self.sediment_model.get_equilibrium_tracer(uv_b, H_b)
            if self.conservative_map["sediment_2d"]:
                ceq = ceq * H_b
            mask = self._mask_q(self.marker_masks[m])
            c_ext = jnp.where(mask, ceq, c_ext)
        return c_ext

    def build_context(self, solution, solution_old, fields, bnd_values):
        # make boundary (uv, H) traces available to the equilibrium BC
        c = super().build_context(solution, solution_old, fields, bnd_values)
        if "uv_tr" in c:
            eta_b = c["eta_tr0"]
            bathy_b = self.bathy_tr0[:, 0] if self.bathy_tr0.ndim == 3 else self.bathy_tr0
            H_b = self.depth.total_depth(bathy_b, eta_b)
            self._bnd_ctx = (c["uv_tr"][:, 0], H_b)
        return c
