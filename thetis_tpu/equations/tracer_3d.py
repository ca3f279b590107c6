r"""3D tracer advection-diffusion on extruded prisms.

Re-implementation of ``thetis/tracer_eq.py`` (conservative form, ref
L380-411):

  HorizontalAdvectionTerm (ref L118-190): upwinded inter-column fluxes,
      layer-by-layer over the 2D facet tables
  VerticalAdvectionTerm   (ref L192-239): upwinded inter-layer fluxes with
      w (and w_mesh for ALE)
  HorizontalDiffusionTerm (ref L241-303): SIPG on vertical facets
  VerticalDiffusionTerm   (ref L305-359): SIPG on horizontal facets
  SourceTerm              (ref L361-377)

Solution layout: ``(nc, 3, nz, 2)``; velocity fields uv_3d
``(nc, 3, nz, 2, 2)``, w ``(nc, 3, nz, 2)``.
"""
import jax.numpy as jnp

from .base import Bucket, EquationBase

__all__ = ["TracerEquation3D"]


class TracerEquation3D(EquationBase):
    def __init__(self, mesh2d, asm3d, options, bnd_conditions=None,
                 label="salt_3d"):
        super().__init__(mesh2d, asm3d.asm2d, bnd_conditions)
        self.asm3d = asm3d
        self.options = options
        self.label = label
        p = 1
        self.cp = (p + 1) * (p + 2) / 2.0
        self.sipg = float(getattr(options, "sipg_factor_tracer", 1.0))
        self.sipg_v = float(getattr(options, "sipg_factor_vertical_tracer", 1.0))
        self.use_lf = bool(getattr(options, "use_lax_friedrichs_tracer", False))
        self.add_term("HorizontalAdvectionTerm", "explicit", self._t_hadv)
        self.add_term("VerticalAdvectionTerm", "explicit", self._t_vadv)
        self.add_term("HorizontalDiffusionTerm", "explicit", self._t_hdiff)
        self.add_term("VerticalDiffusionTerm", "explicit", self._t_vdiff)
        self.add_term("SourceTerm", "source", self._t_source)

    # -- context ---------------------------------------------------------
    def build_context(self, solution, fields, geom):
        a3 = self.asm3d
        c = {"fields": fields, "geom": geom}
        cdofs = solution[self.label]
        c["c_q"] = a3.cell_values(cdofs)
        uv = fields["uv_3d"]
        c["uv_q"] = a3.cell_values(uv)
        c["c_tr"] = a3.facet_traces(cdofs)       # (nf,2,nz,nqf,nqv)
        c["uv_tr"] = a3.facet_traces(uv)         # (nf,2,nz,nqf,nqv,2)
        c["n"] = self.mesh.facet_normal[:, None, None, None, :]
        # interface values for vertical fluxes; ALE: advect with w - w_mesh
        # (ref tracer_eq.py:294-296)
        c["c_below"], c["c_above"] = a3.interface_values(cdofs)
        w = fields.get("w_3d")
        if w is not None:
            wm = fields.get("w_mesh_3d")
            w_rel = w if wm is None else w - wm
            c["w_rel"] = w_rel
            wb, wa = a3.interface_values(w_rel)
            c["w_if"] = 0.5 * (wb + wa)
        return c

    # -- terms -----------------------------------------------------------
    def _t_hadv(self, c, B):
        """Conservative horizontal advection with upwinding
        (ref ``tracer_eq.py:118-190``)."""
        n = c["n"]
        B["grad"].add(c["c_q"][..., None] * c["uv_q"][..., 0:2])
        un0 = (c["uv_tr"][:, 0] * n).sum(-1)
        un1 = (c["uv_tr"][:, 1] * n).sum(-1)
        un_av = 0.5 * (un0 + un1)
        s = 0.5 * (jnp.sign(un_av) + 1.0)
        c0, c1 = c["c_tr"][:, 0], c["c_tr"][:, 1]
        c_up = c0 * s + c1 * (1 - s)
        flux = c_up * un_av
        mi = self.mask_int.reshape(-1, 1, 1, 1)
        B["vfacet"].add(jnp.stack([-flux, flux], axis=1) * mi[:, None])
        if self.use_lf:
            gamma = 0.5 * jnp.abs(un_av)
            jmp = c1 - c0
            B["vfacet"].add(
                jnp.stack([gamma * jmp, -gamma * jmp], axis=1) * mi[:, None]
            )
        # boundary: outflow of the internal value; where a 'value' BC is
        # prescribed the upwinded external tracer enters on inflow
        # (ref ``tracer_eq.py:171-189``)
        c_ext = c0
        bnd_values = c.get("bnd_values") or {}
        for m in self.open_markers:
            keys = self.bnd_keys.get(m)
            if keys is None or ("value" not in keys
                                and f"value-{self.label}" not in keys):
                continue
            key = (f"value-{self.label}"
                   if f"value-{self.label}" in keys else "value")
            if key not in bnd_values.get(m, {}):
                # no value supplied this evaluation (e.g. the uniform-
                # field consistency drift): keep the internal upwind
                continue
            val = jnp.asarray(bnd_values[m][key])
            if val.ndim >= 3:  # full 3D dof field (nc, 3, nz, 2)
                v_m = self.asm3d.facet_traces(val)[:, 0]
            else:
                v_m = jnp.broadcast_to(val, c0.shape)
            mk = self.marker_masks[m].reshape(-1, 1, 1, 1)
            c_ext = jnp.where(mk > 0, v_m, c_ext)
        s0 = 0.5 * (jnp.sign(un0) + 1.0)
        c_up_b = c0 * s0 + c_ext * (1 - s0)
        fl = c_up_b * un0 * self.mask_bnd.reshape(-1, 1, 1, 1)
        B["vfacet"].add(jnp.stack([-fl, jnp.zeros_like(fl)], axis=1))

    def _t_vadv(self, c, B):
        """Vertical advection through layer interfaces, upwinded
        (ref ``tracer_eq.py:192-239``); surface/bottom closed."""
        if "w_if" not in c:
            return
        w = c["w_if"]  # (nc, nz+1, nq)
        cb, ca = c["c_below"], c["c_above"]
        s = 0.5 * (jnp.sign(w) + 1.0)
        c_up = cb * s + ca * (1 - s)  # upward flow advects lower value
        flux = c_up * w
        # closed top/bottom: no flux through the surface and bed
        zero = jnp.zeros_like(flux[:, :1])
        flux = jnp.concatenate([zero, flux[:, 1:-1], zero], axis=1)
        # same sign pattern as the horizontal facets: the below side (its
        # outward normal is +z, along w) gets -flux, the above side +flux
        B["hfacet_below"].add(-flux)
        B["hfacet_above"].add(flux)
        # cell term: + c (w - w_mesh) d(test)/dz
        wq = self.asm3d.cell_values(c["w_rel"])
        B["gradz"].add(c["c_q"] * wq)

    def _t_hdiff(self, c, B):
        mu = c["fields"].get("diffusivity_h")
        if mu is None:
            return
        a3 = self.asm3d
        cdofs = c["_dofs"]
        g = a3.cell_grads(cdofs, c["geom"])  # (nc,nz,nq,nqv,3)
        B["grad"].add(-mu * g[..., 0:2])
        # SIPG on vertical facets
        ln = self.mesh.facet_l_normal
        sigma = self.sipg * self.cp / ln
        sigma_max = jnp.maximum(sigma[:, 0], sigma[:, 1]).reshape(-1, 1, 1, 1)
        c0, c1 = c["c_tr"][:, 0], c["c_tr"][:, 1]
        pen = sigma_max * mu * (c0 - c1)
        mi = self.mask_int.reshape(-1, 1, 1, 1)
        B["vfacet"].add(jnp.stack([-pen, pen], axis=1) * mi[:, None])

    def _t_vdiff(self, c, B):
        mu = c["fields"].get("diffusivity_v")
        if mu is None:
            return
        a3 = self.asm3d
        g = a3.cell_grads(c["_dofs"], c["geom"])
        B["gradz"].add(-mu * g[..., 2])
        # interface penalty: sigma ~ factor/(dz)
        Dn = c["geom"]["Delta_nodes"]  # (nc,3,nz)
        asm2 = a3.asm2d
        D_q = jnp.einsum("qd,cdl->clq", asm2.space.phi, Dn)  # (nc,nz,nq)
        dz_if = 0.5 * (
            jnp.concatenate([D_q[:, :1], D_q], axis=1)
            + jnp.concatenate([D_q, D_q[:, -1:]], axis=1)
        )  # (nc, nz+1, nq)
        sigma = self.sipg_v * 4.0 / jnp.maximum(dz_if, 1e-12)
        cb, ca = c["c_below"], c["c_above"]
        pen = sigma * mu * (cb - ca)
        zero = jnp.zeros_like(pen[:, :1])
        pen = jnp.concatenate([zero, pen[:, 1:-1], zero], axis=1)
        B["hfacet_below"].add(-pen)
        B["hfacet_above"].add(pen)

    def _t_source(self, c, B):
        src = c["fields"].get(f"source-{self.label}")
        if src is not None:
            src = jnp.asarray(src)
            if src.ndim == 4:
                # two 4-D layouts exist: the (nc, 3, nz, 2) prognostic-dof
                # layout (the documented API for *_source_3d options) and
                # prepared quad arrays (nc, nz, nq, nqv).  Disambiguate by
                # shape — dof layout first, since it is the public one.
                if src.shape[1] == 3 and src.shape[3] == 2 \
                        and src.shape[2] == self.asm3d.nz:
                    src = self.asm3d.cell_values(src)
                elif src.shape != c["c_q"].shape:
                    raise ValueError(
                        f"4-D tracer source shape {src.shape} matches "
                        f"neither the dof layout (nc,3,nz,2) nor the quad "
                        f"layout {c['c_q'].shape}"
                    )
            B["cell"].add(src if src.ndim >= 3
                          else jnp.broadcast_to(src, c["c_q"].shape))

    # -- assembly --------------------------------------------------------
    def residual(self, label, solution, solution_old, fields, fields_old,
                 bnd_values, geom=None):
        assert geom is not None
        c = self.build_context(solution, fields, geom)
        c["bnd_values"] = bnd_values
        c["_dofs"] = solution[self.label]
        B = {k: Bucket() for k in (
            "cell", "grad", "gradz", "vfacet", "hfacet_below", "hfacet_above"
        )}
        for _, method in self.select_terms(label):
            method(c, B)
        a3 = self.asm3d
        r = jnp.zeros_like(solution[self.label])
        if B["cell"]:
            r += a3.cell_to_dofs(B["cell"].val, geom)
        if B["grad"] or B["gradz"]:
            gh = B["grad"].val if B["grad"] else jnp.zeros(
                c["c_q"].shape + (2,)
            )
            gz = B["gradz"].val if B["gradz"] else jnp.zeros_like(c["c_q"])
            r += a3.grad_to_dofs(
                jnp.concatenate([gh, gz[..., None]], axis=-1), geom
            )
        if B["vfacet"]:
            r += a3.vfacet_to_dofs(B["vfacet"].val, geom)
        if B["hfacet_below"] or B["hfacet_above"]:
            zb = jnp.zeros(c["c_below"].shape)
            r += a3.hfacet_to_dofs(
                B["hfacet_below"].val if B["hfacet_below"] else zb,
                B["hfacet_above"].val if B["hfacet_above"] else zb,
                geom,
            )
        return {self.label: r}

    def mass_term(self, solution, geom):
        return {self.label: self.asm3d.mass_apply(solution[self.label], geom)}

    def mass_inverse(self, r, geom):
        return {self.label: self.asm3d.mass_inverse(r[self.label], geom)}
