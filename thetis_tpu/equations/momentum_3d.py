r"""3D momentum equation for the mode-split deviation velocity.

Re-implementation of ``thetis/momentum_eq.py`` (SURVEY.md section 2.2): the
momentum equation advances the *deviation* velocity u' of the
Higdon-de Szoeke mode splitting (ref docstring L38-58); the depth average
is carried by the 2D system and re-imposed by the coupled integrator
(``_update_2d_coupling``, ref ``coupled_timeintegrator.py:43-58``).

Terms (ref L130-569):
  PressureGradientTerm     — internal pressure gradient as a precomputed
                             field (``BaroclinicHeadCalculator``)
  HorizontalAdvectionTerm  — upwinded inter-column momentum flux
  VerticalAdvectionTerm    — inter-layer flux with w (ALE: w - w_mesh)
  CoriolisTerm
  HorizontalViscosityTerm  — (SIPG penalty part)
  VerticalViscosityTerm    — implicit column solves (handled separately,
                             see ``vertical_viscosity_implicit``)
  SourceTerm               — incl. surface wind stress flux
"""
import jax.numpy as jnp

from .base import Bucket, EquationBase

__all__ = ["MomentumEquation3D", "vertical_viscosity_implicit"]


class MomentumEquation3D(EquationBase):
    def __init__(self, mesh2d, asm3d, options, bnd_conditions=None):
        super().__init__(mesh2d, asm3d.asm2d, bnd_conditions)
        self.asm3d = asm3d
        self.options = options
        self.use_lf = bool(getattr(options, "use_lax_friedrichs_velocity",
                                   True))
        p = 1
        self.cp = (p + 1) * (p + 2) / 2.0
        self.sipg = float(getattr(options, "sipg_factor", 1.0))
        self.add_term("PressureGradientTerm", "implicit", self._t_pg)
        self.add_term("HorizontalAdvectionTerm", "explicit", self._t_hadv)
        self.add_term("VerticalAdvectionTerm", "explicit", self._t_vadv)
        self.add_term("CoriolisTerm", "explicit", self._t_coriolis)
        self.add_term("HorizontalViscosityTerm", "explicit", self._t_hvisc)
        self.add_term("SourceTerm", "source", self._t_source)

    def build_context(self, solution, fields, geom):
        a3 = self.asm3d
        c = {"fields": fields, "geom": geom}
        uv = solution["uv_3d"]
        c["uv_q"] = a3.cell_values(uv)       # (nc,nz,nq,nqv,2)
        c["uv_tr"] = a3.facet_traces(uv)     # (nf,2,nz,nqf,nqv,2)
        c["uv_below"], c["uv_above"] = a3.interface_values(uv)
        c["n"] = self.mesh.facet_normal[:, None, None, None, :]
        w = fields.get("w_3d")
        if w is not None:
            wm = fields.get("w_mesh_3d")
            w_rel = w if wm is None else w - wm
            c["w_rel"] = w_rel
            wb, wa = a3.interface_values(w_rel)
            c["w_if"] = 0.5 * (wb + wa)
        return c

    def _t_pg(self, c, B):
        """Internal pressure gradient (ref L130-160).

        Our ``int_pg_3d`` convention is ``g grad_h(r)`` with
        ``r = -1/rho0 int_z^eta rho' dz`` (BaroclinicHeadCalculator), for
        which the momentum tendency is ``+g grad_h(r)``: with dense water
        on one side, the bottom accelerates toward the light side."""
        int_pg = c["fields"].get("int_pg_3d")
        if int_pg is not None:
            B["cell"].add(self.asm3d.cell_values(int_pg))

    def _t_hadv(self, c, B):
        """Upwinded momentum advection (ref L163-266)."""
        if not getattr(self.options, "use_nonlinear_equations", True):
            return
        n = c["n"]
        uv_q = c["uv_q"]
        # conservative flux: d/dx_j (u_j u_k): tested against grad(test)
        B["grad"].add(uv_q[..., :, None] * uv_q[..., None, :])
        uv0, uv1 = c["uv_tr"][:, 0], c["uv_tr"][:, 1]
        un0 = (uv0 * n).sum(-1)
        un1 = (uv1 * n).sum(-1)
        un_av = 0.5 * (un0 + un1)
        s = 0.5 * (jnp.sign(un_av) + 1.0)
        uv_up = uv0 * s[..., None] + uv1 * (1 - s[..., None])
        flux = uv_up * un_av[..., None]
        mi = self.mask_int.reshape(-1, 1, 1, 1, 1)
        B["vfacet"].add(jnp.stack([-flux, flux], axis=1) * mi[:, None])
        if self.use_lf:
            gamma = 0.5 * jnp.abs(un_av)[..., None]
            jmp = uv1 - uv0
            B["vfacet"].add(
                jnp.stack([gamma * jmp, -gamma * jmp], axis=1) * mi[:, None]
            )
        # land boundary: impermeable lateral walls (deviation velocity):
        # mirror-velocity LF penalty (ref L247-259)
        un_b = un0
        contrib = -2.0 * 0.5 * jnp.abs(un_b)[..., None] * un_b[..., None] * n
        ml = self.mask_land.reshape(-1, 1, 1, 1, 1)
        B["vfacet"].add(
            jnp.stack([contrib, jnp.zeros_like(contrib)], axis=1)
            * ml[:, None]
        )
        # open boundaries (ref momentum_eq.py:213-246): external state from
        # the 3D momentum BC vocabulary {'uv': val, 'un': val, 'symm': _};
        # flux = avg(uv) * avg(un)
        for m in self.open_markers:
            keys = self.bnd_keys.get(m)
            if keys is None:
                continue
            uv_ext = self._bnd_uv_ext(c, m, keys, uv0, n)
            uv_av = 0.5 * (uv0 + uv_ext)
            un_av_b = 0.5 * (un0 + (uv_ext * n).sum(-1))
            contrib = -uv_av * un_av_b[..., None]
            mk = self.marker_masks[m].reshape(-1, 1, 1, 1, 1)
            B["vfacet"].add(
                jnp.stack([contrib, jnp.zeros_like(contrib)], axis=1)
                * mk[:, None]
            )

    def _t_vadv(self, c, B):
        """Vertical momentum advection (ref L269-314)."""
        if "w_if" not in c or not getattr(self.options,
                                          "use_nonlinear_equations", True):
            return
        w = c["w_if"][..., None]  # (nc, nz+1, nq, 1)
        ub, ua = c["uv_below"], c["uv_above"]
        s = 0.5 * (jnp.sign(c["w_if"]) + 1.0)[..., None]
        uv_up = ub * s + ua * (1 - s)
        flux = uv_up * w
        zero = jnp.zeros_like(flux[:, :1])
        flux = jnp.concatenate([zero, flux[:, 1:-1], zero], axis=1)
        B["hfacet_below"].add(-flux)
        B["hfacet_above"].add(flux)
        wq = self.asm3d.cell_values(c["w_rel"])
        B["gradz"].add(c["uv_q"] * wq[..., None])

    def _t_coriolis(self, c, B):
        cor = c["fields"].get("coriolis")
        if cor is None:
            return
        f = jnp.asarray(cor)
        uv = c["uv_q"]  # (nc, nz, nq, nqv, 2)
        bg = c["fields"].get("coriolis_bg_uv_2d")
        if bg is not None:
            # mode-split coupling: rotate only the DEVIATION velocity.
            # The 2D mode carries its own CoriolisTerm, and the depth
            # average of the 3D tendency feeds back into the 2D momentum
            # through ``split_residual`` — rotating the barotropic part
            # here as well double-counts the 2D Coriolis (measured: an
            # undamped geostrophic mean spiralled to rest in the Ekman
            # test).  The reference avoids this by advancing the
            # DEVIATION in its 3D momentum equation
            # (``coupled_timeintegrator.py:55-58`` removes the depth
            # average before the 2D coupling).
            bg_q = self.asm3d.asm2d.cell_values(bg)  # (nc, nq, 2)
            uv = uv - bg_q[:, None, :, None, :]
        if f.ndim == 1 and f.shape[0] == self.mesh.nv:
            # CG1 vertex field: evaluate at the horizontal quad points and
            # broadcast over (nz, nqv)
            f = self.asm3d.asm2d.cell_values(
                f[self.mesh.cells]
            )[:, None, :, None]  # (nc, 1, nq, 1)
        B["cell"].add(
            jnp.stack([f * uv[..., 1], -f * uv[..., 0]], axis=-1)
        )

    def _bnd_uv_ext(self, c, m, keys, uv_b, n):
        """External velocity at an open boundary per the 3D momentum BC
        vocabulary (ref ``momentum_eq.py:213-246``): 'uv' (full vector),
        'un' (normal component) or 'symm' (external = internal)."""
        vals = c["bnd_values"].get(m, {})
        if "uv" in keys:
            v = jnp.asarray(vals["uv"])
            if v.ndim <= 1:
                return jnp.broadcast_to(v, uv_b.shape)
            return self.asm3d.facet_traces(v)[:, 0]
        if "un" in keys:
            v = jnp.asarray(vals["un"])
            if v.ndim == 0:
                un_ext = jnp.broadcast_to(v, uv_b.shape[:-1])
            else:
                un_ext = self.asm3d.facet_traces(v)[:, 0]
            return un_ext[..., None] * n
        return uv_b  # 'symm'

    def _nu_eval(self, c, nu):
        """Viscosity at cell quad points and facet traces; supports scalar
        / 0-d and full 3D dof fields (nc,3,nz,2) — the latter is what the
        Smagorinsky closure produces."""
        nu = jnp.asarray(nu)
        if nu.ndim == 0:
            return nu, nu[None, None]  # broadcastable scalars
        nu_q = self.asm3d.cell_values(nu)        # (nc,nz,nq,nqv)
        nu_tr = self.asm3d.facet_traces(nu)      # (nf,2,nz,nqf,nqv)
        return nu_q, nu_tr

    def _t_hvisc(self, c, B):
        """Horizontal SIPG viscosity — penalty + consistency + symmetry
        terms (ref ``momentum_eq.py:317-389``; same structure as the 2D
        SIPG in ``tracer_2d.py``/``shallowwater_2d.py``)."""
        nu = c["fields"].get("viscosity_h")
        if nu is None:
            return
        a3 = self.asm3d
        nu_q, nu_tr = self._nu_eval(c, nu)
        g = a3.cell_grads(c["_dofs"], c["geom"])  # (...,2comp,3)
        gh = g[..., 0:2]  # horizontal gradient
        if jnp.ndim(nu_q) == 0:
            stress_fac = nu_q
        else:
            stress_fac = nu_q[..., None, None]
        B["grad"].add(-stress_fac * gh)

        ln = self.mesh.facet_l_normal
        sigma = self.sipg * self.cp / ln
        sigma_max = jnp.maximum(sigma[:, 0], sigma[:, 1]).reshape(
            -1, 1, 1, 1, 1
        )
        uv0, uv1 = c["uv_tr"][:, 0], c["uv_tr"][:, 1]
        n = c["n"]
        if jnp.ndim(nu_tr) == 2:  # scalar viscosity
            nu_avg = nu_tr[0, 0]
            nu0 = nu_avg
        else:
            nu_avg = 0.5 * (nu_tr[:, 0] + nu_tr[:, 1])
            nu_avg = nu_avg[..., None]
            nu0 = nu_tr[:, 0][..., None]
        mi = self.mask_int.reshape(-1, 1, 1, 1, 1)
        # penalty: -sigma avg(nu) jump(u) tested with jump(test)
        pen = sigma_max * nu_avg * (uv0 - uv1)
        B["vfacet"].add(jnp.stack([-pen, pen], axis=1) * mi[:, None])
        # consistency: + avg(nu grad_h(u)) . n tested with jump(test)
        gtr = a3.facet_trace_grads_h(c["_dofs"], c["geom"])
        # (nf, 2, nz, nqf, nqv, 2comp, 2dir)
        if jnp.ndim(nu_tr) == 2:
            stress_tr = nu_tr[0, 0] * gtr
        else:
            stress_tr = nu_tr[..., None, None] * gtr
        avg_stress_n = (
            0.5 * (stress_tr[:, 0] + stress_tr[:, 1]) * n[..., None, :]
        ).sum(-1)
        B["vfacet"].add(
            jnp.stack([avg_stress_n, -avg_stress_n], axis=1) * mi[:, None]
        )
        # symmetry: + avg(nu grad_h(test)) . jump(u, n)
        SJ = nu_avg[..., None] * (uv0 - uv1)[..., :, None] * n[..., None, :]
        mi2 = self.mask_int.reshape(-1, 1, 1, 1, 1, 1)
        B["vfacet_grad"].add(
            jnp.stack([0.5 * SJ, 0.5 * SJ], axis=1) * mi2[:, None]
        )
        # Dirichlet boundaries: when external data prescribes uv/un
        stress_b = stress_tr[:, 0]
        sigma_b = sigma[:, 0].reshape(-1, 1, 1, 1, 1)
        for m in self.open_markers:
            keys = self.bnd_keys.get(m)
            if keys is None or not ({"uv", "un"} & keys):
                continue
            uv_ext = self._bnd_uv_ext(c, m, keys, uv0, n)
            if "un" in keys:
                delta_uv = (
                    ((uv0 - uv_ext) * n).sum(-1)[..., None] * n
                )
            else:
                delta_uv = uv0 - uv_ext
            SJb = nu0[..., None] * delta_uv[..., :, None] * n[..., None, :]
            SJbn = (SJb * n[..., None, :]).sum(-1)
            stress_bn = (stress_b * n[..., None, :]).sum(-1)
            mk = self.marker_masks[m].reshape(-1, 1, 1, 1, 1)
            contrib = (-sigma_b * SJbn + stress_bn) * mk
            B["vfacet"].add(
                jnp.stack([contrib, jnp.zeros_like(contrib)], axis=1)
            )
            mk2 = self.marker_masks[m].reshape(-1, 1, 1, 1, 1, 1)
            B["vfacet_grad"].add(
                jnp.stack([SJb * mk2, jnp.zeros_like(SJb)], axis=1)
            )

    def _t_source(self, c, B):
        src = c["fields"].get("momentum_source_3d")
        if src is not None:
            B["cell"].add(self.asm3d.cell_values(src))

    # -- assembly --------------------------------------------------------
    def residual(self, label, solution, solution_old, fields, fields_old,
                 bnd_values, geom=None):
        assert geom is not None
        c = self.build_context(solution, fields, geom)
        c["_dofs"] = solution["uv_3d"]
        c["bnd_values"] = bnd_values or {}
        B = {k: Bucket() for k in (
            "cell", "grad", "gradz", "vfacet", "vfacet_grad",
            "hfacet_below", "hfacet_above"
        )}
        for _, method in self.select_terms(label):
            method(c, B)
        a3 = self.asm3d
        r = jnp.zeros_like(solution["uv_3d"])
        if B["cell"]:
            r += a3.cell_to_dofs(B["cell"].val, geom)
        if B["grad"] or B["gradz"]:
            gh = (B["grad"].val if B["grad"]
                  else jnp.zeros(c["uv_q"].shape + (2,)))
            gz = B["gradz"].val if B["gradz"] else jnp.zeros_like(c["uv_q"])
            r += a3.grad_to_dofs(
                jnp.concatenate([gh, gz[..., None]], axis=-1), geom
            )
        if B["vfacet"]:
            r += a3.vfacet_to_dofs(B["vfacet"].val, geom)
        if B["vfacet_grad"]:
            r += a3.vfacet_grad_to_dofs(B["vfacet_grad"].val, geom)
        if B["hfacet_below"] or B["hfacet_above"]:
            zb = jnp.zeros(c["uv_below"].shape)
            r += a3.hfacet_to_dofs(
                B["hfacet_below"].val if B["hfacet_below"] else zb,
                B["hfacet_above"].val if B["hfacet_above"] else zb,
                geom,
            )
        return {"uv_3d": r}

    def mass_term(self, solution, geom):
        return {"uv_3d": self.asm3d.mass_apply(solution["uv_3d"], geom)}

    def mass_inverse(self, r, geom):
        return {"uv_3d": self.asm3d.mass_inverse(r["uv_3d"], geom)}


def vertical_viscosity_implicit(uv, nu_v, Dn, dt, stress_top=None,
                                bottom_drag=None, uv_bot=None):
    r"""Backward-Euler implicit vertical viscosity column solve for both
    velocity components (ref ``VerticalViscosityTerm`` L392-440 +
    ``CoupledTwoStageRK`` implicit stage L688-699), with optional surface
    stress flux and quadratic bottom friction:

      du/dt = d/dz(nu dv/dz),  nu du/dz|_s = tau/rho0,
      nu du/dz|_b = C_d |u_b| u_b.
    """
    from .turbulence import GenericLengthScaleModel

    solver = GenericLengthScaleModel.__new__(GenericLengthScaleModel)

    # both components ride one batched column solve (leading axis): the
    # fused tridiagonal kernel then launches once instead of twice
    rhs = jnp.moveaxis(uv, -1, 0)                       # (2, nc, nd, nz, 2)
    if stress_top is not None:
        v_top = jnp.maximum(0.5 * Dn[..., -1], 1e-12)
        rhs = rhs.at[..., -1, 1].add(
            dt * jnp.moveaxis(stress_top, -1, 0) / v_top)
    if bottom_drag is not None and uv_bot is not None:
        ub_mag = jnp.sqrt((uv_bot**2).sum(-1) + 1e-14)
        v_bot = jnp.maximum(0.5 * Dn[..., 0], 1e-12)
        rhs = rhs.at[..., 0, 0].add(
            -dt * bottom_drag * ub_mag * jnp.moveaxis(uv_bot, -1, 0) / v_bot
        )
    out = solver._vdiff_implicit(rhs, nu_v, Dn, dt)
    return jnp.moveaxis(out, 0, -1)
