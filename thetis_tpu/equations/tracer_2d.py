r"""2D tracer advection-diffusion equations.

TPU-native re-implementation of the reference term set
(``thetis/tracer_eq_2d.py``, SURVEY.md section 2.2):

  HorizontalAdvectionTerm   (ref L124-193)  explicit — upwind interface flux
  HorizontalDiffusionTerm   (ref L196-278)  explicit — SIPG
  SourceTerm                (ref L281-298)  source
  Conservative* variants    (ref L301-445)

Several tracers form a system solved together (ref ``TracerEquation2D``,
L448-501): the solution is a dict ``{label: (nc, nd)}``.  Boundary
conditions use the tracer vocabulary of ref L78-115: per-marker dicts with
``value`` (external tracer), ``elev/uv/un/flux`` (external flow) and
``diff_flux``.

The optional ``tracer_advective_velocity_factor`` field scales the advective
velocity (sediment corrective velocity, ref L105, L151).
"""
import numpy as np
import jax.numpy as jnp

from .base import Bucket, EquationBase, facet_quad_value, facet_quad_value_2s

__all__ = ["TracerEquation2D", "TracerEquation2DCG"]


class TracerEquation2D(EquationBase):
    def __init__(self, mesh, asm, options, bathymetry, labels,
                 bnd_conditions=None, depth=None):
        """
        :arg labels: list of tracer labels in the system (e.g. ['tracer_2d'])
        :arg bnd_conditions: {marker: {key: value}}; tracer-specific external
            values use key 'value' (scalar per system) or f'value-{label}'.
        """
        super().__init__(mesh, asm, bnd_conditions)
        self.options = options
        self.labels = list(labels)
        if depth is None:
            from .shallowwater_2d import DepthExpression

            depth = DepthExpression(None, use_nonlinear_equations=True)
        self.depth = depth
        self.bathy_tr0 = facet_quad_value(asm, bathymetry)
        self.bathy_q = None  # evaluated on demand for conservative source
        self.bathymetry = bathymetry
        # per-label config
        tr_opts = getattr(options, "tracer", {})
        self.conservative = {
            l: bool(getattr(tr_opts.get(l, None), "use_conservative_form", False))
            if isinstance(tr_opts, dict)
            else False
            for l in self.labels
        }
        self.use_lf = bool(getattr(options, "use_lax_friedrichs_tracer", False))
        self.sipg_factor = float(getattr(options, "sipg_factor_tracer", 1.0))
        p = asm.space.degree
        self.cp = (p + 1) * (p + 2) / 2.0

        self.add_term("HorizontalAdvectionTerm", "explicit", self._t_adv)
        self.add_term("HorizontalDiffusionTerm", "explicit", self._t_diff)
        self.add_term("SourceTerm", "source", self._t_source)

    # -- helpers --------------------------------------------------------
    def _uv_corr(self, fields):
        corr = fields.get("tracer_advective_velocity_factor", 1.0)
        return corr

    def _bnd_flow_ext(self, label, eta_b, uv_b, fields, bnd_values):
        """External (c_ext, uv_ext) per ref ``tracer_eq_2d.py:78-115``."""
        asm = self.asm
        c_ext = None  # filled per-label by caller
        uv_ext = uv_b
        nf_n = self.mesh.facet_normal[:, None, :]
        corr = self._uv_corr(fields)
        if hasattr(corr, "ndim") and corr.ndim >= 1:
            # boundary trace of the factor, broadcastable over components
            corr = facet_quad_value(asm, corr)[..., None]
        for m in self.open_markers:
            keys = self.bnd_keys.get(m)
            if keys is None:
                continue
            vals = bnd_values[m]
            mask1 = self._mask_q(self.marker_masks[m], 1)
            if "elev" in keys:
                e_m = facet_quad_value(asm, vals["elev"])
            else:
                e_m = eta_b
            if "uv" in keys:
                u_m = corr * facet_quad_value(asm, vals["uv"], vector=True)
            elif "flux" in keys:
                h_ext = self.depth.total_depth(self.bathy_tr0, e_m)
                area = h_ext * self.mesh.boundary_len.get(m, 1.0)
                u_m = corr * (facet_quad_value(asm, vals["flux"]) / area)[
                    ..., None
                ] * nf_n
            elif "un" in keys:
                u_m = facet_quad_value(asm, vals["un"])[..., None] * nf_n
            else:
                u_m = uv_b
            uv_ext = jnp.where(mask1, u_m, uv_ext)
        return uv_ext

    def _c_ext(self, label, c_b, bnd_values):
        c_ext = c_b
        for m in self.open_markers:
            keys = self.bnd_keys.get(m)
            if keys is None:
                continue
            vals = bnd_values[m]
            key = f"value-{label}" if f"value-{label}" in keys else (
                "value" if "value" in keys else None
            )
            if key is None:
                continue
            mask = self._mask_q(self.marker_masks[m])
            c_ext = jnp.where(mask, facet_quad_value(self.asm, vals[key]), c_ext)
        return c_ext

    # -- context --------------------------------------------------------
    def build_context(self, solution, solution_old, fields, bnd_values):
        asm = self.asm
        c = {"fields": fields, "bnd_values": bnd_values}
        uv_dofs = fields.get("uv_2d")
        corr = self._uv_corr(fields)
        if uv_dofs is not None:
            # advective-velocity factor multiplies at dof level (a Function
            # product in the reference, ref L154) so cell/facet evaluations
            # stay consistent; accepts scalar or (nc, nd) dof arrays
            if hasattr(corr, "ndim") and corr.ndim == 2:
                uv_dofs = uv_dofs * corr[..., None]
            else:
                uv_dofs = uv_dofs * corr
            c["uv_q"] = asm.cell_values(uv_dofs)
            uv_grad = asm.cell_grads(uv_dofs)
            c["div_uv_q"] = uv_grad[..., 0, 0] + uv_grad[..., 1, 1]
            c["uv_tr"] = asm.facet_traces(uv_dofs)
        elev = fields.get("elev_2d")
        c["eta_tr0"] = (
            facet_quad_value(asm, elev)
            if elev is not None
            else jnp.zeros_like(self.bathy_tr0[:, 0])
        )
        c["n"] = self.mesh.facet_normal[:, None, :]
        if uv_dofs is not None:
            c["uv_ext"] = self._bnd_flow_ext(
                None, c["eta_tr0"], c["uv_tr"][:, 0], fields, bnd_values
            )
        # per-label tracer values
        c["c_q"] = {l: asm.cell_values(solution[l]) for l in self.labels}
        c["c_tr"] = {l: asm.facet_traces(solution[l]) for l in self.labels}
        return c

    # =========================== terms =================================
    def _t_adv(self, c, B):
        if "uv_q" not in c:
            return
        n = c["n"]
        un0 = (c["uv_tr"][:, 0] * n).sum(-1)
        un1 = (c["uv_tr"][:, 1] * n).sum(-1)
        un_av = 0.5 * (un0 + un1)
        s = 0.5 * (jnp.sign(un_av) + 1.0)
        mi = self._mask_q(self.mask_int)
        lf = c["fields"].get("lax_friedrichs_tracer_scaling_factor", 1.0)
        uv_ext = c.get("uv_ext")
        for l in self.labels:
            cq = c["c_q"][l]
            c0, c1 = c["c_tr"][l][:, 0], c["c_tr"][l][:, 1]
            cons = self.conservative[l]
            if cons:
                # conservative: flux_up = (c uv) upwinded (ref L354-395)
                B[l + "_grad"].add(cq[..., None] * c["uv_q"])
                flux_up_n = (c0 * un0) * s + (c1 * un1) * (1 - s)
                B[l + "_facet"].add(
                    jnp.stack([-flux_up_n, flux_up_n], axis=1) * mi[:, None]
                )
            else:
                # nonconservative (ref L147-193)
                B[l + "_cell"].add(cq * c["div_uv_q"])
                B[l + "_grad"].add(cq[..., None] * c["uv_q"])
                c_up = c0 * s + c1 * (1 - s)
                B[l + "_facet"].add(
                    jnp.stack([-c_up * un0, c_up * un1], axis=1) * mi[:, None]
                )
            if self.use_lf:
                gamma = 0.5 * jnp.abs(un_av) * lf
                jmp = c1 - c0
                B[l + "_facet"].add(
                    jnp.stack([gamma * jmp, -gamma * jmp], axis=1) * mi[:, None]
                )
            # boundary
            c_b = c["c_tr"][l][:, 0]
            uv_b = c["uv_tr"][:, 0]
            un_b = (uv_b * n).sum(-1)
            c_ext = self._c_ext(l, c_b, c["bnd_values"])
            uv_av_b = 0.5 * (uv_b + uv_ext)
            un_av_b = (uv_av_b * n).sum(-1)
            s_b = 0.5 * (jnp.sign(un_av_b) + 1.0)
            if cons:
                fl_open = (c_b * un_b) * s_b + (
                    c_ext * (uv_ext * n).sum(-1)
                ) * (1 - s_b)
            else:
                c_up_b = c_b * s_b + c_ext * (1 - s_b)
                fl_open = c_up_b * un_av_b
            fl_closed = c_b * un_b  # outflow of internal value (ref L189-191)
            contrib = -jnp.where(
                self._mask_q(self.mask_open), fl_open, fl_closed
            ) * self._mask_q(self.mask_bnd)
            B[l + "_facet"].add(jnp.stack([contrib, jnp.zeros_like(contrib)], axis=1))

    def _t_diff(self, c, B):
        asm = self.asm
        n = c["n"]
        mi = self._mask_q(self.mask_int)
        mi2 = self._mask_q(self.mask_int, 1)
        ln = self.mesh.facet_l_normal
        sigma = self.sipg_factor * self.cp / ln
        sigma_max = jnp.maximum(sigma[:, 0], sigma[:, 1])[:, None]
        for l in self.labels:
            mu_f = c["fields"].get(f"diffusivity_h-{l}")
            if mu_f is None:
                continue
            mu_q = self._coeff_q(mu_f)
            mu_tr = facet_quad_value_2s(asm, mu_f)
            grad_c = asm.cell_grads(c["_dofs"][l])
            B[l + "_grad"].add(-mu_q[..., None] * grad_c)
            c0, c1 = c["c_tr"][l][:, 0], c["c_tr"][l][:, 1]
            mu_avg = 0.5 * (mu_tr[:, 0] + mu_tr[:, 1])
            djump = c0 - c1
            # penalty (ref L251-253)
            pen = sigma_max * mu_avg * djump
            B[l + "_facet"].add(jnp.stack([-pen, pen], axis=1) * mi[:, None])
            # -avg(mu grad(test)) . jump(c, n)  (ref L254-255)
            fg = jnp.stack(
                [0.5 * mu_tr[:, 0, :, None] * djump[..., None] * n,
                 0.5 * mu_tr[:, 1, :, None] * djump[..., None] * n],
                axis=1,
            )
            B[l + "_fgrad"].add(fg * mi2[:, None])
            # -jump(test, n) . avg(mu grad(c))  (ref L256-257)
            gtr = asm.facet_trace_grads(c["_dofs"][l])
            flux_avg_n = (
                0.5
                * (mu_tr[:, 0, :, None] * gtr[:, 0] + mu_tr[:, 1, :, None] * gtr[:, 1])
                * n
            ).sum(-1)
            B[l + "_facet"].add(
                jnp.stack([flux_avg_n, -flux_avg_n], axis=1) * mi[:, None]
            )
            # boundary (ref L259-277)
            for m in sorted(self.bnd_keys):
                keys = self.bnd_keys[m]
                mask = self._mask_q(self.marker_masks[m])
                if "diff_flux" in keys:
                    df = facet_quad_value(asm, c["bnd_values"][m]["diff_flux"])
                    contrib = df * mask
                elif m in self.open_markers:
                    # consistency flux with upwinded c (grad of external
                    # data taken as 0)
                    c_b = c["c_tr"][l][:, 0]
                    uv_b = c.get("uv_tr")
                    if uv_b is None:
                        continue
                    uv_ext = c["uv_ext"]
                    un_av_b = (0.5 * (uv_b[:, 0] + uv_ext) * n).sum(-1)
                    s_b = 0.5 * (jnp.sign(un_av_b) + 1.0)
                    flux_n = (mu_tr[:, 0, :, None] * gtr[:, 0] * n).sum(-1)
                    contrib = s_b * flux_n * mask
                else:
                    continue
                B[l + "_facet"].add(
                    jnp.stack([contrib, jnp.zeros_like(contrib)], axis=1)
                )

    def _t_source(self, c, B):
        for l in self.labels:
            src = c["fields"].get(f"source-{l}")
            if src is None:
                continue
            src_q = self._coeff_q(src)
            if self.conservative[l]:
                if self.bathy_q is None:
                    from .shallowwater_2d import ShallowWaterEquations  # noqa

                    self.bathy_q = self._coeff_q(self.bathymetry)
                elev = c["fields"].get("elev_2d")
                eta_q = self._coeff_q(elev) if elev is not None else 0.0
                H_q = self.depth.total_depth(self.bathy_q, eta_q)
                B[l + "_cell"].add(H_q * src_q)
            else:
                B[l + "_cell"].add(src_q)

    def _coeff_q(self, val):
        asm, mesh = self.asm, self.mesh
        nq = len(asm.space._tab_np["qw"])
        if np.isscalar(val) or (hasattr(val, "ndim") and val.ndim == 0):
            return jnp.broadcast_to(jnp.asarray(val), (mesh.nc, nq))
        val = jnp.asarray(val)
        if val.shape[:1] == (mesh.nv,):
            return asm.cg1_values(val[mesh.cells])
        if val.shape[:2] == (mesh.nc, asm.ndofs):
            return asm.cell_values(val)
        if val.shape[:2] == (mesh.nc, 1):
            return jnp.broadcast_to(val[:, :1], (mesh.nc, nq))
        raise ValueError(f"bad coefficient shape {val.shape}")

    # =========================== assembly ==============================
    def residual(self, label, solution, solution_old, fields, fields_old,
                 bnd_values):
        """Tracer terms use lagged fields (``fields_old`` in the reference's
        calls); we follow the stepper's choice by receiving them as
        ``fields``."""
        c = self.build_context(solution, solution_old, fields, bnd_values)
        c["_dofs"] = solution
        B = {}
        for l in self.labels:
            for kind in ("_cell", "_grad", "_facet", "_fgrad"):
                B[l + kind] = Bucket()
        for _, method in self.select_terms(label):
            method(c, B)
        asm = self.asm
        out = {}
        for l in self.labels:
            r = jnp.zeros_like(solution[l])
            if B[l + "_cell"]:
                r += asm.cell_to_dofs(B[l + "_cell"].val)
            if B[l + "_grad"]:
                r += asm.grad_to_dofs(B[l + "_grad"].val)
            if B[l + "_facet"] and B[l + "_fgrad"]:
                r += asm.facet_fgrad_to_dofs(B[l + "_facet"].val,
                                             B[l + "_fgrad"].val)
            elif B[l + "_facet"]:
                r += asm.facet_to_dofs(B[l + "_facet"].val)
            elif B[l + "_fgrad"]:
                r += asm.fgrad_to_dofs(B[l + "_fgrad"].val)
            out[l] = r
        return out

    def mass_term(self, solution):
        return {l: self.asm.mass_apply(solution[l]) for l in self.labels}

    def mass_inverse(self, r):
        return {l: self.asm.mass_inverse(r[l]) for l in self.labels}


class TracerEquation2DCG(TracerEquation2D):
    """CG tracer family with optional SUPG stabilization (ref
    ``tracer_eq_2d.py:448-501``, ``options.py`` ``tracer_element_family=
    'cg'`` + ``use_supg_tracer``).

    CG1 shares the P1 local basis with P1DG, so every term is inherited
    unchanged: the solution is converted to cell-node layout, the DG
    projection produces per-cell test contributions, and a scatter-add
    over the cell->vertex map assembles the continuous residual (interior
    facet fluxes are antisymmetric per side and cancel in the scatter;
    SIPG jump penalties vanish identically since CG traces agree).

    SUPG modifies the test function t -> t + tau u.grad(t) with
    tau = 0.5 h / U capped by Pe/3 (ref ``tracer_eq_2d.py:490-501``);
    for P1 the second-derivative terms vanish, so the stabilization acts
    on the cell (strong-form) accumulator only.  The mass matrix keeps
    the unmodified test (lumped-SUPG simplification)."""

    def __init__(self, mesh, asm, options, bathymetry, labels,
                 bnd_conditions=None, depth=None):
        super().__init__(mesh, asm, options, bathymetry, labels,
                         bnd_conditions=bnd_conditions, depth=depth)
        self.nv = mesh.nv
        self.cells = mesh.cells
        self.use_supg = bool(getattr(options, "use_supg_tracer", False))
        # cell-constant physical P1 test gradients (nc, 3, 2)
        dphi = np.asarray(asm.space._tab_np["dphi"])[0]
        self.gp1 = jnp.asarray(
            np.einsum("dj,cji->cdi", dphi, np.asarray(mesh.Jinv)))
        # SUPG tau per cell (ref L490-501): 0.5 h / U, capped by Pe/3
        U = float(getattr(options, "horizontal_velocity_scale", 0.1) or 0.1)
        D = float(getattr(options, "horizontal_diffusivity_scale", 0.0) or 0.0)
        h = np.asarray(mesh.cell_hmin_np)
        tau = 0.5 * h / max(U, 1e-12)
        if D > 0:
            pe = 0.5 * U * h / D
            tau = np.minimum(tau, pe / 3.0)
        self._tau = jnp.asarray(tau)
        # lumped CG1 mass
        ml_cell = np.einsum("q,qd->d", np.asarray(asm.space._tab_np["qw"]),
                            np.asarray(asm.space._tab_np["phi"]))
        lumped = np.zeros(mesh.nv)
        np.add.at(lumped, np.asarray(mesh.cells_np).ravel(),
                  (ml_cell[None, :] * np.asarray(mesh.detJ_np)[:, None]
                   ).ravel())
        self._lumped = jnp.asarray(lumped)

    # -- CG assembly helpers --------------------------------------------
    def _to_cells(self, sol):
        return {l: sol[l][self.cells] for l in self.labels}

    def _scatter(self, local):
        return jnp.zeros(self.nv, dtype=local.dtype).at[self.cells].add(local)

    def residual(self, label, solution, solution_old, fields, fields_old,
                 bnd_values):
        sol_c = self._to_cells(solution)
        sol_old_c = self._to_cells(solution_old)
        c = self.build_context(sol_c, sol_old_c, fields, bnd_values)
        c["_dofs"] = sol_c
        B = {}
        for l in self.labels:
            for kind in ("_cell", "_grad", "_facet", "_fgrad"):
                B[l + kind] = Bucket()
        for _, method in self.select_terms(label):
            method(c, B)
        asm = self.asm
        out = {}
        for l in self.labels:
            r = jnp.zeros((self.mesh.nc, asm.ndofs))
            if B[l + "_cell"]:
                r += asm.cell_to_dofs(B[l + "_cell"].val)
            if self.use_supg and "uv_q" in c:
                # streamline stabilization: test the strong-form advective
                # residual -u.grad(c) against tau u.grad(t) (for P1 the
                # diffusive second derivatives vanish; the dc/dt part is
                # omitted -- lumped-SUPG simplification)
                uq = c["uv_q"]                             # (nc, nq, 2)
                gradc = asm.cell_grads(sol_c[l])           # (nc, nq, 2)
                strong = -(uq * gradc).sum(-1)             # (nc, nq)
                ug = jnp.einsum("cqi,cdi->cqd", uq, self.gp1)
                r += self._tau[:, None] * jnp.einsum(
                    "cq,cq,cqd->cd", strong, asm.wdetJ, ug)
            if B[l + "_grad"]:
                r += asm.grad_to_dofs(B[l + "_grad"].val)
            if B[l + "_facet"] and B[l + "_fgrad"]:
                r += asm.facet_fgrad_to_dofs(B[l + "_facet"].val,
                                             B[l + "_fgrad"].val)
            elif B[l + "_facet"]:
                r += asm.facet_to_dofs(B[l + "_facet"].val)
            elif B[l + "_fgrad"]:
                r += asm.fgrad_to_dofs(B[l + "_fgrad"].val)
            out[l] = self._scatter(r)
        return out

    def _cg_mass_apply(self, v):
        return self._scatter(self.asm.mass_apply(v[self.cells]))

    def _cg_mass_pcg(self, r, iters=25):
        from jax import lax
        Ml = self._lumped

        def body(carry, _):
            x, p, res, rz = carry
            Ap = self._cg_mass_apply(p)
            alpha = rz / jnp.maximum((p * Ap).sum(), 1e-300)
            x = x + alpha * p
            res = res - alpha * Ap
            z = res / Ml
            rz_new = (res * z).sum()
            p = z + (rz_new / jnp.maximum(rz, 1e-300)) * p
            return (x, p, res, rz_new), None

        x0 = r / Ml
        res0 = r - self._cg_mass_apply(x0)
        z0 = res0 / Ml
        (x, _, _, _), _ = lax.scan(
            body, (x0, z0, res0, (res0 * z0).sum()), None, length=iters)
        return x

    def mass_term(self, solution):
        return {l: self._cg_mass_apply(solution[l]) for l in self.labels}

    def mass_inverse(self, r):
        from jax import lax
        return {
            l: lax.custom_linear_solve(
                self._cg_mass_apply, r[l],
                solve=lambda mv, b: self._cg_mass_pcg(b), symmetric=True)
            for l in self.labels
        }
