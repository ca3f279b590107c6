r"""rt-dg element family for the 2D shallow-water equations.

The reference's ``element_family = 'rt-dg'`` (``solver2d.py:307-336``):
velocity in a Raviart-Thomas H(div) space, elevation in DG.  This
implementation provides the lowest-order mimetic member **RT1 x P0**
(``polynomial_degree = 0``): facet normal velocities + cell-mean
elevations — the finite-element form of the staggered C-grid, exactly
mass conservative with single-valued facet fluxes.

Weak forms follow the reference terms specialised to this pair:

* ExternalPressureGradientTerm (ref ``shallowwater_eq.py:335-381``):
  by parts, ``+g eta div(psi)`` in cells; interior facet terms vanish
  because the RT test has a continuous normal component
  (``jump(psi.n) = 0``); boundaries get the linear-Riemann elevation.
* HUDivTerm (ref L396-450): pure facet flux ``F = H*(u.n)*`` with the
  Riemann elevation correction — exactly conservative.
* Coriolis / drag / sources: cell integrals against psi.
* HorizontalAdvectionTerm (ref L453-510): conservative cell term
  against grad(psi) plus upwinded facet fluxes.

Solution pytree: ``{'uv': (nf,), 'elev': (nc, 1)}``.
"""
import numpy as np
import jax.numpy as jnp

from ..config import physical_constants
from .base import EquationBase

__all__ = ["ShallowWaterEquationsRTDG"]


class ShallowWaterEquationsRTDG(EquationBase):
    def __init__(self, mesh, asm, rt_space, options, bathymetry,
                 bnd_conditions=None):
        assert not getattr(options, "use_wetting_and_drying", False), (
            "wetting-and-drying requires the dg-dg element family"
        )
        super().__init__(mesh, asm, bnd_conditions)
        self.rt = rt_space
        self.options = options
        self.g = float(physical_constants["g_grav"])

        # per-cell and per-facet bathymetry (P0-style means)
        self.bathy_c = self._cell_mean(bathymetry)          # (nc,)
        fc = np.asarray(mesh.facet_cells_np)
        bc = np.asarray(self.bathy_c)
        self.bathy_f = jnp.asarray(0.5 * (bc[fc[:, 0]] + bc[fc[:, 1]]))
        self.area = mesh.cell_area                           # (nc,)
        self.flen = mesh.facet_len                           # (nf,)
        self.fcells = mesh.facet_cells                       # (nf, 2)
        # facet -> owner-cell sign/ids for continuity assembly
        self.sigma = self.rt.sigma_np                        # np (nc, 3)
        import jax.numpy as _jnp
        self.cell_facets = _jnp.asarray(
            self.rt.cell_facets_np, dtype=_jnp.int32)

        self.add_term("ExternalPressureGradientTerm", "implicit",
                      self._t_epg)
        self.add_term("HUDivTerm", "implicit", self._t_hudiv)
        self.add_term("HorizontalAdvectionTerm", "implicit", self._t_hadv)
        self.add_term("CoriolisTerm", "implicit", self._t_coriolis)
        self.add_term("QuadraticDragTerm", "implicit", self._t_qdrag)
        self.add_term("LinearDragTerm", "implicit", self._t_ldrag)
        self.add_term("MomentumSourceTerm", "source", self._t_mom_source)
        self.add_term("ContinuitySourceTerm", "source", self._t_cont_source)

    # ------------------------------------------------------------------
    def _cell_mean(self, val):
        mesh = self.mesh
        if np.isscalar(val) or getattr(val, "ndim", 1) == 0:
            return jnp.full((mesh.nc,), float(val))
        val = jnp.asarray(val)
        if val.shape[:1] == (mesh.nv,):
            return val[mesh.cells].mean(axis=1)
        if val.ndim >= 2 and val.shape[0] == mesh.nc:
            return val.reshape(mesh.nc, -1).mean(axis=1)
        if val.shape == (mesh.nc,):
            return val
        raise ValueError(f"cannot reduce coefficient of shape {val.shape}")

    def _facet_scalar(self, val):
        """BC/coefficient value -> per-facet scalar (nf,)."""
        mesh = self.mesh
        if np.isscalar(val) or getattr(val, "ndim", 1) == 0:
            return jnp.full((mesh.nf,), float(val))
        val = jnp.asarray(val)
        if val.shape[:1] == (mesh.nv,):
            fv = mesh.facet_verts
            return 0.5 * (val[fv[:, 0]] + val[fv[:, 1]])
        if val.shape == (mesh.nf,):
            return val
        if val.shape[0] == mesh.nc:  # cell data: mean of both sides
            cm = val.reshape(mesh.nc, -1).mean(axis=1)
            return 0.5 * (cm[self.fcells[:, 0]] + cm[self.fcells[:, 1]])
        raise ValueError(f"cannot map BC value of shape {val.shape}")

    def _bnd_ext(self, eta_f, un_f, bnd_values):
        """Per-facet external (eta_ext, un_ext) from the weak BC
        vocabulary (ref ``shallowwater_eq.py:232-272``); meaningful on
        open-boundary facets only."""
        eta_ext = eta_f
        un_ext = un_f
        for m in self.open_markers:
            keys = self.bnd_keys.get(m)
            if keys is None:
                continue
            vals = bnd_values[m]
            mask = self.marker_masks[m]
            e_m = (self._facet_scalar(vals["elev"])
                   if "elev" in keys else eta_f)
            if "un" in keys:
                u_m = self._facet_scalar(vals["un"])
            elif "flux" in keys:
                H = jnp.maximum(self.bathy_f + e_m, 0.05)
                area = H * self.mesh.boundary_len.get(m, 1.0)
                u_m = self._facet_scalar(vals["flux"]) / area
            elif "uv" in keys:
                v = jnp.asarray(vals["uv"])
                u_m = (v[None, :] * self.mesh.facet_normal).sum(-1) \
                    if v.ndim == 1 else un_f
            else:
                u_m = un_f
            eta_ext = jnp.where(mask, e_m, eta_ext)
            un_ext = jnp.where(mask, u_m, un_ext)
        return eta_ext, un_ext

    # ------------------------------------------------------------------
    def build_context(self, solution, solution_old, fields, bnd_values):
        rt = self.rt
        U, eta = solution["uv"], solution["elev"][:, 0]
        U_old, eta_old = solution_old["uv"], solution_old["elev"][:, 0]
        c = {"fields": fields}
        c["U"], c["eta"] = U, eta
        c["uv_q"] = rt.cell_values(U)                 # (nc, nq, 2)
        fc = self.fcells
        c["eta0"], c["eta1"] = eta[fc[:, 0]], eta[fc[:, 1]]
        H_c = self.bathy_c + (eta_old if getattr(
            self.options, "use_nonlinear_equations", True) else 0.0)
        c["H_c"] = jnp.maximum(H_c, 0.05)
        c["H_f"] = jnp.maximum(
            0.5 * (c["H_c"][fc[:, 0]] + c["H_c"][fc[:, 1]]), 0.05
        )
        c["un_mean"] = rt.facet_un_mean(U)
        c["eta_ext"], c["un_ext"] = self._bnd_ext(
            c["eta0"], c["un_mean"], bnd_values)
        return c

    # ============================ terms ================================
    def _t_epg(self, c, B):
        g = self.g
        rt = self.rt
        nq = rt.wdetJ.shape[1]
        eta_q = jnp.broadcast_to(c["eta"][:, None], (self.mesh.nc, nq))
        B["uv"] = B.get("uv", 0.0) + rt.div_to_dofs(g * eta_q)
        # boundary: -g eta_rie tested against the own-facet normal trace
        # (interior terms cancel by H(div) conformity)
        srt = jnp.sqrt(c["H_f"] / g)
        eta_b = c["eta0"]
        un = c["un_mean"]
        eta_rie_open = (0.5 * (eta_b + c["eta_ext"])
                        + srt * (un - c["un_ext"]))
        eta_rie_land = eta_b + srt * un
        eta_rie = jnp.where(self.mask_open, eta_rie_open, eta_rie_land)
        nqf = rt.wlen.shape[1]
        Fq = jnp.where(self.mask_bnd, g * eta_rie, 0.0)[:, None]
        B["uv"] = B["uv"] - rt.bnd_normal_to_dofs(
            jnp.broadcast_to(Fq, (self.mesh.nf, nqf)))

    def _t_hudiv(self, c, B):
        g = self.g
        un = c["un_mean"]
        srt_int = jnp.sqrt(g / c["H_f"])
        # interior Riemann flux: F = H (u.n + 0.5 sqrt(g/H) jump(eta))
        F_int = c["H_f"] * (un + 0.5 * srt_int * (c["eta0"] - c["eta1"]))
        # boundary: land -> 0; open -> linear Riemann with external state
        un_rie = (0.5 * (un + c["un_ext"])
                  + 0.5 * srt_int * (c["eta0"] - c["eta_ext"]))
        F_bnd = jnp.where(self.mask_open, c["H_f"] * un_rie, 0.0)
        F = jnp.where(self.mask_bnd, F_bnd, F_int) * self.flen
        # continuity rows: d(eta)/dt A_c = -sum_f sigma_cf F_f
        loc = -F[self.cell_facets] * jnp.asarray(self.sigma)
        B["eta"] = B.get("eta", 0.0) + loc.sum(axis=1)

    def _t_hadv(self, c, B):
        if not getattr(self.options, "use_nonlinear_equations", True):
            return
        rt = self.rt
        uv_q = c["uv_q"]
        # cell: +(u x u) : grad(psi)
        G = uv_q[..., :, None] * uv_q[..., None, :]
        B["uv"] = B.get("uv", 0.0) + rt.grad_to_dofs(G)
        # facet: upwinded -(u_up un) . psi from each side
        tr = rt.facet_traces(c["U"])                 # (nf, 2, nqf, gdim)
        un = rt.facet_un_quad(c["U"])                # (nf, nqf) along n_f
        s = 0.5 * (jnp.sign(un) + 1.0)               # 1 if flow 0 -> 1
        u_up = (tr[:, 0] * s[..., None]
                + tr[:, 1] * (1.0 - s)[..., None])   # (nf, nqf, gdim)
        flux = u_up * un[..., None]
        mi = self.mask_int.reshape(-1, 1, 1)
        Ff = jnp.stack([-flux, flux], axis=1) * mi[:, None]
        # boundary closure of the by-parts form (ref L213-246): momentum
        # carried through open boundaries with the side-0 trace (land has
        # un = 0 weakly through the normal dof itself); omitting this
        # leaves a spurious boundary force that destabilises through-flow
        flux_b = tr[:, 0] * un[..., None]
        mb = self.mask_bnd.reshape(-1, 1, 1)
        Ff = Ff + jnp.stack(
            [-flux_b, jnp.zeros_like(flux_b)], axis=1) * mb[:, None]
        B["uv"] = B["uv"] + rt.facet_to_dofs(Ff)

    def _t_coriolis(self, c, B):
        f = c["fields"].get("coriolis")
        if f is None:
            return
        f_q = jnp.asarray(self._cell_mean(f))[:, None]
        u = c["uv_q"]
        if hasattr(self.mesh, "cell_normal"):
            # manifold mesh: -f (n_cell x u), the reference's CellNormal
            # Coriolis (ref shallowwater_eq.py:627-630)
            n = self.mesh.cell_normal[:, None, :]       # (nc, 1, 3)
            Fq = -f_q[..., None] * jnp.cross(n, u)
        else:
            Fq = jnp.stack([f_q * u[..., 1], -f_q * u[..., 0]], axis=-1)
        B["uv"] = B.get("uv", 0.0) + self.rt.cell_to_dofs(Fq)

    def _t_qdrag(self, c, B):
        fields = c["fields"]
        Cd = fields.get("quadratic_drag_coefficient")
        mu = fields.get("manning_drag_coefficient")
        if Cd is None and mu is None:
            return
        H_q = jnp.maximum(c["H_c"], 0.05)[:, None]
        if mu is not None:
            mu_c = jnp.asarray(self._cell_mean(mu))[:, None]
            Cd_q = self.g * mu_c**2 / H_q ** (1.0 / 3.0)
        else:
            Cd_q = jnp.asarray(self._cell_mean(Cd))[:, None]
        u = c["uv_q"]
        umag = jnp.sqrt((u**2).sum(-1) + 1e-12)
        Fq = -Cd_q[..., None] * umag[..., None] * u / H_q[..., None]
        B["uv"] = B.get("uv", 0.0) + self.rt.cell_to_dofs(Fq)

    def _t_ldrag(self, c, B):
        C = c["fields"].get("linear_drag_coefficient")
        if C is None:
            return
        C_q = jnp.asarray(self._cell_mean(C))[:, None, None]
        B["uv"] = B.get("uv", 0.0) + self.rt.cell_to_dofs(-C_q * c["uv_q"])

    def _t_mom_source(self, c, B):
        src = c["fields"].get("momentum_source")
        if src is None:
            return
        v = jnp.asarray(src)
        nq = self.rt.wdetJ.shape[1]
        if v.ndim == 1:  # constant vector
            Fq = jnp.broadcast_to(v, (self.mesh.nc, nq, 2))
        else:  # per-node/cell vector field: cell means per component
            comp = [self._cell_mean(v[..., k]) for k in range(2)]
            Fq = jnp.broadcast_to(
                jnp.stack(comp, axis=-1)[:, None, :],
                (self.mesh.nc, nq, 2),
            )
        B["uv"] = B.get("uv", 0.0) + self.rt.cell_to_dofs(Fq)

    def _t_cont_source(self, c, B):
        src = c["fields"].get("volume_source")
        if src is None:
            return
        B["eta"] = B.get("eta", 0.0) + self._cell_mean(src) * self.area

    # =========================== assembly ==============================
    def residual(self, label, solution, solution_old, fields, fields_old,
                 bnd_values):
        c = self.build_context(solution, solution_old, fields, bnd_values)
        B = {}
        for _, method in self.select_terms(label):
            method(c, B)
        r_uv = B.get("uv")
        r_eta = B.get("eta")
        if r_uv is None:
            r_uv = jnp.zeros_like(solution["uv"])
        if r_eta is None:
            r_eta = jnp.zeros_like(solution["elev"][:, 0])
        return {"uv": r_uv, "elev": r_eta[:, None]}

    def mass_term(self, solution):
        return {"uv": self.rt.mass_apply(solution["uv"]),
                "elev": self.area[:, None] * solution["elev"]}

    def mass_inverse(self, r):
        return {"uv": self.rt.mass_inverse(r["uv"]),
                "elev": r["elev"] / self.area[:, None]}

    def norm_elev(self, eta):
        return jnp.sqrt((self.area * (eta[:, 0] ** 2)).sum())

    def norm_uv(self, U):
        return jnp.sqrt(jnp.maximum(
            (U * self.rt.mass_apply(U)).sum(), 0.0))