r"""Generic Length Scale (GLS) turbulence closure.

Re-implementation of ``thetis/turbulence.py`` (SURVEY.md section 2.5): the
two-equation k-psi closure with

  psi = (cmu0)^p k^m l^n        (Umlauf & Burchard 2003)

covering k-epsilon (p=3, m=1.5, n=-1), k-omega (p=-1, m=0.5, n=-1) and the
generic model through the (p, m, n) exponents, with stability functions
(``stability_functions``), Galperin limiters, Patankar-type
positivity-preserving source treatment (ref L599-758) and implicit
vertical-diffusion column solves.

The model state lives on the dense 3D column arrays (nc, 3, nz, 2); the
pre/postprocess steps — numpy loops over ``dat.data`` in the reference
(ref L486-577) — are pure jnp here and jit/fuse into the coupled update.

``PacanowskiPhilanderModel`` (ref L853-961) is the algebraic
Richardson-number alternative.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .stability_functions import STABILITY_FUNCTIONS
from ..utils.log import print_output

__all__ = ["GLSModelOptions", "GenericLengthScaleModel",
           "PacanowskiPhilanderModel"]


class GLSModelOptions:
    """Defaults mirror ``options.py:280-440`` GLSModelOptions."""

    def __init__(self, closure_name="k-epsilon",
                 stability_function_name="Canuto A", **kw):
        self.closure_name = closure_name
        self.stability_function_name = stability_function_name
        self.p, self.m, self.n = 3.0, 1.5, -1.0
        self.schmidt_nb_tke = 1.0
        self.schmidt_nb_psi = 1.3
        self.cmu0 = 0.5477
        self.compute_cmu0 = True
        self.c1 = 1.44
        self.c2 = 1.92
        self.c3_minus = -0.52
        self.c3_plus = 1.0
        self.compute_c3_minus = True
        self.f_wall = 1.0
        self.ri_st = 0.25
        self.kappa = 0.4
        self.compute_kappa = False
        self.compute_schmidt_nb_psi = True
        self.k_min = 1.0e-6
        self.psi_min = 1.0e-14
        self.eps_min = 1.0e-14
        self.len_min = 1.0e-12
        self.visc_min = 1.0e-8
        self.diff_min = 1.0e-8
        self.galperin_clim = 0.30
        self.compute_galperin_clim = True
        self.limit_len = False
        self.limit_psi = True
        if closure_name == "k-omega":
            self.p, self.m, self.n = -1.0, 0.5, -1.0
            self.c1, self.c2 = 0.555, 0.833
        elif closure_name == "Generic Length Scale":
            self.p, self.m, self.n = 2.0, 1.0, -0.67
            self.c1, self.c2 = 1.0, 1.22
            self.schmidt_nb_tke, self.schmidt_nb_psi = 0.8, 1.07
        for k_, v in kw.items():
            setattr(self, k_, v)


class GenericLengthScaleModel:
    """ref ``turbulence.py:351-596``."""

    def __init__(self, asm3d, options=None):
        self.asm3d = asm3d
        o = options or GLSModelOptions()
        self.options = o
        sf_cls = STABILITY_FUNCTIONS[o.stability_function_name]
        self.stability_functions = sf = sf_cls()
        if o.compute_cmu0:
            o.cmu0 = float(sf.compute_cmu0())
        if o.compute_c3_minus:
            o.c3_minus = float(sf.compute_c3_minus(o.c1, o.c2, o.ri_st))
        if o.compute_kappa:
            o.kappa = float(sf.compute_kappa(o.schmidt_nb_psi, o.cmu0, o.n,
                                             o.c1, o.c2))
        elif o.compute_schmidt_nb_psi:
            o.schmidt_nb_psi = float(
                sf.compute_sigma_psi(o.kappa, o.cmu0, o.n, o.c1, o.c2)
            )
        if o.compute_galperin_clim:
            o.galperin_clim = float(sf.compute_length_clim(o.cmu0, o.ri_st))
        print_output(
            f"GLS closure: {o.closure_name} / {sf.name}: "
            f"cmu0={o.cmu0:.4f} c3_minus={o.c3_minus:.4f} "
            f"sigma_psi={o.schmidt_nb_psi:.4f} clim={o.galperin_clim:.4f}"
        )

    # -- diagnostics (ref L509-577 postprocess) -------------------------
    def psi_from_k_eps(self, k, eps):
        o = self.options
        l = self.length_from_k_eps(k, eps)
        return o.cmu0**o.p * k**o.m * l**o.n

    def length_from_k_eps(self, k, eps):
        o = self.options
        return jnp.maximum(
            o.cmu0**3 * k**1.5 / jnp.maximum(eps, o.eps_min), o.len_min
        )

    def eps_from_k_psi(self, k, psi, buoy2=None):
        """epsilon and limited length scale from the prognostic pair
        (ref L522-548 incl. Galperin limiter)."""
        o = self.options
        k = jnp.maximum(k, o.k_min)
        psi = jnp.maximum(psi, o.psi_min)
        # l from psi = cmu0^p k^m l^n
        l = (psi / (o.cmu0**o.p * k**o.m)) ** (1.0 / o.n)
        l = jnp.maximum(l, o.len_min)
        if buoy2 is not None:
            # Galperin limiter: l <= clim*sqrt(2k/N2) under stratification
            lmax = o.galperin_clim * jnp.sqrt(
                2 * k / jnp.maximum(buoy2, 1e-12)
            )
            l = jnp.where(buoy2 > 0, jnp.minimum(l, lmax), l)
        eps = jnp.maximum(o.cmu0**3 * k**1.5 / l, o.eps_min)
        return eps, l

    def compute_shear_buoy_freq(self, uv3d, rho_prime, geom, rho0=1000.0,
                                g=9.81):
        """M^2 and N^2 from vertical gradients (ref preprocess L486-507,
        ShearFrequencySolver/BuoyFrequencySolver L166-319)."""
        a3 = self.asm3d
        g_uv = a3.cell_grads(uv3d, geom)  # (..., comp, 3)
        m2_q = (g_uv[..., 0, 2] ** 2 + g_uv[..., 1, 2] ** 2)
        m2 = a3.mass_inverse(a3.cell_to_dofs(m2_q, geom), geom)
        if rho_prime is not None:
            g_r = a3.cell_grads(rho_prime, geom)[..., 2]
            n2_q = -g / rho0 * g_r
            n2 = a3.mass_inverse(a3.cell_to_dofs(n2_q, geom), geom)
        else:
            n2 = jnp.zeros_like(m2)
        return jnp.maximum(m2, 1e-12), n2

    def limit_psi(self, k, psi, n2):
        """Galperin limit imposed through psi (ref postprocess L530-540):
        for n<0 a *minimum* value."""
        o = self.options
        n2_pos = jnp.maximum(n2, 0.0) + 1e-12
        val = (
            np.sqrt(2.0) * o.galperin_clim * o.cmu0 ** (o.p / o.n)
            * jnp.maximum(k, o.k_min) ** (o.m / o.n + 0.5)
            * n2_pos ** (-0.5)
        ) ** o.n
        if o.n > 0:
            return jnp.minimum(psi, val)
        return jnp.maximum(psi, val)

    def eddy_coefficients(self, k, psi, m2, n2):
        """nu = sqrt(k) l S_m / cmu0^3, mu likewise with S_rho
        (ref postprocess L563-575: the stability functions are in the
        c_mu convention, nu = c_mu k^2/eps)."""
        o = self.options
        k = jnp.maximum(k, o.k_min)
        if o.limit_psi:
            psi = self.limit_psi(k, psi, n2)
        eps, l = self.eps_from_k_psi(k, psi, n2)
        s_m, s_h = self.stability_functions.evaluate(m2, n2, k, eps)
        b = jnp.sqrt(k) * l / o.cmu0**3
        nu = jnp.maximum(b * s_m, o.visc_min)
        mu = jnp.maximum(b * s_h, o.diff_min)
        return nu, mu, eps, l

    # -- prognostic update (TKE/Psi equations, ref L599-790) ------------
    def step_columns(self, k, psi, m2, n2, nu, mu, Dn, dt):
        """Semi-implicit column update of (k, psi):

        - production P = nu M^2, buoyancy B = -mu N^2, dissipation eps,
          with Patankar treatment of the sinks (sinks divided by the old
          value and treated implicitly, ref L649, L728),
        - implicit vertical diffusion with nu/sigma Schmidt numbers as a
          batched tridiagonal (Thomas) solve per column node.

        All arrays (nc, 3, nz, 2); Dn (nc, 3, nz) layer thickness.
        """
        o = self.options
        eps, l = self.eps_from_k_psi(k, psi, n2)
        P = nu * m2
        B = -mu * n2
        # --- TKE sources with Patankar splitting ------------------------
        # explicit: P + B^+ ; implicit sink: (eps + B^-) * k_new/k_old
        Bplus = jnp.maximum(B, 0.0)
        Bminus = jnp.minimum(B, 0.0)
        k_old = jnp.maximum(k, o.k_min)
        k_star = (k + dt * (P + Bplus)) / (
            1.0 + dt * (eps - Bminus) / k_old
        )
        # --- Psi sources ------------------------------------------------
        c3 = jnp.where(B > 0, o.c3_plus, o.c3_minus)
        psi_old = jnp.maximum(psi, o.psi_min)
        fac = psi_old / k_old
        src_psi = fac * (o.c1 * P + c3 * B)
        sink_psi = fac * o.c2 * eps * o.f_wall
        psi_star = (psi + dt * jnp.maximum(src_psi, 0.0)
                    + dt * jnp.minimum(src_psi, 0.0) * 0.0) / (
            1.0 + dt * (sink_psi - jnp.minimum(src_psi, 0.0)) / psi_old
        )
        # --- psi wall-flux boundary conditions --------------------------
        # (nu_v/sigma_psi dpsi/dz)|_wall = n nu_v/sigma_psi cmu0^p k^m
        #     kappa^n z_w^(n-1), z_w = 0.5 dz + z0  (ref L731-756);
        # these anchor l ~ kappa z near the surface/bottom and prevent the
        # neutral-flow length-scale runaway
        kappa = 0.4
        z0b = 0.005
        z0s = 0.05
        diff_psi = nu / o.schmidt_nb_psi
        dz_bot = Dn[..., 0]
        dz_top = Dn[..., -1]
        z_b = 0.5 * dz_bot + z0b
        z_s = 0.5 * dz_top + z0s
        # inward wall flux magnitude |n| ... : for n<0 the law of the wall
        # has psi increasing toward the wall (l ~ kappa z), so the boundary
        # flux acts as a positive source in the wall cells
        flux_b = (jnp.abs(o.n) * diff_psi[..., 0, 0] * o.cmu0**o.p
                  * jnp.maximum(k[..., 0, 0], o.k_min) ** o.m
                  * kappa**o.n * z_b ** (o.n - 1.0))
        flux_s = (jnp.abs(o.n) * diff_psi[..., -1, 1] * o.cmu0**o.p
                  * jnp.maximum(k[..., -1, 1], o.k_min) ** o.m
                  * kappa**o.n * z_s ** (o.n - 1.0))
        # finite-volume source on the boundary half-cells
        psi_star = psi_star.at[..., 0, 0].add(
            dt * flux_b / jnp.maximum(0.5 * dz_bot, 1e-12)
        )
        psi_star = psi_star.at[..., -1, 1].add(
            dt * flux_s / jnp.maximum(0.5 * dz_top, 1e-12)
        )
        # --- implicit vertical diffusion --------------------------------
        k_new = self._vdiff_implicit(k_star, nu / o.schmidt_nb_tke, Dn, dt)
        psi_new = self._vdiff_implicit(
            psi_star, nu / o.schmidt_nb_psi, Dn, dt
        )
        k_new = jnp.maximum(k_new, o.k_min)
        psi_new = jnp.maximum(psi_new, o.psi_min)
        return k_new, psi_new

    def _vdiff_implicit(self, f, nu, Dn, dt):
        """Backward-Euler vertical diffusion per column, treating each
        column's layer-interface values as a continuous profile
        (finite-volume over layers; batched Thomas solve).

        f, nu: (nc, 3, nz, 2); Dn: (nc, 3, nz).
        """
        # collapse (layer, vnode) to interface profile of length nz+1
        prof = jnp.concatenate([f[..., :, 0], f[..., -1:, 1]], axis=-1)
        nu_if = jnp.concatenate([nu[..., :, 0], nu[..., -1:, 1]], axis=-1)
        nzp = prof.shape[-1]
        # finite volumes around interfaces: V_0 = Dn_0/2,
        # V_i = (Dn_{i-1}+Dn_i)/2, V_n = Dn_{n-1}/2 — this makes the scheme
        # exactly conserve the trapezoid column integral
        V = jnp.concatenate(
            [0.5 * Dn[..., :1],
             0.5 * (Dn[..., :-1] + Dn[..., 1:]),
             0.5 * Dn[..., -1:]], axis=-1,
        )
        V = jnp.maximum(V, 1e-12)
        # flux between interfaces i, i+1: F_i = nu_mid_i (f_{i+1}-f_i)/Dn_i
        nu_mid = 0.5 * (nu_if[..., :-1] + nu_if[..., 1:])
        g = dt * nu_mid / jnp.maximum(Dn, 1e-12)  # (.., nz)
        a = jnp.concatenate([jnp.zeros_like(g[..., :1]), g], axis=-1) / V
        c = jnp.concatenate([g, jnp.zeros_like(g[..., :1])], axis=-1) / V
        b = 1.0 + a + c
        # system: -a_i f_{i-1} + b_i f_i - c_i f_{i+1} = d_i — one fused
        # Pallas Thomas sweep on TPU (vs 2*nz scan kernels),
        # ``kernels/tridiag.py``
        from ..kernels import tridiag_solve

        xs = tridiag_solve(-a, b, -c, prof)
        # expand back to (nz, 2) layout
        bot = xs[..., :-1]
        top = xs[..., 1:]
        return jnp.stack([bot, top], axis=-1)


class PacanowskiPhilanderModel:
    r"""Algebraic Richardson-number closure (ref ``turbulence.py:853-961``):
    nu = nu_max / (1 + alpha Ri)^n + visc_min,
    mu = nu / (1 + alpha Ri) + diff_min."""

    def __init__(self, max_viscosity=5e-2, alpha=10.0, exponent=2.0,
                 visc_min=1e-8, diff_min=1e-8):
        self.max_viscosity = max_viscosity
        self.alpha = alpha
        self.exponent = exponent
        self.visc_min = visc_min
        self.diff_min = diff_min

    def eddy_coefficients(self, m2, n2):
        ri = jnp.maximum(n2 / jnp.maximum(m2, 1e-12), 0.0)
        denom = (1.0 + self.alpha * ri) ** self.exponent
        nu = self.max_viscosity / denom + self.visc_min
        mu = nu / (1.0 + self.alpha * ri) + self.diff_min
        return nu, mu
