r"""3D diagnostic operators.

Re-implementation of ``thetis/utility3d.py`` (SURVEY.md section 2.6) on the
column-local extruded arrays:

  VerticalVelocitySolver  (ref L27-129)  w from weak continuity + bottom
                                          impermeability
  VerticalIntegrator      (ref L132-210) -> ``Assembler3D.vertical_integral``
                                          / ``cumulative_integral``
  DensitySolver           (ref L213-280) pointwise EOS evaluation
  BaroclinicHead + InternalPressureGradientCalculator
                          (ref ``utility.py:478-492``, ``momentum_eq.py:
                          612-699``): r = -1/rho0 int_z^eta rho' dz,
                          int_pg = g grad_h(r)
  ExpandFunctionTo3d / SubFunctionExtractor (ref L471-708): 2D<->3D copies
                          become broadcasts / slices of the dense layout
  SmagorinskyViscosity    (ref L879-997)
  ALE mesh update         (ref L711-876) -> ``ExtrudedMesh.z_interfaces``
"""
import jax.numpy as jnp

from ..config import physical_constants

__all__ = [
    "VerticalVelocitySolver",
    "DensitySolver",
    "DensitySolverWeak",
    "VelocityMagnitudeSolver",
    "BaroclinicHeadCalculator",
    "SmagorinskyViscosity",
    "expand_function_to_3d",
    "extract_surface_2d",
    "extract_bottom_2d",
]


def expand_function_to_3d(u2d, nz):
    """2D nodal field (nc, 3[, k]) -> 3D (nc, 3, nz, 2[, k]) by vertical
    broadcast (ref ``ExpandFunctionTo3d`` op2 kernel, L521-534)."""
    return jnp.broadcast_to(
        u2d[:, :, None, None, ...],
        u2d.shape[:2] + (nz, 2) + u2d.shape[2:],
    )


def extract_surface_2d(u3d):
    """3D -> 2D: value at the free surface (top node of top layer)
    (ref ``SubFunctionExtractor``, L659-683)."""
    return u3d[:, :, -1, 1]


def extract_bottom_2d(u3d):
    return u3d[:, :, 0, 0]


class VerticalVelocitySolver:
    r"""Diagnostic vertical velocity from incompressibility:
    dw/dz = -div_h(uv), w(-h) = -uv . grad(h)  (ref L27-129).

    Two formulations:

    * :meth:`solve` — pointwise column integration of the projected
      horizontal divergence (first-order flux-consistent with the DG
      continuity; cheap).
    * :meth:`solve_weak` — the reference's weak continuity solve
      (ref ``utility3d.py:27-129``): find ``w`` such that the DG
      advection operator applied to the uniform tracer vanishes,

          \int w d(phi)/dz dV - \oint \hat w [phi n_z] dS
              = -( \int uv . grad_h(phi) dV - \oint avg(uv).n [phi] dS )

      with central interface fluxes, the bottom flux closed (this IS the
      impermeability condition ``(uv, w).n = 0`` in weak form) and the
      surface flux taken from the own trace (the free-surface kinematic
      value emerges from the solve).  Because every block of the
      operator factorizes over the extruded layout as
      ``M_h (x) T`` — the layer thickness cancels in
      ``\int w d(phi)/dz`` and the interface integrals ride the
      projected horizontal measure — the solve is two small constant
      contractions (``T^{-1}`` over the vertical profile, ``M_h^{-1}``
      per triangle) applied to one weak-divergence assembly, no Krylov
      loop.  The tracer advection then sees a velocity whose discrete
      divergence is zero row-by-row (except the free-surface rows,
      handled by the uniform-consistency field), which restores
      second-order convergence of the coupled MMS ladder.
    """

    def __init__(self, asm3d, bathymetry_cell):
        """:arg bathymetry_cell: (nc, 3) bathymetry at horizontal nodes"""
        import numpy as np

        self.asm3d = asm3d
        self.bathy_cell = bathymetry_cell
        asm2 = asm3d.asm2d
        # nodal horizontal gradient of bathymetry (P1 per cell: constant)
        self.grad_h = asm2.cell_grads(bathymetry_cell)[:, 0]  # (nc, 2)
        mesh = asm3d.mesh
        is_bnd = np.asarray(mesh.facet_is_boundary_np)
        self._mask_int = (~is_bnd).astype(np.float64)
        self._mask_bnd = is_bnd.astype(np.float64)
        # constant factors of the weak operator M_h (x) T (see class doc)
        self._Mh_inv_ref = np.linalg.inv(np.asarray(asm2._Mref_np))
        nz = asm3d.nz
        N = 2 * nz
        T = np.zeros((N, N))
        # volume: + int psi_a psi'_pp per layer (rows = tests (k, pp))
        D = np.array([[-0.5, 0.5], [-0.5, 0.5]])  # D[a, pp]
        for k in range(nz):
            for a in range(2):
                for pp in range(2):
                    T[2 * k + pp, 2 * k + a] += D[a, pp]
        # interior interfaces: central flux f_i = (w[2i-1] + w[2i]) / 2,
        # below test row gets -f, above test row +f
        for i in range(1, nz):
            T[2 * i - 1, 2 * i - 1] += -0.5
            T[2 * i - 1, 2 * i] += -0.5
            T[2 * i, 2 * i - 1] += 0.5
            T[2 * i, 2 * i] += 0.5
        # surface: own-trace outflux on the top test row (bottom closed)
        T[N - 1, N - 1] += -1.0
        self._T_inv = np.linalg.inv(T)

    def weak_divergence_rhs(self, uv3d, geom):
        """The weak divergence of ``uv3d`` tested against the 3D test
        set — exactly the horizontal-advection operator of
        ``TracerEquation3D`` at tracer == 1 (same cell term, same
        central inter-column fluxes, same own-trace boundary flux), with
        the opposite sign: ``rhs`` of the weak w system."""
        a3 = self.asm3d
        mesh = a3.mesh
        uv_q = a3.cell_values(uv3d)               # (nc, nz, nq, nqv, 2)
        acc = jnp.concatenate(
            [uv_q, jnp.zeros_like(uv_q[..., :1])], axis=-1)
        r = a3.grad_to_dofs(acc, geom)
        uv_tr = a3.facet_traces(uv3d)             # (nf, 2, nz, nqf, nqv, 2)
        n = mesh.facet_normal[:, None, None, None, :]
        un0 = (uv_tr[:, 0] * n).sum(-1)
        un1 = (uv_tr[:, 1] * n).sum(-1)
        un_av = 0.5 * (un0 + un1)
        dt = un0.dtype
        mi = jnp.asarray(self._mask_int, dtype=dt).reshape(-1, 1, 1, 1)
        mb = jnp.asarray(self._mask_bnd, dtype=dt).reshape(-1, 1, 1, 1)
        acc_f = jnp.stack([-un_av * mi - un0 * mb, un_av * mi], axis=1)
        return -(r + a3.vfacet_to_dofs(acc_f, geom))

    def solve_weak(self, uv3d, geom):
        """:arg uv3d: (nc, 3, nz, 2, 2); returns w (nc, 3, nz, 2) from
        the weak continuity equation (see class doc)."""
        rhs = self.weak_divergence_rhs(uv3d, geom)
        mesh = self.asm3d.mesh
        dt = rhs.dtype
        Mh_inv = jnp.asarray(self._Mh_inv_ref, dtype=dt)
        T_inv = jnp.asarray(self._T_inv, dtype=dt)
        t = jnp.einsum("ij,cjlv->cilv", Mh_inv, rhs) \
            / mesh.detJ[:, None, None, None]
        nc = rhs.shape[0]
        w = t.reshape(nc, 3, -1) @ T_inv.T
        return w.reshape(rhs.shape)

    def solve(self, uv3d, geom):
        """:arg uv3d: (nc, 3, nz, 2, 2); returns w (nc, 3, nz, 2)."""
        asm3d = self.asm3d
        # horizontal divergence at quad points, projected to dofs
        g = asm3d.cell_grads(uv3d, geom)  # (nc,nz,nq,nqv,2,3)
        div_h = g[..., 0, 0] + g[..., 1, 1]
        div_dofs = asm3d.mass_inverse(
            asm3d.cell_to_dofs(div_h, geom), geom
        )  # (nc,3,nz,2)
        # cumulative integral from the bottom: w(z) = w_b - int_{-h}^z div
        w_cum = asm3d.cumulative_integral(div_dofs, geom, from_top=False)
        uv_bot = uv3d[:, :, 0, 0]  # (nc,3,2)
        w_b = -(uv_bot * self.grad_h[:, None, :]).sum(-1)  # (nc,3)
        return w_b[:, :, None, None] - w_cum


class DensitySolver:
    """Pointwise EOS evaluation at dof points (ref L213-280)."""

    def __init__(self, eos, rho0=None):
        self.eos = eos
        self.rho0 = physical_constants["rho0"] if rho0 is None else rho0

    def solve(self, salt, temp, pressure=0.0):
        """density anomaly rho' = rho(S,T,p) - rho0."""
        return self.eos.compute_rho(salt, temp, pressure, self.rho0)

    def solve_p2(self, salt, temp, pressure=0.0, horizontal=False):
        """Density anomaly on the QUADRATIC vertical space
        (``use_quadratic_density``, ref ``solver.py:519``,
        ``options.py:1135-1156``): the EOS is evaluated pointwise at the
        layer bottom/mid/top with T/S linearly interpolated to the mid
        node — for a nonlinear EOS (Jackett) the mid-node density
        differs from the mean of the node densities, which is exactly
        the curvature the quadratic space captures.

        :kwarg horizontal: also evaluate the EOS at the 3 horizontal
            edge-midpoint columns (T/S linearly interpolated there) —
            the full P2DGxP2 density of ref ``solver.py:519``
        :returns: (nc, 3 or 6, nz, 3) with vertical nodes (s=0, 1/2, 1).
        """
        if horizontal:
            from .utility3d import BaroclinicHeadCalculator as _B
            salt = _B._to_p2_nodes(salt)
            temp = _B._to_p2_nodes(temp)
            if hasattr(pressure, "ndim") and getattr(
                    pressure, "ndim", 0) >= 4:
                pressure = _B._to_p2_nodes(pressure)

        def mid(u):
            return 0.5 * (u[..., 0] + u[..., 1])

        p_b, p_t, p_m = pressure, pressure, pressure
        if hasattr(pressure, "ndim") and getattr(pressure, "ndim", 0) >= 4:
            p_b, p_t, p_m = (pressure[..., 0], pressure[..., 1],
                             mid(pressure))
        rho_b = self.eos.compute_rho(
            salt[..., 0], temp[..., 0], p_b, self.rho0)
        rho_t = self.eos.compute_rho(
            salt[..., 1], temp[..., 1], p_t, self.rho0)
        rho_m = self.eos.compute_rho(mid(salt), mid(temp), p_m, self.rho0)
        return jnp.stack([rho_b, rho_m, rho_t], axis=-1)


class DensitySolverWeak:
    """Weak (L2-projected) EOS evaluation: the analytical density
    expression is evaluated at quadrature points and projected onto the
    density field (ref ``utility3d.py:271-327``).  Differs from the
    pointwise :class:`DensitySolver` when the EOS is nonlinear (Jackett)
    — the projection is variationally consistent with the pressure
    gradient assembly."""

    def __init__(self, asm3d, eos, rho0=None):
        self.asm3d = asm3d
        self.eos = eos
        self.rho0 = physical_constants["rho0"] if rho0 is None else rho0

    def solve(self, salt, temp, geom, pressure=0.0):
        a3 = self.asm3d
        s_q = a3.cell_values(salt)
        t_q = a3.cell_values(temp)
        rho_q = self.eos.compute_rho(s_q, t_q, pressure, self.rho0)
        return a3.mass_inverse(a3.cell_to_dofs(rho_q, geom), geom)


class VelocityMagnitudeSolver:
    """Magnitude of (u, v, w) L2-projected onto a scalar 3D field, with
    a minimum-value clip (ref ``utility3d.py:330-380``).  ``uv`` or ``w``
    may be None to take the magnitude of the other alone."""

    def __init__(self, asm3d, min_val=1e-6):
        self.asm3d = asm3d
        self.min_val = float(min_val)

    def solve(self, geom, uv=None, w=None):
        a3 = self.asm3d
        s = 0.0
        if uv is not None:
            uv_q = a3.cell_values(uv)
            s = s + (uv_q ** 2).sum(axis=-1)
        if w is not None:
            w_q = a3.cell_values(w)
            s = s + w_q ** 2
        mag_q = jnp.sqrt(s)
        out = a3.mass_inverse(a3.cell_to_dofs(mag_q, geom), geom)
        return jnp.maximum(out, self.min_val)


class BaroclinicHeadCalculator:
    r"""Baroclinic head r = -1/rho0 int_z^eta rho' dz and the internal
    pressure gradient int_pg = g grad_h(r)
    (ref ``utility.py:478-492``, ``momentum_eq.py:612-699``).

    With ``quadratic=True`` the head is carried on the 3-node (P2)
    vertical space (``use_quadratic_pressure``, ref ``solver.py:454``,
    ``options.py:1135-1156``): the vertical integral of a layer-linear
    density is *quadratic* in z, so the P1 head loses one order in the
    in-layer structure of grad_h(r) — the dominant discretization error
    of baroclinic runs.  The quadratic head stores the exact in-layer
    antiderivative (closed-form `\int_s^1 \psi_p`, no extra quadrature)
    and the int-PG evaluation differentiates the quadratic
    representation; for layer-linear density the projected int-PG is
    then exact up to the horizontal discretization.
    """

    def __init__(self, asm3d):
        self.asm3d = asm3d
        self.rho0 = physical_constants["rho0"]
        self.g = physical_constants["g_grav"]

    @staticmethod
    def _to_p2_nodes(u):
        """P1DG horizontal nodal data (nc, 3, ...) -> P2DG nodes
        (nc, 6, ...): vertices then edge midpoints (m12, m02, m01),
        matching ``Assembler3D._phi2d_h``.  Linear interpolation — exact
        for the P1 fields (density traces, z interfaces) it is fed."""
        mids = jnp.stack([
            0.5 * (u[:, 1] + u[:, 2]),
            0.5 * (u[:, 0] + u[:, 2]),
            0.5 * (u[:, 0] + u[:, 1]),
        ], axis=1)
        return jnp.concatenate([u, mids], axis=1)

    def compute_head(self, rho_prime, geom, quadratic=False):
        """Density anomaly -> baroclinic head at dofs.

        :arg rho_prime: (nc, 3, nz, 2) P1 or (nc, 3, nz, 3) P2 vertical
        :kwarg quadratic: return the P2DGxP2 head (nc, 6, nz, 3) —
            density interpolated to the 6 horizontal nodes, exact
            in-layer vertical antiderivative at 3 s-nodes (ref
            ``solver.py:454``: P2DGxP2 head space)
        """
        if quadratic:
            if rho_prime.shape[1] == 3:
                rho_prime = self._to_p2_nodes(rho_prime)
            z_if6 = self._to_p2_nodes(geom["z_if"])
            Delta = z_if6[..., 1:] - z_if6[..., :-1]   # (nc, 6, nz)
        else:
            Delta = geom["Delta_nodes"]                # (nc, 3, nz)
        p2_in = rho_prime.shape[3] == 3
        if p2_in:
            rb, rm, rt = (rho_prime[..., 0], rho_prime[..., 1],
                          rho_prime[..., 2])
            # Simpson: exact for the quadratic in-layer density
            layer_int = Delta * (rb + 4.0 * rm + rt) / 6.0
        else:
            rb, rt = rho_prime[..., 0], rho_prime[..., 1]
            rm = 0.5 * (rb + rt)
            layer_int = Delta * 0.5 * (rb + rt)
        # integral from the free surface down to the top of each layer
        csum = jnp.flip(jnp.cumsum(jnp.flip(layer_int, axis=2), axis=2),
                        axis=2)
        above = csum - layer_int           # (nc, nh, nz)
        scale = -1.0 / self.rho0
        if not quadratic:
            at_top = scale * above
            at_bot = scale * csum
            return jnp.stack([at_bot, at_top], axis=3)
        # in-layer antiderivative I(s) = int_s^1 rho(sigma) dsigma on the
        # quadratic (Lagrange {0,1/2,1}) density: closed-form basis
        # integrals int_s^1 psi_p at s = 0, 1/2:
        #   s=0:   (1/6, 2/3, 1/6)     (Simpson)
        #   s=1/2: (-1/24, 1/3, 5/24)
        # (for P1 density, rm = mean and these reduce to the trapezoid
        # tails (1/2, 1/2) and (1/8, 3/8))
        if p2_in:
            tail_mid = Delta * (-rb / 24.0 + rm / 3.0 + 5.0 * rt / 24.0)
        else:
            tail_mid = Delta * (rb / 8.0 + 3.0 * rt / 8.0)
        r_top = scale * above
        r_mid = scale * (above + tail_mid)
        r_bot = scale * csum
        return jnp.stack([r_bot, r_mid, r_top], axis=3)

    def compute_int_pg(self, baroc_head, geom):
        """int_pg = g grad_h(r) projected to dofs: (nc, 3, nz, 2, 2).

        Accepts the P1 (2-node) or quadratic (3-node) head; the
        quadratic path differentiates the P2 vertical representation at
        the same quadrature points (degree-3 Gauss integrates the cubic
        head-x-test integrand exactly)."""
        asm3d = self.asm3d
        vtabs = ((asm3d._psi2_h, asm3d._dpsi2_h)
                 if baroc_head.shape[3] == 3 else None)
        htabs = ((asm3d._phi2d_h, asm3d._dphi2d_h)
                 if baroc_head.shape[1] == 6 else None)
        gr = asm3d.cell_grads(baroc_head, geom, vtabs=vtabs,
                              htabs=htabs)[..., 0:2]
        return asm3d.mass_inverse(
            asm3d.cell_to_dofs(self.g * gr, geom), geom
        )


class SmagorinskyViscosity:
    r"""nu = (C_s dx)^2 |S|, |S|^2 = du/dx^2 + dv/dy^2
    + 0.5 (du/dy + dv/dx)^2 (ref ``utility3d.py:879-997``)."""

    def __init__(self, asm3d, cs=0.1, max_visc=None, min_visc=1e-10):
        self.asm3d = asm3d
        self.cs = cs
        self.max_visc = max_visc
        self.min_visc = min_visc
        mesh = asm3d.mesh
        self.dx2 = jnp.asarray((cs * mesh.cell_hmin_np) ** 2)  # (nc,)

    def solve(self, uv3d, geom):
        asm3d = self.asm3d
        g = asm3d.cell_grads(uv3d, geom)  # (nc,nz,nq,nqv,2,3)
        dudx = g[..., 0, 0]
        dudy = g[..., 0, 1]
        dvdx = g[..., 1, 0]
        dvdy = g[..., 1, 1]
        s_mag = jnp.sqrt(
            dudx**2 + dvdy**2 + 0.5 * (dudy + dvdx) ** 2
        )
        nu_q = self.dx2[:, None, None, None] * s_mag
        nu = asm3d.mass_inverse(asm3d.cell_to_dofs(nu_q, geom), geom)
        nu = jnp.maximum(nu, self.min_visc)
        if self.max_visc is not None:
            nu = jnp.minimum(nu, self.max_visc)
        return nu


class Mesh3DConsistencyCalculator:
    r"""Hydrostatic consistency criterion (HCC) metric on the extruded mesh
    (ref ``utility3d.py:376-470``).

    For each prism let ``delta_z_top``/``delta_z_bot`` be the maximal z
    difference across the top/bottom facet and ``h`` the local prism
    height; the per-node metric is ``R_t = delta_z_top / h`` (top) and
    ``R_b = delta_z_bot / h`` (bottom).  ``R = 0`` for straight prisms;
    values above ~1 indicate internal pressure gradient errors (in
    practice ``R < 5`` is tolerable)."""

    def __init__(self, solver_obj=None):
        self.solver_obj = solver_obj

    @staticmethod
    def compute(z_interfaces):
        """(nc, 3, nz+1) interface z -> (nc, 3, nz, 2) HCC metric
        ([..., 0] = bottom facet ratio, [..., 1] = top facet ratio)."""
        z_bot = z_interfaces[:, :, :-1]  # (nc, 3, nz)
        z_top = z_interfaces[:, :, 1:]
        dz_top = z_top.max(axis=1, keepdims=True) - z_top.min(
            axis=1, keepdims=True)
        dz_bot = z_bot.max(axis=1, keepdims=True) - z_bot.min(
            axis=1, keepdims=True)
        h = jnp.maximum(z_top - z_bot, 1e-14)
        return jnp.stack([dz_bot / h, dz_top / h], axis=-1)

    def solve(self):
        """Compute the metric from the solver's current mesh geometry
        (z interfaces rebuilt from the current elevation) and log the
        global range."""
        so = self.solver_obj
        z = so.extruded.z_interfaces(so.bathy_cell,
                                     so.fields.elev_2d.data)
        out = self.compute(z)
        from ..utils.log import print_output
        print_output(f"HCC: {float(out.min()):.4f} .. {float(out.max()):.4f}")
        return out
