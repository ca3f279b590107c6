r"""Matrix-free wave-equation Schur preconditioner.

TPU-native analogue of the reference's ``AssembledSchurPC``
(ref ``assembledschur.py:5-89``): the theta-weighted shallow-water wave
system

    [ M_u         -theta*dt*G ] [du]   [r_u]
    [ -theta*dt*D   M_eta     ] [de] = [r_e]

(G = d(epg residual)/d(eta), D = d(hudiv residual)/d(uv)) is solved by
block elimination with the elevation Schur complement

    S = M_eta - theta^2 dt^2 D M_u^{-1} G  ( = M_eta + g theta^2 dt^2 L,
                                             SPD wave operator )

The reference assembles S as a sparse matrix and LU-factorises it each
step; on TPU we keep S matrix-free (two linearized residual evaluations
per application) and invert it with a fixed-iteration preconditioned CG
— compiler-friendly static control flow, no host round trips.  For the
dg-cg element pair with semi-implicit linearisation this S is the exact
Schur complement (the velocity block is a pure DG mass matrix; cf. the
guard in ref ``timeintegrator.py:358-370``); for dg-dg the Riemann
coupling in the velocity block makes it approximate and the outer Krylov
absorbs the difference.
"""
import jax
import jax.numpy as jnp

__all__ = ["WaveEquationSchurPC"]

_EPG = frozenset(["ExternalPressureGradientTerm"])
_HUDIV = frozenset(["HUDivTerm"])


def _tree_axpy(a, x, y):
    return jax.tree_util.tree_map(lambda xi, yi: a * xi + yi, x, y)


def _tree_dot(x, y):
    return sum(
        jnp.vdot(a, b).real
        for a, b in zip(jax.tree_util.tree_leaves(x),
                        jax.tree_util.tree_leaves(y))
    )


class WaveEquationSchurPC:
    """Build once per (linearisation state, fields) and pass as
    ``precond`` to :func:`~thetis_tpu.solvers.newton.newton_solve`.

    :arg eq: a ShallowWaterEquations-like object exposing
        ``residual/mass_term/mass_inverse`` and the
        ExternalPressureGradientTerm / HUDivTerm term names
    :arg lin_state: solution pytree to linearise about
    :arg inner_iterations: static CG iteration count for the S solve
    """

    def __init__(self, eq, dt, theta, lin_state, fields, bnd_values,
                 inner_iterations=15):
        self.eq = eq
        self.coeff = float(theta) * float(dt)
        self.n_inner = int(inner_iterations)
        uv0, eta0 = lin_state["uv"], lin_state["elev"]

        # tangent operators about the (lagged) linearisation state; the
        # affine parts (boundary data) drop out in the tangents
        def epg_of_eta(e):
            return eq.residual(
                _EPG, {"uv": uv0, "elev": e}, lin_state, fields, fields,
                bnd_values,
            )["uv"]

        def hudiv_of_uv(u):
            return eq.residual(
                _HUDIV, {"uv": u, "elev": eta0}, lin_state, fields, fields,
                bnd_values,
            )["elev"]

        _, self.G = jax.linearize(epg_of_eta, eta0)
        _, self.D = jax.linearize(hudiv_of_uv, uv0)

        def mass_eta(e):
            return eq.mass_term({"uv": uv0, "elev": e})["elev"]

        _, self.Me = jax.linearize(mass_eta, eta0)
        self._zero_uv = jax.tree_util.tree_map(jnp.zeros_like, uv0)
        self._zero_eta = jax.tree_util.tree_map(jnp.zeros_like, eta0)

    # -- block helpers ---------------------------------------------------
    def _mu_inv(self, r_u):
        return self.eq.mass_inverse(
            {"uv": r_u, "elev": self._zero_eta})["uv"]

    def _me_inv(self, r_e):
        return self.eq.mass_inverse(
            {"uv": self._zero_uv, "elev": r_e})["elev"]

    def _schur_apply(self, v):
        """S v = M_eta v - (theta dt)^2 D M_u^-1 G v."""
        c = self.coeff
        return self.Me(v) - c * c * self.D(self._mu_inv(self.G(v)))

    def _schur_solve(self, b):
        """Fixed-iteration CG on the SPD wave operator, preconditioned by
        the elevation mass inverse (static control flow for jit/scan)."""
        x = jnp.zeros_like(b)
        r = b
        z = self._me_inv(r)
        p = z
        rz = _tree_dot(r, z)

        def body(_, carry):
            x, r, p, rz = carry
            Ap = self._schur_apply(p)
            alpha = rz / jnp.maximum(_tree_dot(p, Ap),
                                     jnp.finfo(rz.dtype).tiny)
            x = _tree_axpy(alpha, p, x)
            r = _tree_axpy(-alpha, Ap, r)
            z = self._me_inv(r)
            rz_new = _tree_dot(r, z)
            beta = rz_new / jnp.maximum(rz, jnp.finfo(rz.dtype).tiny)
            p = _tree_axpy(beta, p, z)
            return x, r, p, rz_new

        x, _, _, _ = jax.lax.fori_loop(0, self.n_inner, body, (x, r, p, rz))
        return x

    # -- the preconditioner ----------------------------------------------
    def __call__(self, r):
        """Approximate J^-1 r by block elimination (ref
        ``assembledschur.py:40-75`` apply)."""
        c = self.coeff
        du_star = self._mu_inv(r["uv"])
        rhs_e = r["elev"] + c * self.D(du_star)
        de = self._schur_solve(rhs_e)
        du = _tree_axpy(c, self._mu_inv(self.G(de)), du_star)
        return {"uv": du, "elev": de}
