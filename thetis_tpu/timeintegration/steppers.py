"""Time integrators.

Functional analogues of the reference's ``thetis/timeintegrator.py`` /
``rungekutta.py`` integrator classes: each stepper exposes

    ``advance(t, solution, fields, fields_old, bnd_values) -> solution``

as a pure jnp function of its array arguments, suitable for ``jax.jit`` /
``lax.scan`` time loops (the TPU replacement of the reference's Python
``while`` loop + PETSc solves, ``solver2d.py:1115-1127``).

Implicit steppers solve their stage systems with matrix-free Newton-GMRES
(``solvers.newton``) instead of PETSc SNES; ``use_semi_implicit_linearization``
mirrors the reference's Picard/'ksponly' mode (``timeintegrator.py:186-211``).
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..solvers.newton import newton_solve, NewtonParameters
from .rungekutta import SCHEMES

__all__ = [
    "ForwardEuler",
    "PressureProjectionPicard",
    "SSPRK33",
    "CrankNicolson",
    "BackwardEuler",
    "DIRKGeneric",
    "ERKGeneric",
    "SteadyState",
    "get_stepper",
]


def _tree_lc(coeffs_and_trees):
    """Linear combination of pytrees: [(a0, t0), (a1, t1), ...]."""
    out = None
    for a, t in coeffs_and_trees:
        scaled = jax.tree_util.tree_map(lambda x: a * x, t)
        out = scaled if out is None else jax.tree_util.tree_map(
            jnp.add, out, scaled
        )
    return out


class TimeIntegrator:
    cfl_coeff = None

    def __init__(self, equation, dt, options=None):
        self.equation = equation
        self.dt = float(dt)
        self.options = options

    def advance(self, t, solution, fields, fields_old, bnd_values):
        raise NotImplementedError


class ForwardEuler(TimeIntegrator):
    """ref ``timeintegrator.py:115-165``."""

    cfl_coeff = 1.0

    def advance(self, t, solution, fields, fields_old, bnd_values):
        eq = self.equation
        r = eq.residual("all", solution, solution, fields_old, fields_old,
                        bnd_values)
        return _tree_lc([(1.0, solution), (self.dt, eq.mass_inverse(r))])


class SSPRK33(TimeIntegrator):
    """3-stage SSP RK in Shu-Osher form (ref ``rungekutta.py:955``)."""

    cfl_coeff = 1.0

    def _stage_rhs(self, u, fields, bnd_values):
        eq = self.equation
        r = eq.residual("all", u, u, fields, fields, bnd_values)
        return eq.mass_inverse(r)

    def advance(self, t, solution, fields, fields_old, bnd_values):
        dt = self.dt
        u = solution
        k0 = self._stage_rhs(u, fields_old, bnd_values)
        u1 = _tree_lc([(1.0, u), (dt, k0)])
        k1 = self._stage_rhs(u1, fields, bnd_values)
        u2 = _tree_lc([(0.75, u), (0.25, u1), (0.25 * dt, k1)])
        k2 = self._stage_rhs(u2, fields, bnd_values)
        return _tree_lc([(1.0 / 3.0, u), (2.0 / 3.0, u2), (2.0 / 3.0 * dt, k2)])


class CrankNicolson(TimeIntegrator):
    """theta-scheme (ref ``timeintegrator.py:168-252``)."""

    cfl_coeff = np.inf

    def __init__(self, equation, dt, options=None, theta=0.5,
                 semi_implicit=False, solver_parameters=None):
        super().__init__(equation, dt, options)
        self.theta = float(theta)
        self.semi_implicit = semi_implicit
        self.params = solver_parameters or NewtonParameters()
        if semi_implicit:
            # Picard linearisation: one linear solve per step, terms are
            # A(u_old) u (ref L186-211 'ksponly')
            self.params.snes_max_it = 1
            self.params.snes_rtol = 1e-16

    def advance(self, t, solution, fields, fields_old, bnd_values):
        eq = self.equation
        dt, th = self.dt, self.theta
        u_old = solution
        m_old = eq.mass_term(u_old)
        r_expl = eq.residual("all", u_old, u_old, fields_old, fields_old,
                             bnd_values)
        const = _tree_lc([(-1.0, m_old), (-(1 - th) * dt, r_expl)])

        def F(u):
            u_nl = u_old if self.semi_implicit else u
            r_impl = eq.residual("all", u, u_nl, fields, fields, bnd_values)
            return _tree_lc(
                [(1.0, eq.mass_term(u)), (-th * dt, r_impl), (1.0, const)]
            )

        return newton_solve(F, u_old, precond=eq.mass_inverse, params=self.params)


class BackwardEuler(CrankNicolson):
    def __init__(self, equation, dt, options=None, **kw):
        kw.pop("theta", None)
        super().__init__(equation, dt, options, theta=1.0, **kw)


class DIRKGeneric(TimeIntegrator):
    """Generic k-form DIRK from a Butcher tableau
    (ref ``rungekutta.py:438-577``).

    Stage i solves  M k_i = R(u^n + dt*sum_j a_ij k_j)  for the tendency k_i,
    then u^{n+1} = u^n + dt*sum_i b_i k_i.
    """

    def __init__(self, equation, dt, scheme="DIRK22", options=None,
                 semi_implicit=False, solver_parameters=None):
        super().__init__(equation, dt, options)
        tb = SCHEMES[scheme]()
        assert tb.is_dirk or not tb.is_implicit
        self.a, self.b, self.c = tb.a, tb.b, tb.c
        self.n_stages = tb.n_stages
        self.cfl_coeff = tb.cfl_coeff
        self.semi_implicit = semi_implicit
        self.params = solver_parameters or NewtonParameters()
        if semi_implicit:
            self.params.snes_max_it = 1
            self.params.snes_rtol = 1e-16

    def advance(self, t, solution, fields, fields_old, bnd_values):
        eq = self.equation
        dt = self.dt
        ks = []
        for i in range(self.n_stages):
            terms = [(1.0, solution)] + [
                (dt * self.a[i][j], ks[j]) for j in range(i) if self.a[i][j] != 0.0
            ]
            base = _tree_lc(terms)
            aii = float(self.a[i][i])

            def F(k, base=base, aii=aii):
                u = _tree_lc([(1.0, base), (dt * aii, k)])
                u_nl = base if self.semi_implicit else u
                r = eq.residual("all", u, u_nl, fields, fields, bnd_values)
                return _tree_lc([(1.0, eq.mass_term(k)), (-1.0, r)])

            k0 = ks[-1] if ks else jax.tree_util.tree_map(jnp.zeros_like, solution)
            ks.append(newton_solve(F, k0, precond=eq.mass_inverse,
                                   params=self.params))
        return _tree_lc(
            [(1.0, solution)]
            + [(dt * float(bi), k) for bi, k in zip(self.b, ks) if bi != 0.0]
        )


class DIRKUForm(TimeIntegrator):
    """u-form DIRK for stiffly-accurate tableaux (b == last row of a):
    each stage solves directly for the stage *solution*, so nonlinear mass
    terms (wetting-and-drying bathymetry displacement) are handled exactly
    (ref ``rungekutta.py:580-711`` DIRKGenericUForm, used for the 2D SWE
    BackwardEuler/DIRK22/DIRK33 steppers, ``solver2d.py:666-668``)."""

    def __init__(self, equation, dt, scheme="DIRK22", options=None,
                 semi_implicit=False, solver_parameters=None):
        super().__init__(equation, dt, options)
        tb = SCHEMES[scheme]()
        assert tb.is_dirk
        assert np.allclose(tb.a[-1], tb.b), \
            "u-form DIRK requires a stiffly accurate tableau"
        self.a = tb.a
        self.n_stages = tb.n_stages
        self.cfl_coeff = tb.cfl_coeff
        self.semi_implicit = semi_implicit
        self.params = solver_parameters or NewtonParameters()
        if semi_implicit:
            self.params.snes_max_it = 1
            self.params.snes_rtol = 1e-16

    def advance(self, t, solution, fields, fields_old, bnd_values):
        eq = self.equation
        dt = self.dt
        m_old = eq.mass_term(solution)
        r_stages = []
        u_i = solution
        for i in range(self.n_stages):
            aii = float(self.a[i][i])
            known = _tree_lc(
                [(-1.0, m_old)]
                + [(-dt * float(self.a[i][j]), r_stages[j])
                   for j in range(i) if self.a[i][j] != 0.0]
            )

            def F(u, known=known, aii=aii):
                u_nl = solution if self.semi_implicit else u
                r = eq.residual("all", u, u_nl, fields, fields, bnd_values)
                return _tree_lc(
                    [(1.0, eq.mass_term(u)), (-dt * aii, r), (1.0, known)]
                )

            u_i = newton_solve(F, u_i, precond=eq.mass_inverse,
                               params=self.params)
            if i < self.n_stages - 1:
                u_nl = solution if self.semi_implicit else u_i
                r_stages.append(
                    eq.residual("all", u_i, u_nl, fields, fields, bnd_values)
                )
        return u_i


class ERKGeneric(TimeIntegrator):
    """Generic explicit RK from a Butcher tableau
    (ref ``rungekutta.py:762-953``)."""

    def __init__(self, equation, dt, scheme="SSPRK33", options=None):
        super().__init__(equation, dt, options)
        tb = SCHEMES[scheme]()
        assert not tb.is_implicit
        self.a, self.b = tb.a, tb.b
        self.n_stages = tb.n_stages
        self.cfl_coeff = tb.cfl_coeff

    def advance(self, t, solution, fields, fields_old, bnd_values):
        eq = self.equation
        dt = self.dt
        ks = []
        for i in range(self.n_stages):
            u_i = _tree_lc(
                [(1.0, solution)]
                + [(dt * self.a[i][j], ks[j]) for j in range(i) if self.a[i][j] != 0.0]
            )
            f = fields_old if i == 0 else fields
            r = eq.residual("all", u_i, u_i, f, f, bnd_values)
            ks.append(eq.mass_inverse(r))
        return _tree_lc(
            [(1.0, solution)]
            + [(dt * float(bi), k) for bi, k in zip(self.b, ks) if bi != 0.0]
        )


class PressureProjectionPicard(TimeIntegrator):
    """Picard-iterated theta scheme (ref ``timeintegrator.py:305-464``).

    The reference splits into a momentum predictor and a wave-equation
    corrector with an assembled Schur preconditioner (dg-cg only); here
    the same Picard linearisation is applied to the monolithic system:
    each of ``picard_iterations`` sweeps solves the linearised theta
    system about the previous iterate (two iterations restore 2nd-order
    accuracy, ref L456-462)."""

    cfl_coeff = np.inf

    def __init__(self, equation, dt, options=None, theta=0.5,
                 picard_iterations=2, solver_parameters=None):
        super().__init__(equation, dt, options)
        self.theta = float(theta)
        self.iterations = int(picard_iterations)
        # one linear solve per Picard sweep: needs a stronger Krylov run
        # than the Newton steppers (which refine over outer iterations)
        self.params = solver_parameters or NewtonParameters(
            ksp_rtol=1e-10, ksp_max_it=240, gmres_restart=60
        )
        self.params.snes_max_it = 1
        self.params.snes_rtol = 1e-16

    def advance(self, t, solution, fields, fields_old, bnd_values):
        eq = self.equation
        dt, th = self.dt, self.theta
        u_old = solution
        m_old = eq.mass_term(u_old)
        r_expl = eq.residual("all", u_old, u_old, fields_old, fields_old,
                             bnd_values)
        const = _tree_lc([(-1.0, m_old), (-(1 - th) * dt, r_expl)])
        u = u_old
        for _ in range(self.iterations):
            u_lag = u

            def F(w, u_lag=u_lag):
                r_impl = eq.residual("all", w, u_lag, fields, fields,
                                     bnd_values)
                return _tree_lc(
                    [(1.0, eq.mass_term(w)), (-th * dt, r_impl), (1.0, const)]
                )

            u = newton_solve(F, u, precond=eq.mass_inverse,
                             params=self.params)
        return u


class SteadyState(TimeIntegrator):
    """Solve the steady equations, no mass term
    (ref ``timeintegrator.py:255-302``)."""

    cfl_coeff = np.inf

    def __init__(self, equation, dt, options=None, solver_parameters=None):
        super().__init__(equation, dt, options)
        # steady Jacobians are not mass-dominated; default to the exact
        # (dense LU) linear solver with a line-searched Newton, mirroring
        # the reference's 'lu'+'newtonls' defaults for SteadyState
        self.params = solver_parameters or NewtonParameters(
            snes_max_it=40, line_search=True, dense=True
        )
        self.params.line_search = True

    def advance(self, t, solution, fields, fields_old, bnd_values):
        eq = self.equation

        def F(u):
            return jax.tree_util.tree_map(
                jnp.negative,
                eq.residual("all", u, u, fields, fields, bnd_values),
            )

        return newton_solve(F, solution, precond=eq.mass_inverse,
                            params=self.params)


def get_stepper(name, equation, dt, options=None, **kw):
    """Stepper factory mirroring the reference's registry
    (``solver2d.py:662-672``)."""
    name = str(name)
    if name == "ForwardEuler":
        return ForwardEuler(equation, dt, options)
    if name == "SSPRK33":
        return SSPRK33(equation, dt, options)
    if name == "CrankNicolson":
        return CrankNicolson(equation, dt, options, **kw)
    if name == "BackwardEuler":
        return BackwardEuler(equation, dt, options, **kw)
    if name in ("DIRK22", "DIRK33"):
        # u-form: exact with nonlinear (wetting-drying) mass terms
        return DIRKUForm(equation, dt, scheme=name, options=options, **kw)
    if name == "DIRK43":
        return DIRKGeneric(equation, dt, scheme=name, options=options, **kw)
    if name == "SteadyState":
        return SteadyState(equation, dt, options, **kw)
    if name in ("SSPIMEX", "IMEXLPUM2", "IMEXEuler"):
        from .implicitexplicit import get_imex_stepper

        return get_imex_stepper(name, equation, dt, options, **kw)
    if name == "PressureProjectionPicard":
        return PressureProjectionPicard(equation, dt, options, **kw)
    raise ValueError(f"unknown time stepper: {name}")
