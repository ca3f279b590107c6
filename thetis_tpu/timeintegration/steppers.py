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
    """theta-scheme (ref ``timeintegrator.py:168-252``).

    :kwarg preconditioner: 'mass' (default), 'schur', or a prebuilt
        callable.  'schur' builds the matrix-free wave-equation Schur
        block preconditioner
        (:class:`~thetis_tpu.solvers.schur.WaveEquationSchurPC`) at the
        old solution each step; a callable (e.g. a setup-time
        :class:`~thetis_tpu.solvers.assembled.AssembledWavePC`) is
        used as-is.  Only meaningful for shallow-water-type equations
        exposing the EPG/HUDiv term names."""

    cfl_coeff = np.inf

    def __init__(self, equation, dt, options=None, theta=0.5,
                 semi_implicit=False, solver_parameters=None,
                 preconditioner="mass", schur_inner_iterations=10,
                 assembled_solve=False, coarse=None):
        super().__init__(equation, dt, options)
        self.theta = float(theta)
        self.semi_implicit = semi_implicit
        self.preconditioner = (preconditioner if callable(preconditioner)
                               else str(preconditioner))
        self.schur_inner_iterations = int(schur_inner_iterations)
        #: semi-implicit stage systems are *affine* in the solution with
        #: 1-ring (facet-neighbour) sparsity for DG elements: assemble the
        #: exact per-step system by graph-color probing and run the whole
        #: Krylov loop on gather+small-matmul matvecs — the TPU analogue of
        #: PETSc's assembled-Jacobian KSP (the reference's 2D default,
        #: ref ``options.py:44-48``)
        self.assembled_solve = bool(assembled_solve) and semi_implicit
        #: optional setup-time CoarseCorrection for the assembled KSP
        self.coarse = coarse
        self.params = solver_parameters or NewtonParameters()
        if semi_implicit:
            # Picard linearisation: one linear solve per step, terms are
            # A(u_old) u (ref L186-211 'ksponly')
            self.params.snes_max_it = 1
            self.params.snes_rtol = 1e-16

    def advance(self, t, solution, fields, fields_old, bnd_values,
                linearization_state=None, solution_prev=None):
        """One theta step.  ``linearization_state`` overrides the
        semi-implicit lagged state — the Picard re-linearization hook
        (ref ``timeintegrator.py:75`` ``advance_picard``; used by the
        2D coupled integrator's tracer Picard loop,
        ``coupled_timeintegrator_2d.py:115-135``).

        ``solution_prev`` (optional) enables the extrapolated Krylov
        warm start on the assembled path: the solve starts from the
        linear predictor ``2 u_n - u_{n-1}`` whose error is O(dt^2)
        against the O(dt) step increment.  Helps only when the dynamics
        are smooth on the dt scale; on the 102k-cell wave bench it LOST
        6 ms/step (the extra true-residual matvec outweighed the saved
        iterations — PERF.md round 5), so it is opt-in and off by
        default.  Exactness is unaffected: only the Krylov initial
        guess changes."""
        eq = self.equation
        dt, th = self.dt, self.theta
        u_old = solution
        u_lag = linearization_state if linearization_state is not None \
            else u_old
        m_old = eq.mass_term(u_old)
        r_expl = eq.residual("all", u_old, u_old, fields_old, fields_old,
                             bnd_values)
        const = _tree_lc([(-1.0, m_old), (-(1 - th) * dt, r_expl)])

        def F(u):
            u_nl = u_lag if self.semi_implicit else u
            r_impl = eq.residual("all", u, u_nl, fields, fields, bnd_values)
            return _tree_lc(
                [(1.0, eq.mass_term(u)), (-th * dt, r_impl), (1.0, const)]
            )

        if self.assembled_solve:
            from ..solvers.assembled import (
                PackedState, assemble_affine_operator, ring_gmres,
                ring_apply, ring_apply_T, get_coloring, get_stencil,
            )

            ps = PackedState(u_old)
            ring, _, _ = get_coloring(eq.mesh)
            ring_j = jnp.asarray(ring)
            stencil = get_stencil(eq.mesh)
            x_old = ps.pack(u_old)
            x_warm = (2.0 * x_old - ps.pack(solution_prev)
                      if solution_prev is not None else x_old)
            # the analytic path linearizes the (possibly nonlinear W&D)
            # displacement mass at u_lag; probing linearizes it at u_old —
            # identical unless a Picard re-linearization state is passed
            wd = getattr(getattr(eq, "depth", None),
                         "use_wetting_and_drying", False)
            analytic = (hasattr(eq, "assemble_operator_blocks")
                        and getattr(eq.asm, "ndofs", 3) == 3
                        and not (wd and linearization_state is not None))
            # component-major blocks whenever a shift stencil exists: the
            # cell-major (nc, ns, 9, 9) tensor is (8,128)-padded ~25x on
            # TPU and assembly/solve never need it (PERF.md round 4)
            lay = "T" if (analytic and stencil is not None) else "cell"
            r0 = None
            if analytic:
                # analytic value-space assembly (equations/swe_blocks.py):
                # a small multiple of one residual evaluation, vs
                # n_colors*9 dof probes for generic color probing
                if fields is fields_old and linearization_state is None:
                    # r_impl(u_old) == r_expl: F(u_old) = -dt * r_expl,
                    # with r_expl projected from the assembly's own
                    # linearization primal (no separate residual pass)
                    blocks, r_lag = eq.assemble_operator_blocks(
                        u_lag, fields, bnd_values, th * dt,
                        return_residual=True, layout=lay)
                    F_old = _tree_lc([(-dt, r_lag)])
                else:
                    blocks = eq.assemble_operator_blocks(
                        u_lag, fields, bnd_values, th * dt, layout=lay)
                    F_old = F(u_old)
                f_old = ps.pack(F_old)
                if lay == "T":
                    # b is only needed for the convergence anchor ||b||;
                    # the warm-start residual b - A x_old == -F_old is
                    # passed in closed form (saves one block matvec)
                    b = ring_apply_T(blocks, x_old, stencil) - f_old
                    r0 = -f_old
                else:
                    b = ring_apply(blocks, ring_j, x_old,
                                   stencil=stencil) - f_old
            else:
                blocks, f0 = assemble_affine_operator(
                    lambda x: ps.pack(F(ps.unpack(x))), x_old, eq.mesh,
                )
                b = -f0
            x = ring_gmres(
                blocks, ring_j, b,
                rtol=self.params.ksp_rtol,
                restart=self.params.gmres_restart,
                max_cycles=max(
                    1, self.params.ksp_max_it // self.params.gmres_restart
                ),
                coarse=self.coarse,
                # warm start: extrapolated predictor when the caller
                # supplies u_{n-1}, else the previous solution
                x0=x_warm,
                stencil=stencil,
                layout=lay,
                r0=(r0 if solution_prev is None else None),
            )
            return ps.unpack(x)

        if callable(self.preconditioner):
            pc = self.preconditioner
        elif self.preconditioner == "schur":
            from ..solvers.schur import WaveEquationSchurPC

            pc = WaveEquationSchurPC(
                eq, dt, th, u_old, fields, bnd_values,
                inner_iterations=self.schur_inner_iterations,
            )
        else:
            pc = eq.mass_inverse
        return newton_solve(F, u_old, precond=pc, params=self.params)


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
        # lower-triangular tableaux only: DIRK, ESDIRK (explicit first
        # stage, solved without a Newton iteration) or fully explicit
        assert not np.triu(tb.a, 1).any(), \
            f"{scheme} is not diagonally implicit"
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
            if aii == 0.0:
                # explicit (ESDIRK first) stage: k_i = M^-1 R(base)
                r = eq.residual("all", base, base, fields, fields,
                                bnd_values)
                ks.append(eq.mass_inverse(r))
                continue

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
                 semi_implicit=False, solver_parameters=None,
                 assembled_solve=False, coarse=None):
        super().__init__(equation, dt, options)
        self.coarse = coarse
        tb = SCHEMES[scheme]()
        assert tb.is_dirk
        assert np.allclose(tb.a[-1], tb.b), \
            "u-form DIRK requires a stiffly accurate tableau"
        self.a = tb.a
        self.n_stages = tb.n_stages
        self.cfl_coeff = tb.cfl_coeff
        self.semi_implicit = semi_implicit
        #: per-stage assembled-Jacobian KSP (see CrankNicolson) — the
        #: semi-implicit stage systems are affine with 1-ring sparsity
        self.assembled_solve = bool(assembled_solve) and semi_implicit
        self.params = solver_parameters or NewtonParameters()
        if semi_implicit:
            self.params.snes_max_it = 1
            self.params.snes_rtol = 1e-16

    def advance(self, t, solution, fields, fields_old, bnd_values):
        eq = self.equation
        dt = self.dt
        m_old = eq.mass_term(solution)
        r_stages = []
        stage_blocks = {}
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

            if self.assembled_solve:
                from ..solvers.assembled import (
                    PackedState, assemble_affine_operator, ring_gmres,
                    ring_apply, ring_apply_T, get_coloring, get_stencil,
                )

                ps = PackedState(u_i)
                ring, _, _ = get_coloring(eq.mesh)
                ring_j = jnp.asarray(ring)
                stencil = get_stencil(eq.mesh)
                x_i = ps.pack(u_i)
                # with W&D the displacement mass is nonlinear in eta and
                # the probing path linearizes it at u_i (one Newton step);
                # the analytic fast path linearizes at the step start, so
                # only take it for the affine (non-W&D) case
                analytic = (hasattr(eq, "assemble_operator_blocks")
                            and getattr(eq.asm, "ndofs", 3) == 3
                            and not getattr(
                                getattr(eq, "depth", None),
                                "use_wetting_and_drying", False))
                lay = "T" if (analytic and stencil is not None) else "cell"
                r0 = None
                if analytic:
                    # stages with equal a_ii share the operator: cache
                    # the analytic blocks per diagonal coefficient
                    blocks = stage_blocks.get(aii)
                    if blocks is None:
                        blocks = eq.assemble_operator_blocks(
                            solution, fields, bnd_values, dt * aii,
                            layout=lay)
                        stage_blocks[aii] = blocks
                    f_i = ps.pack(F(u_i))
                    if lay == "T":
                        b = ring_apply_T(blocks, x_i, stencil) - f_i
                        r0 = -f_i  # b - A x_i in closed form
                    else:
                        b = ring_apply(blocks, ring_j, x_i,
                                       stencil=stencil) - f_i
                else:
                    blocks, f0 = assemble_affine_operator(
                        lambda x: ps.pack(F(ps.unpack(x))), x_i, eq.mesh,
                    )
                    b = -f0
                u_i = ps.unpack(ring_gmres(
                    blocks, ring_j, b,
                    rtol=self.params.ksp_rtol,
                    restart=self.params.gmres_restart,
                    max_cycles=max(1, self.params.ksp_max_it
                                   // self.params.gmres_restart),
                    coarse=self.coarse,
                    x0=x_i,  # warm start from the previous level
                    stencil=stencil,
                    layout=lay,
                    r0=r0,
                ))
            else:
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
    """Predictor/corrector pressure-projection scheme with Picard
    iterations (ref ``timeintegrator.py:305-464``).

    Each Picard sweep solves

    1. a **momentum predictor** for u* — all momentum terms, with the
       elevation lagged at the previous iterate (velocity-block mass
       system, cheap), then
    2. the **wave-equation corrector** for (u^{n+1}, eta^{n+1}) — only
       the external pressure gradient and HUDiv are implicit; the
       predictor's pressure-gradient contribution at the lagged elevation
       is subtracted so it is replaced by the new implicit one
       (ref L396-420).  The corrector's Krylov solve is preconditioned by
       the matrix-free wave-equation Schur complement
       (:class:`~thetis_tpu.solvers.schur.WaveEquationSchurPC`, the
       AssembledSchurPC analogue) — bounded iterations at large wave CFL.

    Two Picard iterations restore 2nd-order accuracy (ref L456-462)."""

    cfl_coeff = np.inf

    _WAVE = frozenset(["ExternalPressureGradientTerm", "HUDivTerm",
                       "ContinuitySourceTerm"])
    _EPG = frozenset(["ExternalPressureGradientTerm"])

    def __init__(self, equation, dt, options=None, theta=0.5,
                 picard_iterations=2, solver_parameters=None,
                 solver_parameters_mom=None, use_schur_pc=True,
                 schur_inner_iterations=15, semi_implicit=True):
        super().__init__(equation, dt, options)
        self.theta = float(theta)
        self.iterations = int(picard_iterations)
        self.semi_implicit = bool(semi_implicit)
        self.use_schur_pc = bool(use_schur_pc)
        self.schur_inner_iterations = int(schur_inner_iterations)
        # momentum terms: everything except the continuity row
        self._mom_terms = frozenset(
            n for (n, _, _) in equation.terms
            if n not in ("HUDivTerm", "ContinuitySourceTerm")
        )
        if self.use_schur_pc and not hasattr(equation, "eta_space"):
            # the wave-Schur preconditioner assumes a CG elevation space
            # (pure-DG-mass velocity block); the reference raises here
            # (ref ``timeintegrator.py:358-370``) — we fall back to the
            # mass-preconditioned monolithic solve with a larger Krylov
            # budget instead
            from ..utils.log import print_output
            print_output(
                "PressureProjectionPicard: elevation space is not CG; "
                "disabling the wave-Schur preconditioner (use the dg-cg "
                "element family for the fast path)"
            )
            self.use_schur_pc = False
            if solver_parameters is None:
                solver_parameters = NewtonParameters(
                    ksp_rtol=1e-10, ksp_max_it=240, gmres_restart=60
                )
        self.params = solver_parameters or NewtonParameters(
            ksp_rtol=1e-10, ksp_max_it=120, gmres_restart=30
        )
        self.params_mom = solver_parameters_mom or NewtonParameters(
            ksp_rtol=1e-10, ksp_max_it=48, gmres_restart=16
        )
        if self.semi_implicit:
            for p in (self.params, self.params_mom):
                p.snes_max_it = 1
                p.snes_rtol = 1e-16

    def advance(self, t, solution, fields, fields_old, bnd_values):
        from ..solvers.schur import WaveEquationSchurPC

        eq = self.equation
        dt, th = self.dt, self.theta
        u_old = solution
        m_old = eq.mass_term(u_old)
        # old-time momentum residual (all terms) and wave residual
        r_mom_old = eq.residual(self._mom_terms, u_old, u_old, fields_old,
                                fields_old, bnd_values)["uv"]
        r_wave_old = eq.residual(self._WAVE, u_old, u_old, fields_old,
                                 fields_old, bnd_values)
        sol = u_old
        for _ in range(self.iterations):
            lag = sol

            # --- 1. momentum predictor: M_u u* = M_u u_old
            #        + dt [th R_mom(u*, eta_lag) + (1-th) R_mom(old)]
            def F_mom(us, lag=lag):
                st = {"uv": us, "elev": lag["elev"]}
                st_nl = lag if self.semi_implicit else st
                r = eq.residual(self._mom_terms, st, st_nl, fields, fields,
                                bnd_values)["uv"]
                mus = eq.mass_term({"uv": us, "elev": lag["elev"]})["uv"]
                return _tree_lc([
                    (1.0, mus), (-1.0, m_old["uv"]),
                    (-th * dt, r), (-(1 - th) * dt, r_mom_old),
                ])

            u_star = newton_solve(
                F_mom, lag["uv"],
                precond=lambda r: eq.mass_inverse(
                    {"uv": r, "elev": jnp.zeros_like(lag["elev"])})["uv"],
                params=self.params_mom,
            )

            # --- 2. wave corrector.  In the uv row the (1-th)-weighted
            # old pressure gradients cancel exactly (ref L396-420), so:
            #   M_u u - M_u u* - th dt (epg(eta) - epg(eta_lag; u*)) = 0
            #   M_e eta - M_e eta_old
            #       - dt (th hudiv(sol) + (1-th) hudiv(old)) = 0
            star_state = {"uv": u_star, "elev": lag["elev"]}
            star_nl = lag if self.semi_implicit else star_state
            epg_star = eq.residual(self._EPG, star_state, star_nl, fields,
                                   fields, bnd_values)["uv"]
            m_star = eq.mass_term(star_state)["uv"]
            const_uv = _tree_lc([(-1.0, m_star), (th * dt, epg_star)])
            const_e = _tree_lc([
                (-1.0, m_old["elev"]),
                (-(1 - th) * dt, r_wave_old["elev"]),
            ])

            def F(w, lag=lag, const_uv=const_uv, const_e=const_e):
                w_nl = lag if self.semi_implicit else w
                r = eq.residual(self._WAVE, w, w_nl, fields, fields,
                                bnd_values)
                m = eq.mass_term(w)
                return {
                    "uv": m["uv"] - th * dt * r["uv"] + const_uv,
                    "elev": m["elev"] - th * dt * r["elev"] + const_e,
                }

            if self.use_schur_pc:
                pc = WaveEquationSchurPC(
                    eq, dt, th, lag, fields, bnd_values,
                    inner_iterations=self.schur_inner_iterations,
                )
            else:
                pc = eq.mass_inverse
            sol = newton_solve(F, {"uv": u_star, "elev": lag["elev"]},
                               precond=pc, params=self.params)
        return sol


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
    if name in ("DIRK23", "DIRK43", "DIRKLSPUM2", "DIRKLPUM2",
                "ESDIRKMidpoint", "ESDIRKTrapezoid", "ImplicitMidpoint"):
        return DIRKGeneric(equation, dt, scheme=name, options=options, **kw)
    if name in ("ERKMidpoint", "ERKLSPUM2", "ERKLPUM2"):
        return ERKGeneric(equation, dt, scheme=name, options=options)
    if name == "SteadyState":
        return SteadyState(equation, dt, options, **kw)
    if name in ("SSPIMEX", "IMEXLPUM2", "IMEXLSPUM2", "IMEXEuler",
                "IMEXMidpoint"):
        from .implicitexplicit import get_imex_stepper

        return get_imex_stepper(name, equation, dt, options, **kw)
    if name == "PressureProjectionPicard":
        return PressureProjectionPicard(equation, dt, options, **kw)
    raise ValueError(f"unknown time stepper: {name}")
