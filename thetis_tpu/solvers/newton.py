"""Matrix-free Newton-Krylov nonlinear solver with implicit-diff adjoints.

Replaces PETSc SNES/KSP in the reference stack (SURVEY.md section 2.9 item 3):
Jacobian-vector products come from ``jax.jvp`` of the residual and linear
solves from GMRES over pytrees.

Differentiation: the solve is wrapped in a ``jax.custom_vjp`` implementing
the implicit function theorem — the backward pass solves the *transposed*
Jacobian system ``J^T lambda = g`` with the same Krylov machinery and
back-propagates ``-lambda`` through the residual's parameter dependencies.
This is the exact discrete-adjoint solve that pyadjoint performs with
transposed PETSc solves in the reference (SURVEY.md section 3.5).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.sparse.linalg import gmres

__all__ = ["newton_solve", "NewtonParameters", "linear_solve"]


class NewtonParameters:
    """SNES/KSP-ish tolerances (cf. reference ``options.py`` solver_parameters
    dicts).  Hashable so it can ride as a static argument."""

    def __init__(self, snes_rtol=1e-8, snes_atol=1e-10, snes_max_it=8,
                 ksp_rtol=1e-7, ksp_max_it=48, gmres_restart=16,
                 line_search=False, dense=False):
        self.snes_rtol = snes_rtol
        self.snes_atol = snes_atol
        self.snes_max_it = snes_max_it
        self.ksp_rtol = ksp_rtol
        self.ksp_max_it = ksp_max_it
        self.gmres_restart = gmres_restart
        self.line_search = line_search
        #: materialize the Jacobian and LU-solve (PETSc 'preonly'+'lu'
        #: analogue; for small/steady problems where Krylov stalls)
        self.dense = dense

    def _key(self):
        return (self.snes_rtol, self.snes_atol, self.snes_max_it,
                self.ksp_rtol, self.ksp_max_it, self.gmres_restart,
                self.line_search, self.dense)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, NewtonParameters) and self._key() == other._key()


def _norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.vdot(l, l).real for l in leaves))


def _axpy(a, x, y):
    return jax.tree_util.tree_map(lambda xi, yi: a * xi + yi, x, y)


def _linsolve(matvec, b, precond, params):
    """Left-preconditioned GMRES: solve (M A) x = M b unpreconditioned.

    (jax.scipy gmres with M= mixes unpreconditioned atol with preconditioned
    residual norms; when M rescales by ~detJ that stops the iteration
    immediately, so we precondition explicitly.)"""
    if getattr(params, "dense", False):
        from jax.flatten_util import ravel_pytree

        b_flat, unravel = ravel_pytree(b)
        n = b_flat.shape[0]

        def mv_flat(v):
            return ravel_pytree(matvec(unravel(v)))[0]

        A = jax.vmap(mv_flat, in_axes=1, out_axes=1)(jnp.eye(n, dtype=b_flat.dtype))
        x_flat = jnp.linalg.solve(A, b_flat)
        return unravel(x_flat)
    if precond is not None:
        pa = lambda v: precond(matvec(v))  # noqa: E731
        pb = precond(b)
    else:
        pa, pb = matvec, b
    x, _ = gmres(
        pa, pb, tol=params.ksp_rtol, atol=0.0,
        restart=params.gmres_restart,
        maxiter=max(1, params.ksp_max_it // params.gmres_restart),
        solve_method="incremental",
    )
    return x


def _newton_iterate(F, u0, aux, precond, params):
    f = lambda u: F(u, *aux)  # noqa: E731
    if params.snes_max_it == 1:
        # semi-implicit / Picard 'ksponly' path: single linear solve
        # (ref timeintegrator.py:186-211)
        fx, jvp_fn = jax.linearize(f, u0)
        du = _linsolve(jvp_fn, jax.tree_util.tree_map(jnp.negative, fx),
                       precond, params)
        return _axpy(1.0, du, u0)

    def cond(carry):
        i, x, fx, rnorm, tol = carry
        return jnp.logical_and(i < params.snes_max_it, rnorm > tol)

    def body(carry):
        i, x, fx, rnorm, tol = carry
        _, jvp_fn = jax.linearize(f, x)
        du = _linsolve(jvp_fn, jax.tree_util.tree_map(jnp.negative, fx),
                       precond, params)
        if params.line_search:
            # backtracking: halve the step while the residual norm does not
            # decrease (PETSc 'newtonls' analogue)
            def ls_cond(c2):
                alpha, rn, _ = c2
                return jnp.logical_and(alpha > 1.0 / 64.0, rn >= rnorm)

            def ls_body(c2):
                alpha, _, _ = c2
                alpha = 0.5 * alpha
                x_try = _axpy(alpha, du, x)
                f_try = f(x_try)
                return alpha, _norm(f_try), (x_try, f_try)

            x1 = _axpy(1.0, du, x)
            f1 = f(x1)
            _, rn_new, (x_new, fx_new) = jax.lax.while_loop(
                ls_cond, ls_body, (1.0, _norm(f1), (x1, f1))
            )
            return i + 1, x_new, fx_new, rn_new, tol
        x_new = _axpy(1.0, du, x)
        fx_new = f(x_new)
        return i + 1, x_new, fx_new, _norm(fx_new), tol

    fx0 = f(u0)
    r0 = _norm(fx0)
    tol = jnp.maximum(params.snes_rtol * r0, params.snes_atol)
    _, x, _, _, _ = jax.lax.while_loop(cond, body, (0, u0, fx0, r0, tol))
    return x


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4))
def _newton_cv(F, u0, aux, precond, params):
    return _newton_iterate(F, u0, aux, precond, params)


def _newton_cv_fwd(F, u0, aux, precond, params):
    u = _newton_iterate(F, u0, aux, precond, params)
    return u, (u, aux)


def _newton_cv_bwd(F, precond, params, residuals, g):
    u, aux = residuals
    # adjoint solve: J^T lambda = g (transposed-Jacobian Krylov solve)
    _, vjp_u = jax.vjp(lambda uu: F(uu, *aux), u)
    JT = lambda w: vjp_u(w)[0]  # noqa: E731
    # the mass preconditioner is symmetric, reuse it for J^T
    lam = _linsolve(JT, g, precond, params)
    # parameter gradients: aux_bar = -dF/daux^T lambda
    _, vjp_aux = jax.vjp(lambda *a: F(u, *a), *aux)
    neg_lam = jax.tree_util.tree_map(jnp.negative, lam)
    aux_bar = vjp_aux(neg_lam)
    u0_bar = jax.tree_util.tree_map(jnp.zeros_like, u)
    return (u0_bar, tuple(aux_bar))


_newton_cv.defvjp(_newton_cv_fwd, _newton_cv_bwd)


def newton_solve(residual_fn, u0, precond=None, params=None):
    """Solve ``residual_fn(u) = 0`` by Newton-GMRES.

    :arg residual_fn: pytree -> pytree (same structure); may close over
        traced values — they are extracted with ``jax.closure_convert`` so
        reverse-mode AD sees them as explicit parameters.
    :arg precond: linear operator approximating J^-1 (e.g. inverse mass)
    :returns: solution pytree (differentiable w.r.t. closed-over arrays via
        the implicit function theorem)
    """
    params = params or NewtonParameters()
    F_conv, aux = jax.closure_convert(residual_fn, u0)
    return _newton_cv(F_conv, u0, tuple(aux), precond, params)


def linear_solve(matvec, b, precond=None, rtol=1e-7, restart=16, maxiter=3):
    """Preconditioned GMRES convenience wrapper (PETSc KSP analogue)."""
    p = NewtonParameters(ksp_rtol=rtol, ksp_max_it=restart * maxiter,
                         gmres_restart=restart)
    return _linsolve(matvec, b, precond, p)
