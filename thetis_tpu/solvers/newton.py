"""Matrix-free Newton-Krylov nonlinear solver.

Replaces PETSc SNES/KSP in the reference stack (SURVEY.md section 2.9 item 3):
Jacobian-vector products come from ``jax.jvp`` of the residual, linear
solves from preconditioned GMRES over pytrees, and the whole solve is
wrapped in ``lax.custom_root`` so that ``jax.grad`` through an implicit
time step solves the correct transposed linear system — the autodiff
analogue of pyadjoint's adjoint solves.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.sparse.linalg import gmres

__all__ = ["newton_solve", "NewtonParameters"]


class NewtonParameters:
    """SNES/KSP-ish tolerances (cf. reference ``options.py`` solver_parameters
    dicts)."""

    def __init__(self, snes_rtol=1e-8, snes_atol=1e-10, snes_max_it=8,
                 ksp_rtol=1e-7, ksp_max_it=48, gmres_restart=16):
        self.snes_rtol = snes_rtol
        self.snes_atol = snes_atol
        self.snes_max_it = snes_max_it
        self.ksp_rtol = ksp_rtol
        self.ksp_max_it = ksp_max_it
        self.gmres_restart = gmres_restart


def _norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.vdot(l, l).real for l in leaves))


def _axpy(a, x, y):
    return jax.tree_util.tree_map(lambda xi, yi: a * xi + yi, x, y)


def newton_solve(residual_fn, u0, precond=None, params=None):
    """Solve ``residual_fn(u) = 0`` by Newton-GMRES.

    :arg residual_fn: pytree -> pytree (same structure)
    :arg u0: initial guess pytree
    :arg precond: linear operator approximating J^-1 (e.g. the inverse mass
        matrix); used as left preconditioner for GMRES
    :arg params: NewtonParameters
    :returns: solution pytree

    Differentiable: gradients flow via the implicit function theorem
    (``lax.custom_root``), not through the iteration.
    """
    params = params or NewtonParameters()

    def linsolve(matvec, b):
        # Left-precondition explicitly: solve (M A) x = M b unpreconditioned.
        # (jax.scipy gmres with M= mixes unpreconditioned atol with
        # preconditioned residual norms; when M rescales by ~detJ that stops
        # the iteration immediately.)
        if precond is not None:
            pa = lambda v: precond(matvec(v))  # noqa: E731
            pb = precond(b)
        else:
            pa, pb = matvec, b
        x, _ = gmres(
            pa,
            pb,
            tol=params.ksp_rtol,
            atol=0.0,
            restart=params.gmres_restart,
            maxiter=max(1, params.ksp_max_it // params.gmres_restart),
            solve_method="incremental",
        )
        return x

    def solve(f, x0):
        if params.snes_max_it == 1:
            # semi-implicit / Picard 'ksponly' path: single linear solve,
            # no outer loop (ref timeintegrator.py:186-211)
            fx, jvp_fn = jax.linearize(f, x0)
            du = linsolve(jvp_fn, jax.tree_util.tree_map(jnp.negative, fx))
            return _axpy(1.0, du, x0)

        def cond(carry):
            i, x, fx, rnorm, tol = carry
            return jnp.logical_and(i < params.snes_max_it, rnorm > tol)

        def body(carry):
            i, x, fx, rnorm, tol = carry
            _, jvp_fn = jax.linearize(f, x)
            du = linsolve(jvp_fn, jax.tree_util.tree_map(jnp.negative, fx))
            x_new = _axpy(1.0, du, x)
            fx_new = f(x_new)
            return i + 1, x_new, fx_new, _norm(fx_new), tol

        fx0 = f(x0)
        r0 = _norm(fx0)
        tol = jnp.maximum(params.snes_rtol * r0, params.snes_atol)
        _, x, _, _, _ = jax.lax.while_loop(cond, body, (0, x0, fx0, r0, tol))
        return x

    def tangent_solve(g, y):
        # g is linear: solve g(x) = y with the same Krylov machinery
        return linsolve(g, y)

    return jax.lax.custom_root(residual_fn, u0, solve, tangent_solve)


def linear_solve(matvec, b, precond=None, rtol=1e-7, restart=16, maxiter=3):
    """Preconditioned GMRES convenience wrapper (PETSc KSP analogue).
    Left-preconditions explicitly (see note in newton_solve)."""
    if precond is not None:
        pa = lambda v: precond(matvec(v))  # noqa: E731
        pb = precond(b)
    else:
        pa, pb = matvec, b
    x, _ = gmres(
        pa, pb, tol=rtol, atol=0.0, restart=restart,
        maxiter=maxiter, solve_method="incremental",
    )
    return x
