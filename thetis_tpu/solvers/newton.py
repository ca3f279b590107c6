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

__all__ = ["newton_solve", "NewtonParameters", "linear_solve"]


class NewtonParameters:
    """SNES/KSP-ish tolerances (cf. reference ``options.py`` solver_parameters
    dicts).  Hashable so it can ride as a static argument."""

    def __init__(self, snes_rtol=1e-8, snes_atol=1e-10, snes_max_it=8,
                 ksp_rtol=1e-7, ksp_max_it=48, gmres_restart=16,
                 line_search=False, dense=False, monitor_convergence=False):
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
        #: PETSc error_on_nonconvergence analogue: check the final Krylov
        #: residual after every solve and report divergence via
        #: jax.debug.print (a host callback — leave off in production TPU
        #: loops; the silent-divergence guard below is always on)
        self.monitor_convergence = monitor_convergence

    def _key(self):
        return (self.snes_rtol, self.snes_atol, self.snes_max_it,
                self.ksp_rtol, self.ksp_max_it, self.gmres_restart,
                self.line_search, self.dense, self.monitor_convergence)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, NewtonParameters) and self._key() == other._key()


def _norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.vdot(l, l).real for l in leaves))


def _axpy(a, x, y):
    return jax.tree_util.tree_map(lambda xi, yi: a * xi + yi, x, y)


def _fgmres_flat(mv, b, M, rtol, restart, max_cycles, allreduce=None):
    """Restarted *flexible* GMRES (FGMRES, right-preconditioned) on flat
    vectors: classic Arnoldi + small dense least-squares per cycle.

    Written in-house rather than via ``jax.scipy.sparse.linalg.gmres``
    for two reasons:

    * jax's gmres wraps ``lax.custom_linear_solve``, which eagerly builds
      a *transpose* of the operator — that rejects any preconditioner
      that is mathematically linear but computationally nonlinear.  The
      adjoint of the nonlinear solve is provided one level up by
      ``newton_solve``'s ``custom_vjp``, so the Krylov internals never
      need AD transposition.
    * iteratively-defined preconditioners (the inner-CG wave-equation
      Schur complement, ``solvers.schur``) are *nonlinear functions of
      their input* (Krylov step lengths are dot-product ratios), which
      standard GMRES cannot tolerate at all — FGMRES stores the
      preconditioned vectors Z_j = M(v_j) and reconstructs the solution
      from them (Saad 1993), exactly PETSc's ``-ksp_type fgmres``.

    The Arnoldi orthogonalisation is a dense (m+1, n) GEMV pair per
    iteration — MXU-friendly on TPU.  Convergence is monitored on the
    true (unpreconditioned) residual, as in PETSc's right-preconditioned
    norms.

    ``allreduce`` (optional) sums per-shard partial reductions across a
    device mesh (``lax.psum`` over the shard_map axis) -- the PETSc
    VecDot-allreduce analogue.  All dot products and norms route through
    it, so the SAME core runs the distributed assembled KSP inside
    shard_map (``parallel/assembled_sharded.py``); the small dense
    least-squares is computed redundantly (and identically) per device."""
    n = b.shape[0]
    m = int(restart)
    _sum = allreduce if allreduce is not None else (lambda x: x)

    def _norm(v):
        return jnp.sqrt(_sum(jnp.vdot(v, v).real))

    bnorm = _norm(b)
    # dtype-aware floors: a 1e-300 literal underflows to zero in f32 and
    # turns Arnoldi breakdown (exact convergence inside a cycle) into 0/0
    tiny = jnp.asarray(jnp.finfo(b.dtype).tiny, dtype=b.dtype)
    brk = jnp.asarray(jnp.finfo(b.dtype).eps, dtype=b.dtype)

    def cycle(carry):
        x, it, _ = carry
        r = b - mv(x)
        beta = _norm(r)
        V0 = jnp.zeros((m + 1, n), dtype=b.dtype)
        V0 = V0.at[0].set(r / jnp.maximum(beta, tiny))
        Z0 = jnp.zeros((m, n), dtype=b.dtype)
        H0 = jnp.zeros((m + 1, m), dtype=b.dtype)

        def arnoldi(j, VZH):
            V, Z, H = VZH
            z = M(V[j])
            w = mv(z)
            # Gram-Schmidt against all rows: rows > j are zero so their
            # contribution vanishes — static shapes for jit
            h = _sum(V @ w)                   # (m+1,)
            w = w - h @ V
            hj1 = _norm(w)
            # breakdown (Krylov space exhausted): keep a zero basis row
            # instead of dividing by ~0 — lstsq then ignores the column
            v_next = jnp.where(
                hj1 > brk * jnp.maximum(beta, tiny),
                w / jnp.maximum(hj1, tiny),
                jnp.zeros_like(w),
            )
            H = H.at[:, j].set(h).at[j + 1, j].set(hj1)
            V = V.at[j + 1].set(v_next)
            Z = Z.at[j].set(z)
            return V, Z, H

        V, Z, H = jax.lax.fori_loop(0, m, arnoldi, (V0, Z0, H0))
        e1 = jnp.zeros(m + 1, dtype=b.dtype).at[0].set(beta)
        # small (m+1, m) least squares (SVD-based: breakdown-safe — a
        # rank-deficient H from early Arnoldi termination just yields the
        # minimum-norm y)
        y = jnp.linalg.lstsq(H, e1)[0]
        x = x + y @ Z
        # projected residual estimate ||beta e1 - H y|| == ||b - A x|| in
        # exact arithmetic (A Z = V H with orthonormal V): saves the
        # end-of-cycle matvec; the next cycle restarts from the true
        # residual anyway
        rnorm = jnp.linalg.norm(e1 - H @ y)
        return x, it + 1, rnorm

    def cond(carry):
        _, it, rnorm = carry
        return jnp.logical_and(it < max_cycles, rnorm > rtol * bnorm)

    x0 = jnp.zeros_like(b)
    x, _, rnorm = jax.lax.while_loop(
        cond, cycle, (x0, 0, jnp.asarray(jnp.inf, dtype=b.dtype))
    )
    return x, rnorm, bnorm


def _linsolve(matvec, b, precond, params):
    """Right-preconditioned FGMRES solve of ``matvec(x) = b``."""
    if getattr(params, "dense", False):
        from jax.flatten_util import ravel_pytree

        b_flat, unravel = ravel_pytree(b)
        n = b_flat.shape[0]

        def mv_flat(v):
            return ravel_pytree(matvec(unravel(v)))[0]

        A = jax.vmap(mv_flat, in_axes=1, out_axes=1)(jnp.eye(n, dtype=b_flat.dtype))
        x_flat = jnp.linalg.solve(A, b_flat)
        return unravel(x_flat)
    from jax.flatten_util import ravel_pytree

    b_flat, unravel = ravel_pytree(b)

    def mv(v):
        return ravel_pytree(matvec(unravel(v)))[0]

    if precond is not None:
        M = lambda v: ravel_pytree(precond(unravel(v)))[0]  # noqa: E731
    else:
        M = lambda v: v  # noqa: E731

    x_flat, rnorm, bnorm = _fgmres_flat(
        mv, b_flat, M, params.ksp_rtol, params.gmres_restart,
        max(1, params.ksp_max_it // params.gmres_restart),
    )
    # Krylov divergence guard (PETSc raises on KSP_DIVERGED_DTOL when the
    # residual grows by divtol=1e4; under jit we poison the solution with
    # NaN instead — downstream isfinite checks and state printouts
    # surface it immediately instead of "physics" bugs).  Stagnation at
    # roundoff (rnorm ~ bnorm on a nearly-converged Picard sweep) is NOT
    # divergence.
    diverged = rnorm > 1e4 * jnp.maximum(bnorm,
                                         jnp.finfo(rnorm.dtype).tiny)
    if getattr(params, "monitor_convergence", False):
        jax.debug.print(
            "KSP final rel. residual {r} (diverged={d})",
            r=rnorm / jnp.maximum(bnorm, jnp.finfo(rnorm.dtype).tiny),
            d=diverged,
        )
    x_flat = jnp.where(diverged, jnp.nan, x_flat)
    return unravel(x_flat)


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
