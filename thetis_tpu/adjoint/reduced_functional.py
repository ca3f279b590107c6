"""Adjoint machinery: pyadjoint-shaped API on top of ``jax.grad``.

The reference threads pyadjoint taping through every solver layer
(``ad_block_tag`` on each solve, tape replay + transposed PETSc solves;
SURVEY.md section 2.8/3.5).  Here the whole time loop is a differentiable pure
function: reverse-mode AD through ``lax.scan`` steps gives the discrete
adjoint, and implicit stages contribute transposed-Jacobian solves through
``lax.custom_root``'s tangent_solve — the exact analogue of adjoint PETSc
solves, at machine precision.

API mirrors pyadjoint as used in the reference's examples/tests:
``ReducedFunctional(J_fn, controls)``, ``taylor_test``, ``minimize``.
"""
import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["Control", "ReducedFunctional", "taylor_test", "minimize"]


class Control:
    """Marks an array as an optimisation control (pyadjoint.Control
    analogue); holds the current value."""

    def __init__(self, value, name=None):
        from ..fem.functionspace import Function
        from ..utils.constant import Constant

        if isinstance(value, Function):
            value = value.data
        elif isinstance(value, Constant):
            value = value.value
        self.value = jnp.asarray(value)
        self.name = name

    @property
    def shape(self):
        return self.value.shape


class ReducedFunctional:
    """J as a function of controls, with gradients by reverse-mode AD.

    :arg forward: callable ``forward(*control_arrays) -> scalar`` — the
        whole (differentiable) forward model + functional
    :arg controls: Control or list of Controls
    """

    def __init__(self, forward, controls, derivative_cb_post=None, scale=1.0,
                 eval_cb_pre=None, eval_cb_post=None, derivative_cb_pre=None):
        self.forward = forward
        self.controls = (
            list(controls) if isinstance(controls, (list, tuple)) else [controls]
        )
        self.scale = scale
        self.derivative_cb_post = derivative_cb_post
        self.derivative_cb_pre = derivative_cb_pre
        self.eval_cb_pre = eval_cb_pre
        self.eval_cb_post = eval_cb_post
        self._jit_value = jax.jit(self._value_fn)
        self._jit_vg = jax.jit(jax.value_and_grad(self._value_fn, argnums=tuple(
            range(len(self.controls))
        )))
        self._latest = tuple(c.value for c in self.controls)

    def _value_fn(self, *values):
        return self.scale * self.forward(*values)

    def _coerce(self, values):
        if values is None:
            return self._latest
        if not isinstance(values, (list, tuple)):
            values = [values]
        return tuple(jnp.asarray(getattr(v, "value", getattr(v, "data", v)))
                     for v in values)

    def __call__(self, values=None):
        values = self._coerce(values)
        self._latest = values
        if self.eval_cb_pre is not None:
            self.eval_cb_pre(values)
        j = float(self._jit_value(*values))
        if self.eval_cb_post is not None:
            self.eval_cb_post(j, values)
        return j

    def derivative(self, values=None):
        values = self._coerce(values)
        if self.derivative_cb_pre is not None:
            self.derivative_cb_pre(values)
        j, grads = self._jit_vg(*values)
        if self.derivative_cb_post is not None:
            self.derivative_cb_post(float(j), grads, values)
        return grads if len(self.controls) > 1 else grads[0]

    def value_and_derivative(self, values=None):
        values = self._coerce(values)
        if self.eval_cb_pre is not None:
            self.eval_cb_pre(values)
        j, grads = self._jit_vg(*values)
        j = float(j)
        if self.eval_cb_post is not None:
            self.eval_cb_post(j, values)
        if self.derivative_cb_post is not None:
            self.derivative_cb_post(j, grads, values)
        return j, (grads if len(self.controls) > 1 else grads[0])


def taylor_test(rf, c, dc, n=4, h0=1e-2):
    """Second-order Taylor remainder convergence test
    (pyadjoint.taylor_test analogue; reference acceptance: rate > 1.9,
    ``test_adjoint/test_swe_adjoint.py:123``).

    Checks |J(c+h dc) - J(c) - h dJ.dc| = O(h^2); returns the minimum
    observed convergence rate.
    """
    c = jnp.asarray(getattr(c, "value", getattr(c, "data", c)))
    dc = jnp.asarray(getattr(dc, "value", getattr(dc, "data", dc)))
    J0 = rf([c])
    g = rf.derivative([c])
    gdotdc = float(jnp.vdot(g, dc).real)
    hs = [h0 / 2**i for i in range(n)]
    remainders = []
    for h in hs:
        Jh = rf([c + h * dc])
        remainders.append(abs(Jh - J0 - h * gdotdc))
    remainders = np.maximum(np.asarray(remainders), 1e-300)
    rates = np.log(remainders[:-1] / remainders[1:]) / np.log(2.0)
    print("taylor_test remainders:", remainders, "rates:", rates)
    return float(rates.min())


def minimize(rf, method="L-BFGS-B", bounds=None, options=None, callback=None):
    """Minimise a ReducedFunctional with scipy (the reference's
    pyadjoint.minimize path, ``inversion_tools.py:504-530``)."""
    from scipy import optimize as sciopt

    shapes = [tuple(c.shape) for c in rf.controls]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]

    def unpack(x):
        out = []
        ofs = 0
        for shp, sz in zip(shapes, sizes):
            out.append(jnp.asarray(x[ofs:ofs + sz].reshape(shp)))
            ofs += sz
        return out

    def fun(x):
        vals = unpack(x)
        j, grads = rf.value_and_derivative(vals)
        if len(rf.controls) == 1:
            grads = [grads]
        g = np.concatenate([np.asarray(gi).ravel() for gi in grads])
        return j, g

    x0 = np.concatenate(
        [np.asarray(c.value).ravel() for c in rf.controls]
    )
    if bounds is not None and not isinstance(bounds, sciopt.Bounds):
        # accepted forms: scipy-style [(lb, ub), ...] (one pair per
        # control entry — takes precedence in the ambiguous n == 2
        # case), pyadjoint-style [lb_list, ub_list], or a single
        # (lb, ub) pair broadcast over all controls
        bounds = np.asarray(bounds, dtype=float)
        if bounds.ndim == 1 and len(bounds) == 2:
            bounds = [(bounds[0], bounds[1])] * len(x0)
        elif bounds.ndim == 2 and bounds.shape == (len(x0), 2):
            bounds = [tuple(b) for b in bounds]
        elif bounds.shape == (2, len(x0)):
            bounds = list(zip(bounds[0], bounds[1]))
    res = sciopt.minimize(
        fun, x0, jac=True, method=method, bounds=bounds,
        options=options or {}, callback=callback,
    )
    vals = unpack(res.x)
    return vals if len(rf.controls) > 1 else vals[0]
