"""Adjoint memory checkpointing (``adjoint/checkpointing.py``) — the
analogue of the reference's pyadjoint tape checkpointing (ref
``solver2d.py:987-989`` / ``timeintegrator.py:67``).

Fast tier: sqrt-N remat must change neither the value nor the gradient of
a short differentiable forward run (bitwise-same arithmetic, identical
step graph).  Slow tier: a ~1000-step inversion-shaped gradient runs
with bounded activation memory and passes the Taylor test at the
reference's >1.9 acceptance (``test_adjoint/test_swe_adjoint.py:123``).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thetis_tpu import (
    RectangleMesh, FunctionSpace, Function, Constant, solver2d,
)
from thetis_tpu.adjoint import Control, ReducedFunctional, taylor_test
from thetis_tpu.adjoint.checkpointing import checkpointed_scan


def test_checkpointed_scan_matches_plain_scan():
    """Value and gradient of a nonlinear recurrence agree with lax.scan
    for every chunking (incl. a non-dividing chunk)."""
    def body(c):
        x, acc = c
        x = jnp.tanh(1.1 * x) + 0.01 * jnp.roll(x, 1)
        return x, acc + jnp.sum(x**2)

    x0 = jnp.linspace(-1.0, 1.0, 32)

    def J_plain(x0):
        c = jax.lax.scan(lambda c, _: (body(c), None),
                         (x0, 0.0), None, length=13)[0]
        return c[1]

    def J_ck(x0, chunk):
        return checkpointed_scan(body, (x0, 0.0), 13, chunk=chunk)[1]

    j0, g0 = jax.value_and_grad(J_plain)(x0)
    for chunk in (None, 1, 4, 5, 13, 40):
        j, g = jax.value_and_grad(lambda x: J_ck(x, chunk))(x0)
        np.testing.assert_allclose(np.asarray(j), np.asarray(j0), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g0), rtol=1e-10)


def _make_solver(n_steps, dt=3.0):
    lx, ly = 1e3, 400.0
    mesh2d = RectangleMesh(8, 4, lx, ly)
    P1 = FunctionSpace(mesh2d, "CG", 1)
    bath = Function(P1).assign(10.0)
    so = solver2d.FlowSolver2d(mesh2d, bath)
    o = so.options
    o.timestep = dt
    o.simulation_export_time = n_steps * dt
    o.simulation_end_time = n_steps * dt
    o.no_exports = True
    o.swe_timestepper_type = "CrankNicolson"
    so.bnd_functions["shallow_water"] = {
        1: {"un": Constant(-0.3)},
        2: {"elev": Constant(0.0)},
    }
    so.assign_initial_conditions(uv=jnp.asarray([0.3, 0.0]), elev=0.0)
    return so


@pytest.mark.slow
def test_forward_gradient_checkpoint_consistency():
    """differentiable_forward(checkpoint=...) reproduces the
    plain-scan gradient wrt a drag control."""
    n = 12
    so = _make_solver(n)

    def term(state):
        return jnp.sum(state["elev"] ** 2)

    c0 = jnp.full((so.mesh2d.nv,), 0.02)
    fwd_plain = so.differentiable_forward(
        ["manning_drag_coefficient"], terminal_functional=term,
        n_steps=n, checkpoint=False)
    fwd_ck = so.differentiable_forward(
        ["manning_drag_coefficient"], terminal_functional=term,
        n_steps=n, checkpoint=4)
    j0, g0 = jax.value_and_grad(fwd_plain)(c0)
    j1, g1 = jax.value_and_grad(fwd_ck)(c0)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-8, atol=1e-14)


@pytest.mark.slow
def test_long_inversion_gradient_bounded_memory():
    """~1000-step gradient with sqrt-N remat: the reverse pass must not
    hold all per-step activations (plain AD at this size would store
    1000x the step state).  Taylor rate >= 1.9 (reference acceptance)."""
    n = 1000
    so = _make_solver(n, dt=1.5)

    def term(state):
        return jnp.sum(state["elev"] ** 2) + jnp.sum(state["uv"] ** 2)

    fwd = so.differentiable_forward(
        ["manning_drag_coefficient"], terminal_functional=term, n_steps=n)
    c0 = jnp.full((so.mesh2d.nv,), 0.02)
    rf = ReducedFunctional(fwd, Control(c0))
    g = rf.derivative([c0])
    assert np.isfinite(np.asarray(g)).all()
    rng = np.random.RandomState(4)
    dc = jnp.asarray(rng.rand(so.mesh2d.nv))
    rate = taylor_test(rf, c0, dc, h0=1e-3)
    assert rate > 1.9, rate
