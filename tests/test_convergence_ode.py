"""Temporal convergence of every time integrator on a 2x2 oscillator,
mirroring the reference's ``test/time_integration/test_convergence_ode.py``
(a pure-ODE problem built from custom terms; expected orders asserted
within a tolerance)."""
import pytest as _pytest

#: long-running integration tier: run with `pytest -m slow`
pytestmark = _pytest.mark.slow

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import stats

from thetis_tpu.timeintegration.steppers import get_stepper
from thetis_tpu.timeintegration.implicitexplicit import get_imex_stepper
from thetis_tpu.solvers.newton import NewtonParameters

OMEGA = 2.0


class OscillatorEquation:
    """du/dt = omega*v, dv/dt = -omega*u; exact solution rotation.
    The two components are tagged 'explicit'/'implicit' so IMEX schemes
    exercise both branches (cf. ref L15-45)."""

    def residual(self, label, sol, sol_old, fields, fields_old, bnd):
        if isinstance(label, str):
            labels = {"all": {"explicit", "implicit", "source", "nonlinear"}}.get(
                label, {label}
            )
        else:
            labels = set(label)
        u, v = sol["u"], sol["v"]
        r_u = jnp.zeros_like(u)
        r_v = jnp.zeros_like(v)
        if "explicit" in labels:
            r_u = r_u + OMEGA * v
        if "implicit" in labels:
            r_v = r_v - OMEGA * u
        return {"u": r_u, "v": r_v}

    def mass_term(self, sol):
        return dict(sol)

    def mass_inverse(self, r):
        return dict(r)


def run(stepper_name, n, imex=False):
    eq = OscillatorEquation()
    T = 2.0
    dt = T / n
    params = NewtonParameters(snes_rtol=1e-13, snes_atol=1e-15,
                              ksp_rtol=1e-13, snes_max_it=20)
    kw = {}
    if stepper_name in ("CrankNicolson", "BackwardEuler", "DIRK22", "DIRK23",
                        "DIRK33", "DIRK43", "DIRKLSPUM2", "DIRKLPUM2",
                        "ESDIRKMidpoint", "ESDIRKTrapezoid",
                        "ImplicitMidpoint"):
        kw["solver_parameters"] = params
    if imex:
        stepper = get_imex_stepper(stepper_name, eq, dt,
                                   solver_parameters=params)
    else:
        stepper = get_stepper(stepper_name, eq, dt, **kw)
    import jax

    step = jax.jit(lambda s: stepper.advance(0.0, s, {}, {}, {}))
    sol = {"u": jnp.asarray([1.0]), "v": jnp.asarray([0.0])}
    for _ in range(n):
        sol = step(sol)
    exact_u = np.cos(OMEGA * T)
    exact_v = -np.sin(OMEGA * T)
    return float(
        np.hypot(float(sol["u"][0]) - exact_u, float(sol["v"][0]) - exact_v)
    )


@pytest.mark.parametrize(
    "name,expected,imex",
    [
        ("ForwardEuler", 1.0, False),
        ("BackwardEuler", 1.0, False),
        ("CrankNicolson", 2.0, False),
        ("SSPRK33", 3.0, False),
        ("DIRK22", 2.0, False),
        ("DIRK23", 3.0, False),
        ("DIRK33", 3.0, False),
        ("DIRK43", 3.0, False),
        ("DIRKLSPUM2", 2.0, False),
        ("DIRKLPUM2", 2.0, False),
        ("ImplicitMidpoint", 2.0, False),
        ("ESDIRKMidpoint", 2.0, False),
        ("ESDIRKTrapezoid", 2.0, False),
        ("ERKMidpoint", 2.0, False),
        ("ERKLSPUM2", 2.0, False),
        ("ERKLPUM2", 2.0, False),
        ("SSPIMEX", 2.0, False or True),
        ("IMEXLSPUM2", 2.0, True),
        ("IMEXMidpoint", 2.0, True),
        ("IMEXEuler", 1.0, True),
    ],
)
def test_ode_convergence(name, expected, imex):
    ns = [16, 32, 64]
    errs = [run(name, n, imex=imex or name == "SSPIMEX") for n in ns]
    slope = stats.linregress(np.log(ns), np.log(errs)).slope
    order = -slope
    print(f"{name}: errors {errs} order {order:.2f}")
    assert order > expected - 0.25, f"{name} order {order} < {expected}"


def test_butcher_to_shuosher():
    """Shu-Osher conversion (ref ``rungekutta.py:13-87``): SSPRK33 yields
    the classic Shu-Osher coefficients; a DIRK tableau satisfies the
    defining identity."""
    from thetis_tpu.timeintegration.rungekutta import (
        SCHEMES, butcher_to_shuosher_form,
    )

    tb = SCHEMES["SSPRK33"]()
    alpha, beta = butcher_to_shuosher_form(tb.a, tb.b)
    np.testing.assert_allclose(alpha, [
        [1.0, 0.0, 0.0, 0.0],
        [1.0, 0.0, 0.0, 0.0],
        [0.75, 0.25, 0.0, 0.0],
        [1.0 / 3.0, 0.0, 2.0 / 3.0, 0.0],
    ], atol=1e-12)
    np.testing.assert_allclose(beta, [
        [0.0, 0.0, 0.0, 0.0],
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 0.25, 0.0, 0.0],
        [0.0, 0.0, 2.0 / 3.0, 0.0],
    ], atol=1e-12)

    tb2 = SCHEMES["DIRK33"]()
    a2, b2 = butcher_to_shuosher_form(tb2.a, tb2.b)
    stacked = np.vstack((tb2.a, tb2.b))
    np.testing.assert_allclose(a2.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(
        b2[:, 1:], stacked - a2[:, 1:] @ tb2.a, atol=1e-12)
