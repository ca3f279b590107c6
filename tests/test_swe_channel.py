"""2D channel demo regression: validates the full SWE term set + CN stepper
against the reference's published demo trace (``demos/demo_2d_channel.py``
prints eta/uv L2 norms per export; values below are from that docstring).

This is the round-1 'minimum end-to-end slice' milestone of SURVEY.md
section 7 item 4."""
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thetis_tpu import RectangleMesh, FunctionSpace, Function, DGAssembler
from thetis_tpu.equations.shallowwater_2d import ShallowWaterEquations, swe_state
from thetis_tpu.timeintegration.steppers import get_stepper


def default_opts(**kw):
    o = SimpleNamespace(
        use_nonlinear_equations=True,
        use_wetting_and_drying=False,
        use_lax_friedrichs_velocity=True,
        use_grad_div_viscosity_term=False,
        use_grad_depth_viscosity_term=True,
        sipg_factor=1.0,
        norm_smoother=0.0,
    )
    for k, v in kw.items():
        setattr(o, k, v)
    return o


@pytest.fixture(scope="module")
def channel():
    lx, ly = 40e3, 2e3
    mesh = RectangleMesh(25, 2, lx, ly)
    V = FunctionSpace(mesh, "DG", 1)
    asm = DGAssembler(mesh, V)
    eq = ShallowWaterEquations(
        mesh, asm, default_opts(), bathymetry=20.0, bnd_conditions={}
    )
    elev0 = Function(V).interpolate(
        lambda x, y: 2.0 * jnp.exp(-(((x - lx / 2) / 4000.0) ** 2))
    )
    sol = swe_state(jnp.zeros((mesh.nc, 3, 2)), elev0.data)
    return mesh, asm, eq, sol


def test_initial_norm_matches_reference(channel):
    """Reference demo trace: initial eta norm 6251.2574."""
    _, asm, _, sol = channel
    assert float(asm.norm_l2(sol["elev"])) == pytest.approx(6251.2574, abs=0.01)


def test_crank_nicolson_demo_trace(channel):
    """March 6 CN steps (dt=50) and compare L2 norms with the reference's
    printed trace at T=100,200,300 (rel tol 2e-3: discretisation identical,
    solver tolerances differ)."""
    mesh, asm, eq, sol = channel
    stepper = get_stepper("CrankNicolson", eq, dt=50.0)
    fields = {"lax_friedrichs_velocity_scaling_factor": 1.0}

    @jax.jit
    def step(s):
        return stepper.advance(0.0, s, fields, fields, {})

    vol0 = float(asm.integrate(sol["elev"]))
    traces = {2: (5905.0262, 1398.1128), 4: (5193.5227, 2377.8512),
              6: (4656.5334, 2856.5165)}
    s = sol
    for i in range(1, 7):
        s = step(s)
        if i in traces:
            eta_ref, uv_ref = traces[i]
            assert float(asm.norm_l2(s["elev"])) == pytest.approx(
                eta_ref, rel=2e-3
            )
            assert float(asm.norm_l2(s["uv"])) == pytest.approx(uv_ref, rel=2e-3)
    # mass conservation in the closed basin
    vol = float(asm.integrate(s["elev"]))
    assert abs(vol - vol0) < 1e-6


def test_ssprk33_stability_and_conservation(channel):
    """Explicit SSPRK33 at CFL<1 stays stable and conserves volume."""
    mesh, asm, eq, sol = channel
    # effective CFL length ~ cell inradius (356 m) / ((2p+1) c) -> dt ~ 8 s
    stepper = get_stepper("SSPRK33", eq, dt=5.0)
    fields = {"lax_friedrichs_velocity_scaling_factor": 1.0}

    @jax.jit
    def step(s):
        return stepper.advance(0.0, s, fields, fields, {})

    vol0 = float(asm.integrate(sol["elev"]))
    s = sol
    for _ in range(20):
        s = step(s)
    eta_norm = float(asm.norm_l2(s["elev"]))
    assert np.isfinite(eta_norm) and eta_norm < 7000.0
    assert abs(float(asm.integrate(s["elev"])) - vol0) < 1e-6


def test_create_iterator():
    """Per-step generator API (ref ``solver2d.py:997-1076``): yields the
    simulation time each step and matches a plain iterate() run."""
    import numpy as np
    from thetis_tpu import RectangleMesh, FunctionSpace, Function, solver2d

    def build():
        lx = 20e3
        mesh2d = RectangleMesh(10, 2, lx, 4e3)
        p1 = FunctionSpace(mesh2d, "CG", 1)
        so = solver2d.FlowSolver2d(mesh2d, Function(p1).assign(20.0))
        o = so.options
        o.timestep = 50.0
        o.simulation_export_time = 200.0
        o.simulation_end_time = 400.0
        o.no_exports = True
        o.swe_timestepper_type = "CrankNicolson"
        e0 = Function(FunctionSpace(mesh2d, "DG", 1)).interpolate(
            lambda x, y: 0.4 * np.exp(-(((x - lx / 2) / 3e3) ** 2)))
        so.assign_initial_conditions(elev=e0)
        return so

    so_a = build()
    times = [t for t in so_a.create_iterator()]
    assert len(times) == 8
    assert times[-1] == pytest.approx(400.0)
    assert so_a.i_export == 2

    so_b = build()
    so_b.iterate()
    np.testing.assert_allclose(
        np.asarray(so_a.fields.elev_2d.data),
        np.asarray(so_b.fields.elev_2d.data), atol=1e-12)
