"""Options that previously could be silently ignored must now act:
simulation_end_date, log_output, export_diagnostics,
tracer_picard_iterations (the sediment-slide options are covered by
``test_sediment.py``)."""
import datetime
import os

import numpy as np
import jax.numpy as jnp
import pytest

from thetis_tpu import (
    RectangleMesh, FunctionSpace, Function, solver2d,
)


def _channel(tmpdir, **opts):
    mesh2d = RectangleMesh(8, 4, 1e4, 5e3)
    p1 = FunctionSpace(mesh2d, "CG", 1)
    b = Function(p1).assign(20.0)
    so = solver2d.FlowSolver2d(mesh2d, b)
    o = so.options
    o.timestep = 20.0
    o.simulation_export_time = 100.0
    o.simulation_end_time = 200.0
    o.output_directory = str(tmpdir)
    o.swe_timestepper_type = "CrankNicolson"
    for k, v in opts.items():
        setattr(o, k, v)
    x = mesh2d.coords_np[mesh2d.cells_np][..., 0]
    so.assign_initial_conditions(elev=jnp.asarray(
        0.1 * np.cos(np.pi * x / 1e4)))
    return so


def test_simulation_end_date_overrides_end_time(tmp_path):
    tz = datetime.timezone.utc
    init = datetime.datetime(2026, 1, 1, tzinfo=tz)
    so = _channel(
        tmp_path, no_exports=True,
        simulation_initial_date=init,
        simulation_end_date=init + datetime.timedelta(seconds=300.0),
    )
    so.iterate()
    assert so.options.simulation_end_time == 300.0
    assert abs(so.simulation_time - 300.0) < 1e-6


def test_log_output_and_export_diagnostics(tmp_path):
    so = _channel(
        tmp_path, log_output=True, export_diagnostics=True,
        check_volume_conservation_2d=True,
    )
    so.iterate()
    assert os.path.exists(os.path.join(str(tmp_path), "log"))
    assert os.path.exists(
        os.path.join(str(tmp_path), "diagnostic_volume2d.hdf5")
    )


def test_no_exports_suppresses_diagnostics(tmp_path):
    so = _channel(
        tmp_path, no_exports=True, export_diagnostics=True,
        check_volume_conservation_2d=True,
    )
    so.iterate()
    assert not os.path.exists(
        os.path.join(str(tmp_path), "diagnostic_volume2d.hdf5")
    )


@pytest.mark.slow
def test_tracer_picard_iterations_run_and_converge(tmp_path):
    """Picard sweeps re-linearize the semi-implicit tracer solve at the
    previous iterate (ref ``coupled_timeintegrator_2d.py:115-135``).
    The 2D tracer system is linear in the tracer for fixed (uv, eta), so
    the Picard iteration must be CONVERGED after one sweep: p = 2, 3
    must run the extra sweeps and reproduce the p = 1 trajectory to
    Krylov tolerance (in the reference the extra sweeps matter only
    through inter-system field coupling)."""
    def run(p):
        mesh2d = RectangleMesh(12, 4, 1e4, 5e3)
        p1 = FunctionSpace(mesh2d, "CG", 1)
        b = Function(p1).assign(20.0)
        so = solver2d.FlowSolver2d(mesh2d, b)
        o = so.options
        o.timestep = 50.0
        o.simulation_export_time = 200.0
        o.simulation_end_time = 200.0
        o.no_exports = True
        o.swe_timestepper_type = "CrankNicolson"
        o.tracer_timestepper_type = "CrankNicolson"
        o.tracer_picard_iterations = p
        o.add_tracer_2d("tracer_2d", "Tracer", "Tracer2d", "tracer_2d",
                        use_conservative_form=True)
        o.horizontal_diffusivity = 1.0
        x = mesh2d.coords_np[mesh2d.cells_np][..., 0]
        so.assign_initial_conditions(
            elev=jnp.asarray(0.5 * np.cos(np.pi * x / 1e4)),
            tracer_2d=jnp.asarray(1.0 + np.exp(
                -(((x - 5e3) / 2e3) ** 2))),
        )
        so.iterate()
        return np.asarray(so.fields.tracer_2d.data)

    c1, c2, c3 = run(1), run(2), run(3)
    assert np.isfinite(c2).all() and np.isfinite(c3).all()
    np.testing.assert_allclose(c2, c1, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(c3, c1, rtol=1e-6, atol=1e-9)

    # a non-CN tracer stepper must reject picard loudly
    mesh2d = RectangleMesh(8, 4, 1e4, 5e3)
    so = solver2d.FlowSolver2d(
        mesh2d, Function(FunctionSpace(mesh2d, "CG", 1)).assign(20.0))
    o = so.options
    o.timestep = 10.0
    o.simulation_export_time = 20.0
    o.simulation_end_time = 20.0
    o.no_exports = True
    o.tracer_timestepper_type = "SSPRK33"
    o.tracer_picard_iterations = 2
    o.add_tracer_2d("tracer_2d", "Tracer", "Tracer2d", "tracer_2d")
    with pytest.raises(NotImplementedError):
        so.assign_initial_conditions(elev=0.0, tracer_2d=1.0)
        so.iterate()
