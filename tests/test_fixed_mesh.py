"""Fixed-mesh (non-ALE) 3D mode (ref ``options.py:1074``
``use_ale_moving_mesh=False``) and the global 2D
``use_tracer_conservative_form`` trait (ref ``options.py:870``)."""
import numpy as np
import pytest

from thetis_tpu import RectangleMesh, FunctionSpace, Function
from thetis_tpu.model.flowsolver3d import FlowSolver
from thetis_tpu.model.options import ModelOptions2d


@pytest.mark.slow
def test_fixed_mesh_barotropic_wave():
    """A small-amplitude barotropic wave on the frozen mesh stays finite
    and tracks the ALE solution to O(eta/H)."""
    lx, depth = 20e3, 20.0
    outs = {}
    for ale in (True, False):
        mesh2d = RectangleMesh(12, 2, lx, 4e3)
        P1 = FunctionSpace(mesh2d, "CG", 1)
        so = FlowSolver(mesh2d, Function(P1).assign(depth), 4)
        o = so.options
        o.timestep = 30.0
        o.simulation_export_time = 300.0
        o.simulation_end_time = 300.0
        o.no_exports = True
        o.solve_salinity = False
        o.solve_temperature = False
        o.use_baroclinic_formulation = False
        o.use_implicit_vertical_diffusion = False
        o.use_bottom_friction = False
        o.horizontal_viscosity = 1.0
        o.use_ale_moving_mesh = ale
        elev0 = Function(P1).interpolate(
            lambda x, y: 0.05 * np.exp(-(((x - lx / 2) / 3e3) ** 2)))
        so.assign_initial_conditions(elev=elev0)
        so.iterate()
        outs[ale] = (np.asarray(so.fields.elev_2d.data),
                     np.asarray(so.fields.uv_3d.data))
    e_ale, e_fix = outs[True][0], outs[False][0]
    assert np.isfinite(e_fix).all() and np.isfinite(outs[False][1]).all()
    scale = np.abs(e_ale).max()
    # amplitude 0.05 on 20 m depth: mesh-motion effect is O(0.25%)
    assert np.abs(e_fix - e_ale).max() < 0.05 * scale


def test_tracer_conservative_form_trait():
    o = ModelOptions2d()
    o.add_tracer_2d("a_2d")
    assert o.tracer["a_2d"].use_conservative_form is False
    o.use_tracer_conservative_form = True
    o.add_tracer_2d("b_2d")
    assert o.tracer["b_2d"].use_conservative_form is True
    # explicit per-tracer override wins
    o.add_tracer_2d("c_2d", use_conservative_form=False)
    assert o.tracer["c_2d"].use_conservative_form is False
