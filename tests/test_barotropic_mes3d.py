"""3D barotropic standing-wave convergence (MES).

Analogue of the reference's ``test/solver3d/test_barotropic_mes.py``: a
barotropic standing wave in a closed rectangular basin run for one full
cycle with the coupled mode-split integrator; the final elevation must
return to the initial condition with an L2 error converging at order 2
(P1DG in space, SSPRK22/trapezoid in time at fixed Courant number).

This exercises the full split_residual 2D<->3D coupling path
(ref ``coupled_timeintegrator.py:43-71``, ``shallowwater_eq.py:931-976``).
"""
import pytest as _pytest

#: long-running integration tier: run with `pytest -m slow`
pytestmark = _pytest.mark.slow

import numpy as np
import pytest
from scipy import stats

from thetis_tpu import RectangleMesh, FunctionSpace, Function
from thetis_tpu.config import physical_constants
from thetis_tpu.model.flowsolver3d import FlowSolver


def run(refinement, timestepper_type="SSPRK22"):
    g = float(physical_constants["g_grav"])
    depth = 100.0
    c_wave = np.sqrt(g * depth)
    lx = 60000.0
    nx = 10 * refinement
    ny = 1
    ly = lx / nx
    n_layers = 2 * refinement
    elev_amp = 0.01

    mesh2d = RectangleMesh(nx, ny, lx, ly)
    P1 = FunctionSpace(mesh2d, "CG", 1)
    bath = Function(P1).assign(depth)

    T_cycle = lx / c_wave
    n_steps = 10 * refinement  # fixed Courant: dt ~ dx
    dt = T_cycle / n_steps

    so = FlowSolver(mesh2d, bath, n_layers)
    o = so.options
    o.timestep = dt
    o.simulation_export_time = T_cycle
    o.simulation_end_time = T_cycle - 1e-9
    o.no_exports = True
    o.timestepper_type = timestepper_type
    o.use_baroclinic_formulation = False
    o.solve_salinity = False
    o.solve_temperature = False
    o.use_implicit_vertical_diffusion = False
    o.use_bottom_friction = False

    V = FunctionSpace(mesh2d, "DG", 1)
    elev0 = Function(V).interpolate(
        lambda x, y: -elev_amp * np.cos(2 * np.pi * x / lx)
    )
    so.assign_initial_conditions(elev=elev0)
    so.iterate()

    asm = so.asm
    area = lx * ly
    diff = np.asarray(so.fields.elev_2d.data) - np.asarray(elev0.data)
    elev_err = float(asm.norm_l2(diff)) / np.sqrt(area)
    uv_err = float(asm.norm_l2(so.fields.uv_2d.data)) / np.sqrt(area)
    return elev_err, uv_err


@pytest.mark.parametrize("timestepper_type", ["SSPRK22"])
def test_barotropic_standing_wave_mes(timestepper_type):
    refs = [1, 2, 4]
    errs = [run(r, timestepper_type) for r in refs]
    x_log = np.log10(1.0 / np.asarray(refs, dtype=float))
    y_elev = np.log10(np.asarray([e[0] for e in errs]))
    slope, *_ = stats.linregress(x_log, y_elev)
    expected = 2.0
    assert slope > expected * (1 - 0.12), (
        f"elevation convergence {slope:.3f} < {expected}; errors={errs}"
    )
    # velocity returns to rest within discretisation error of the
    # elevation signal (u scale = A*sqrt(g/H))
    u_scale = 0.01 * np.sqrt(9.81 / 100.0)
    assert errs[-1][1] < 0.35 * u_scale
