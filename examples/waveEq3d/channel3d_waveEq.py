# Wave equation in 3D
# ===================
#
# Port of the reference's ``examples/waveEq3d/channel3d_waveEq.py``: a
# barotropic standing wave run through the 3D mode-split solver — tests
# dispersion, dissipation and the 2D-3D coupling.
import os

import numpy as np

from thetis_tpu import *
from thetis_tpu.model.flowsolver3d import FlowSolver

lx = 44294.46
ly = 3000.0
nx, ny = 25, 2
mesh2d = RectangleMesh(nx, ny, lx, ly)
depth = 50.0
elev_amp = 1.0
n_layers = 6

P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").assign(depth)

c_wave = float(np.sqrt(9.81 * depth))
T_cycle = lx / c_wave
n_steps = 20
dt = round(T_cycle / n_steps)
t_export = dt
t_end = 10 * T_cycle + 1e-3
if os.environ.get("THETIS_REGRESSION_TEST"):
    t_end = 5 * t_export

solver_obj = FlowSolver(mesh2d, bathymetry_2d, n_layers)
options = solver_obj.options
options.timestepper_type = "SSPRK22"
options.use_nonlinear_equations = False
options.solve_salinity = False
options.solve_temperature = False
options.use_implicit_vertical_diffusion = False
options.use_bottom_friction = False
options.use_baroclinic_formulation = False
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.timestep = 25.0
options.no_exports = True

solver_obj.create_equations()
x_dof = mesh2d.coords_np[mesh2d.cells_np][..., 0]
elev_init = -elev_amp * np.cos(2 * np.pi * x_dof / lx)
solver_obj.assign_initial_conditions(elev=np.asarray(elev_init))

if __name__ == "__main__":
    solver_obj.iterate()
    eta = np.asarray(solver_obj.fields.elev_2d.data)
    assert np.isfinite(eta).all()
    # standing wave: amplitude bounded by the initial amplitude (plus a
    # small dispersive tolerance)
    assert np.abs(eta).max() < 1.3 * elev_amp
    if os.environ.get("THETIS_REGRESSION_TEST"):
        # after 5/20 of a period the wave must still be in motion
        uv2 = np.asarray(solver_obj.fields.uv_2d.data)
        assert np.abs(uv2).max() > 1e-3
