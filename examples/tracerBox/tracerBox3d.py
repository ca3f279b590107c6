# Tracer box in 3D — ALE tracer-consistency check
# ===============================================
#
# Port of the reference's ``examples/tracerBox/tracerBox3d.py``: a large-
# amplitude standing wave on a sloped bathymetry with a CONSTANT tracer;
# on the moving sigma mesh the tracer must stay exactly constant (local
# and global conservation of the ALE scheme).
import os

import numpy as np

from thetis_tpu import *
from thetis_tpu.model.flowsolver3d import FlowSolver

lx = 44294.46
ly = 2000.0
nx, ny = 25, 2
mesh2d = RectangleMesh(nx, ny, lx, ly)
depth = 30.0
elev_amp = 2.0
n_layers = 12

P1_2d = FunctionSpace(mesh2d, "CG", 1)
# sloped bathymetry like the reference's 'sloped' variant
bathymetry_2d = Function(P1_2d, name="Bathymetry").interpolate(
    lambda x, y: depth + 15.0 * x / lx
)

c_wave = float(np.sqrt(9.81 * depth))
T_cycle = lx / c_wave
dt = round(T_cycle / 20)
t_export = dt
t_end = 10 * T_cycle + 1e-3
if os.environ.get("THETIS_REGRESSION_TEST"):
    t_end = 5 * t_export

solver_obj = FlowSolver(mesh2d, bathymetry_2d, n_layers)
options = solver_obj.options
options.timestepper_type = "SSPRK22"
options.solve_salinity = True
options.solve_temperature = False
options.use_implicit_vertical_diffusion = False
options.use_bottom_friction = False
options.use_baroclinic_formulation = False
options.use_limiter_for_tracers = True
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.timestep = 25.0
options.no_exports = True

solver_obj.create_equations()
x_dof = mesh2d.coords_np[mesh2d.cells_np][..., 0]
elev_init = -elev_amp * np.cos(2 * np.pi * x_dof / lx)
salt_const = 4.5
solver_obj.assign_initial_conditions(elev=np.asarray(elev_init),
                                     salt=salt_const)

if __name__ == "__main__":
    solver_obj.iterate()
    s = np.asarray(solver_obj.fields.salt_3d.data)
    assert np.isfinite(s).all()
    # the ALE consistency property: a uniform tracer stays uniform on the
    # moving mesh to solver tolerance
    assert np.abs(s - salt_const).max() < 1e-5, np.abs(s - salt_const).max()
