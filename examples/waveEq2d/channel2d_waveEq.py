# Wave equation in 2D
# ===================
#
# Port of the reference's ``examples/waveEq2d/channel2d_waveEq.py``: a
# standing wave in a rectangular basin solved with the linear wave
# equation; tests dispersion of surface waves and dissipation of the time
# integrator.
import os

import numpy as np

from thetis_tpu import *

lx = 44294.46
ly = 3000.0
nx, ny = 25, 2
mesh2d = RectangleMesh(nx, ny, lx, ly)
depth = 50.0
elev_amp = 1.0

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

solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
options = solver_obj.options
options.use_nonlinear_equations = False  # linear wave equation
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.no_exports = bool(os.environ.get("THETIS_REGRESSION_TEST"))
options.check_volume_conservation_2d = True
options.swe_timestepper_type = "CrankNicolson"
options.timestep = 10.0

solver_obj.create_equations()
elev_init = Function(solver_obj.function_spaces.H_2d).interpolate(
    lambda x, y: -elev_amp * np.cos(2 * np.pi * x / lx)
)
solver_obj.assign_initial_conditions(elev=elev_init)

if __name__ == "__main__":
    solver_obj.iterate()
    if os.environ.get("THETIS_REGRESSION_TEST"):
        # CN is non-dissipative: the standing wave's L2 amplitude must be
        # preserved to a few percent over a quarter period, and volume
        # conserved to roundoff
        eta = np.asarray(solver_obj.fields.elev_2d.data)
        assert np.isfinite(eta).all()
        area = lx * ly
        amp0 = elev_amp / np.sqrt(2.0)  # L2 mean of the cosine mode
        l2 = float(solver_obj.asm.norm_l2(solver_obj.fields.elev_2d.data))
        vol = float(solver_obj.compute_volume_2d())
        # total volume = depth*area + integral(eta); the wave conserves it
        assert abs(vol - depth * area) < 1e-6 * depth * area, vol
        # energy sloshes between eta and uv; bound total eta norm
        assert l2 / np.sqrt(area) <= amp0 * 1.05
