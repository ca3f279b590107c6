# Non-hydrostatic standing wave
# =============================
#
# Port of the reference's
# ``examples/nonhydrostatic_cases/standing_wave_nh/standing_wave_2d.py``:
# a deep-water standing wave (kH ~ 2.5) whose period follows the full
# tanh dispersion relation only when the non-hydrostatic pressure is
# solved — the dispersion test of the NH model.
import math
import os

import numpy as np

from thetis_tpu import *

lx, ly = 20.0, 2.0
nx, ny = 10, 1
mesh2d = RectangleMesh(nx, ny, lx, ly)
depth = 8.0
elev_amp = 0.1

P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").assign(depth)

g = float(physical_constants["g_grav"])
k = 2 * math.pi / lx
omega = math.sqrt(g * k * math.tanh(k * depth))
period = 2 * math.pi / omega

dt = 0.1
t_export = period / 4
t_end = 20.0
if os.environ.get("THETIS_REGRESSION_TEST"):
    t_end = 2 * period

solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
options = solver_obj.options
options.swe_timestepper_type = "CrankNicolson"
options.swe_timestepper_options.use_semi_implicit_linearization = False
options.timestep = dt
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.no_exports = True
options_nh = options.nh_model_options
options_nh.solve_nonhydrostatic_pressure = True
options_nh.update_free_surface = True
options_nh.free_surface_timestepper_type = "CrankNicolson"

solver_obj.create_equations()
elev_init = Function(P1_2d).interpolate(
    lambda x, y: elev_amp * np.cos(2 * np.pi * x / lx))
solver_obj.assign_initial_conditions(elev=elev_init)

if __name__ == "__main__":
    solver_obj.iterate()
    t = solver_obj.simulation_time
    x_dof = mesh2d.coords_np[mesh2d.cells_np][..., 0]
    anal = elev_amp * np.cos(2 * np.pi * x_dof / lx) * np.cos(omega * t)
    eta = np.asarray(solver_obj.fields.elev_2d.data)
    l2 = float(solver_obj.asm.norm_l2(eta - anal)) / math.sqrt(lx * ly)
    print_output(f"L2 error for surface elevation is {l2}")
    # the hydrostatic phase speed sqrt(gH) would be ~40% fast at kH=2.5:
    # matching the full dispersion relation to a few percent of the
    # amplitude after 2 periods is the NH signature
    assert l2 < 0.25 * elev_amp, l2
