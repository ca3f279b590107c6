# Idealised tidal channel in 3D
# =============================
#
# Port of the reference's ``examples/channel3d/channel3d.py``: a sloping
# channel forced by a tidal volume flux at the deep (ocean) end and a
# constant river flux at the shallow end — demonstrates time-dependent
# flux boundary conditions through the 3D mode-split solver.
import math
import os

import numpy as np

from thetis_tpu import *
from thetis_tpu.model.flowsolver3d import FlowSolver

n_layers = 6
lx, ly = 100e3, 3000.0
nx, ny = 80, 3
mesh2d = RectangleMesh(nx, ny, lx, ly)
t_end = 24 * 3600
t_export = 900.0
if os.environ.get("THETIS_REGRESSION_TEST"):
    t_end = 3 * t_export

depth_max, depth_min = 20.0, 7.0
P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").interpolate(
    lambda x, y: depth_max - (depth_max - depth_min) * x / lx
)

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
options.timestep = 35.0
options.no_exports = True

salt_init = 4.5
un_amp = -0.5
flux_amp = ly * depth_max * un_amp
t_tide = 12 * 3600.0
un_river = -0.3
flux_river = ly * depth_min * un_river
t_ramp = 12 * 3600.0

ocean_flux = Constant(0.0)
river_flux = Constant(0.0)
ocean_tag, river_tag = 1, 2
solver_obj.bnd_functions["shallow_water"] = {
    ocean_tag: {"flux": ocean_flux},
    river_tag: {"flux": river_flux},
}


def update_forcings(t_new):
    ramp = min(t_new / t_ramp, 1.0)
    ocean_flux.assign(
        (flux_amp * math.sin(2 * math.pi * t_new / t_tide) - flux_river)
        * ramp)
    river_flux.assign(flux_river * ramp)


solver_obj.assign_initial_conditions(salt=salt_init)

if __name__ == "__main__":
    solver_obj.iterate(update_forcings=update_forcings)
    s = np.asarray(solver_obj.fields.salt_3d.data)
    uv2 = np.asarray(solver_obj.fields.uv_2d.data)
    eta = np.asarray(solver_obj.fields.elev_2d.data)
    assert np.isfinite(s).all() and np.isfinite(uv2).all()
    # uniform salinity with equal-value inflow stays uniform
    assert np.abs(s - salt_init).max() < 1e-4
    # the tidal flux has set up flow and surface gradient
    assert np.abs(uv2).max() > 1e-3
    assert np.abs(eta).max() > 1e-4
    assert np.abs(eta).max() < 5.0
