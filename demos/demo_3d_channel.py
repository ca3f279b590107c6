# 3D tidal channel (idealised estuary)
# =====================================
#
# Port of the reference's ``demos/demo_3d_channel.py``: a 100 km tidal
# channel with sloping bathymetry (20 m ocean -> 7 m river), tidal volume
# flux at the ocean boundary, constant river discharge at the other end,
# and an along-channel salinity field (SSPRK22 two-stage ALE integrator).
import os

import numpy as np

from thetis_tpu import *
from thetis_tpu.model.flowsolver3d import FlowSolver

lx = 100e3
ly = 6e3
nx = 33
ny = 2
mesh2d = RectangleMesh(nx, ny, lx, ly)

P1_2d = FunctionSpace(mesh2d, "CG", 1)
depth_oce = 20.0
depth_riv = 7.0
bathymetry_2d = Function(P1_2d, name="Bathymetry").interpolate(
    lambda x, y: depth_oce - (depth_oce - depth_riv) * x / lx
)

n_layers = 6
solver_obj = FlowSolver(mesh2d, bathymetry_2d, n_layers)
options = solver_obj.options
options.timestepper_type = "SSPRK22"
options.use_implicit_vertical_diffusion = False
options.use_bottom_friction = False
options.use_baroclinic_formulation = False
options.solve_salinity = True
options.solve_temperature = False
options.constant_temperature = 10.0
options.timestep = 45.0
options.simulation_export_time = 900.0
options.simulation_end_time = 24 * 3600
if os.environ.get("THETIS_REGRESSION_TEST"):
    options.simulation_end_time = 900.0
options.no_exports = True

ocean_bnd_id = 1
river_bnd_id = 2
un_amp = -0.5          # tidal normal velocity amplitude (m/s)
flux_amp = ly * depth_oce * un_amp
t_tide = 12 * 3600.0   # tidal period (s)
un_river = -0.05       # river flow velocity (m/s)
flux_river = ly * depth_riv * un_river
t_ramp = 6 * 3600.0    # linear ramp-up of the boundary forcings


def ocean_flux_func(t):
    return (flux_amp * np.sin(2 * np.pi * t / t_tide)
            - flux_river) * min(t / t_ramp, 1.0)


def river_flux_func(t):
    return flux_river * min(t / t_ramp, 1.0)


ocean_flux = Constant(ocean_flux_func(0))
river_flux = Constant(river_flux_func(0))
solver_obj.bnd_functions["shallow_water"] = {
    ocean_bnd_id: {"flux": ocean_flux},
    river_bnd_id: {"flux": river_flux},
}

# initial salinity: 4.5 psu everywhere
solver_obj.assign_initial_conditions(salt=4.5)


def update_forcings(t_new):
    ocean_flux.assign(ocean_flux_func(t_new))
    river_flux.assign(river_flux_func(t_new))


solver_obj.iterate(update_forcings=update_forcings)
print_output(
    f"final salt range: {float(solver_obj.fields.salt_3d.data.min()):.3f}"
    f" .. {float(solver_obj.fields.salt_3d.data.max()):.3f}"
)
