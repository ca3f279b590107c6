# Idealised estuary (Warner et al. 2005)
# ======================================
#
# Port of the reference's ``examples/idealizedEstuary/warnerEstuary.py``:
# a 100 km tidal estuary with a river inflow and an ocean salinity source
# develops a salt wedge whose position oscillates with the tide; tests
# baroclinic dynamics with wetting-free tidal forcing and GLS mixing.
import math
import os

import numpy as np

from thetis_tpu import *
from thetis_tpu.model.flowsolver3d import FlowSolver

lx, ly = 100.0e3, 1000.0
nx, ny = 50, 1
if os.environ.get("THETIS_REGRESSION_TEST"):
    nx = 25
mesh2d = RectangleMesh(nx, max(ny, 3), lx, 3 * 1000.0)
layers = 10 if not os.environ.get("THETIS_REGRESSION_TEST") else 6

depth_ocean, depth_river = 10.0, 5.0
P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").interpolate(
    lambda x, y: depth_ocean + (depth_river - depth_ocean) * x / lx
)

dt = 50.0
t_end = 20 * 24 * 3600.0
t_export = 900.0
if os.environ.get("THETIS_REGRESSION_TEST"):
    t_end = 3 * t_export

salt_ocean, salt_river = 30.0, 0.0
u_tide = 0.4
t_tide = 12 * 3600.0
u_river = -0.08

solver_obj = FlowSolver(mesh2d, bathymetry_2d, layers)
options = solver_obj.options
options.timestepper_type = "SSPRK22"
options.solve_salinity = True
options.solve_temperature = False
options.constant_temperature = 10.0
options.use_implicit_vertical_diffusion = True
options.use_bottom_friction = True
options.bottom_roughness = 0.005
options.use_baroclinic_formulation = True
options.use_limiter_for_tracers = True
options.use_turbulence = True
options.vertical_viscosity = 1e-5
options.vertical_diffusivity = 1e-5
options.horizontal_viscosity = 1.0
options.horizontal_diffusivity = 5.0
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.timestep = dt
options.no_exports = True

tide_flux = Constant(0.0)
river_flux = Constant(0.0)
area_ocean = 3e3 * depth_ocean
area_river = 3e3 * depth_river
solver_obj.bnd_functions["shallow_water"] = {
    1: {"flux": tide_flux},
    2: {"flux": river_flux},
}


def update_forcings(t_new):
    ramp = min(t_new / (6 * 3600.0), 1.0)
    tide_flux.assign(
        -u_tide * area_ocean * math.sin(2 * math.pi * t_new / t_tide) * ramp
    )
    river_flux.assign(-u_river * area_river * ramp)


solver_obj.create_equations()
x_dof = mesh2d.coords_np[mesh2d.cells_np][..., 0]
salt_init = np.clip(
    salt_ocean - (salt_ocean - salt_river) * (x_dof - 20e3) / 40e3,
    salt_river, salt_ocean,
)
solver_obj.assign_initial_conditions(salt=np.asarray(salt_init))

if __name__ == "__main__":
    solver_obj.iterate(update_forcings=update_forcings)
    s = np.asarray(solver_obj.fields.salt_3d.data)
    assert np.isfinite(s).all()
    # salinity stays in physical bounds (limiter + Patankar turbulence)
    assert s.min() > salt_river - 0.1 and s.max() < salt_ocean + 0.1
    tke = np.asarray(solver_obj.fields.tke_3d.data)
    assert np.isfinite(tke).all() and tke.min() >= 0.0
