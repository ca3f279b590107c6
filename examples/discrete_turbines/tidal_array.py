# Discrete tidal turbine array (AR1500 + AR2000)
# ==============================================
#
# Port of the reference's ``examples/discrete_turbines/tidal_array.py``:
# two arrays of discrete turbines with tabulated AR2000 thrust/power
# curves (cut-in 1 m/s, rated 3.05 m/s, cut-out 5 m/s), support-structure
# drag, rotor shear-profile averaging and an upwind velocity correction;
# flow ramps up to steady in a channel and the farm power is integrated
# by TurbineFunctionalCallback.  (The headland geometry is replaced by a
# straight channel — the turbine physics is identical.)
import os

import numpy as np

from thetis_tpu import *
from thetis_tpu.model.turbines import (
    DiscreteTidalTurbineFarmOptions, TurbineFunctionalCallback,
)

lx, ly = 2000.0, 600.0
nx, ny = 100, 30
mesh2d = RectangleMesh(nx, ny, lx, ly)

t_end = 1.5 * 3600
t_export = 200.0
if os.environ.get("THETIS_REGRESSION_TEST"):
    t_end = 5 * t_export

P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").assign(50.0)
# viscosity sponge at the inflow
h_viscosity = Function(P1_2d).interpolate(
    lambda x, y: np.where(x <= 50.0, 51.0 - x, 1.0))

speeds_AR2000 = [0., 0.75, 0.85, 0.95, 1., 3.05, 3.3, 3.55, 3.8, 4.05,
                 4.3, 4.55, 4.8, 5., 5.001, 5.05, 5.25, 5.5, 5.75, 6.0,
                 6.25, 6.5, 6.75, 7.0]
powers_AR2000 = [0.0105, 0.032, 0.0385, 0.116, 0.437, 0.437, 0.345,
                 0.277, 0.226, 0.187, 0.156, 0.132, 0.112, 0.0993,
                 0.0595, 0.0051, 0.00151, 0.000889, 0.000652, 0.000523,
                 0.000441, 0.000384, 0.000341, 0.000308]
thrusts_AR2000 = [0.010531, 0.032281, 0.038951, 0.119951, 0.516484,
                  0.516484, 0.387856, 0.302601, 0.242037, 0.197252,
                  0.16319, 0.136716, 0.115775, 0.102048, 0.060513,
                  0.005112, 0.00151, 0.00089, 0.000653, 0.000524,
                  0.000442, 0.000384, 0.000341, 0.000308]

physical_constants["rho0"] = 1026.0

farm_AR2000 = DiscreteTidalTurbineFarmOptions()
farm_AR2000.turbine_type = "table"
farm_AR2000.turbine_options.thrust_speeds = speeds_AR2000
farm_AR2000.turbine_options.thrust_coefficients = thrusts_AR2000
farm_AR2000.turbine_options.power_coefficients = powers_AR2000
farm_AR2000.turbine_options.C_support = 0.7
farm_AR2000.turbine_options.A_support = 2.6 * 14.0
farm_AR2000.turbine_options.diameter = 20
farm_AR2000.upwind_correction = True
farm_AR2000.turbine_options.apply_shear_profile = True
farm_AR2000.turbine_options.structure_type = "bottom-fixed"
farm_AR2000.turbine_options.rel_hub_height = 14.0
farm_AR2000.turbine_coordinates = [
    [x, y] for x in np.arange(1000, 1061, 60)
    for y in np.arange(260, 341, 40)
]

farm_AR1500 = DiscreteTidalTurbineFarmOptions()
farm_AR1500.turbine_type = "constant"
farm_AR1500.turbine_options.diameter = 18
farm_AR1500.turbine_options.thrust_coefficient = 0.6
farm_AR1500.turbine_options.power_coefficient = 0.55
farm_AR1500.turbine_options.apply_shear_profile = True
farm_AR1500.turbine_options.rel_hub_height = 13.5
farm_AR1500.turbine_coordinates = [
    [940.0, y] for y in np.arange(260, 341, 40)]

solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
options = solver_obj.options
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.no_exports = True
options.check_volume_conservation_2d = True
options.quadratic_drag_coefficient = Constant(0.0025)
options.swe_timestepper_type = "CrankNicolson"
options.swe_timestepper_options.implicitness_theta = 0.5
options.horizontal_viscosity = h_viscosity
options.timestep = 50.0
options.discrete_tidal_turbine_farms["everywhere"] = [
    farm_AR1500, farm_AR2000]

# inflow ramps to 2.5 m/s
inflow_vel = Constant(0.0)
solver_obj.bnd_functions["shallow_water"] = {
    1: {"un": inflow_vel},
    2: {"elev": Constant(0.0)},
}


def update_forcings(t_new):
    inflow_vel.assign(-2.5 * min(t_new / 500.0, 1.0))


solver_obj.assign_initial_conditions()
cb = TurbineFunctionalCallback(solver_obj)
solver_obj.add_callback(cb, "timestep")

if __name__ == "__main__":
    solver_obj.iterate(update_forcings=update_forcings)
    uv = np.asarray(solver_obj.fields.uv_2d.data)
    assert np.isfinite(uv).all()
    power = sum(cb.average_power)
    # 12 turbines in ~2.4 m/s flow: farm output must be O(MW) and finite
    assert power > 1e5, power
    assert power < 1e8, power
    # the wake: velocity behind the farm is slower than the inflow
    x_dof = mesh2d.coords_np[mesh2d.cells_np][..., 0]
    speed = np.sqrt((uv**2).sum(-1))
    wake = speed[(x_dof > 1100) & (x_dof < 1300)].mean()
    free = speed[(x_dof > 400) & (x_dof < 800)].mean()
    assert wake < free, (wake, free)
