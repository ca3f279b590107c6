# Baroclinic channel (Danilov 2012) — the BASELINE.md north-star case
# ====================================================================
#
# Port of the reference's ``examples/baroclinic_channel/baroclinic_channel.py``:
# a 1600x1600 km x-periodic beta-plane channel, 1600 m deep, with a zonal
# temperature front (dT/dy = -5e-6 degC/m, dT/dz = 8.2e-3 degC/m, max 25 degC)
# that is baroclinically unstable and develops eddies.
import os

import numpy as np

from thetis_tpu import *
from thetis_tpu.model.flowsolver3d import FlowSolver
from thetis_tpu.utils.coordsys import beta_plane_coriolis_params

physical_constants["rho0"] = 1020.0

refinement = 1  # reference 'normal' = 4
nlayers = 10
if os.environ.get("THETIS_REGRESSION_TEST"):
    refinement = 0.5
    nlayers = 4

lx = ly = 1600e3
nx = ny = int(43 * refinement)
delta_x = lx / nx
mesh2d = PeriodicRectangleMesh(nx, ny, lx, ly, direction="x")
depth = 1600.0

t_end = 3 * 365 * 24 * 3600.0
t_export = 24 * 3600.0
if os.environ.get("THETIS_REGRESSION_TEST"):
    t_export = 900.0
    t_end = t_export

P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").assign(depth)

coriolis_f, coriolis_beta = beta_plane_coriolis_params(37.5)
coriolis_2d = Function(P1_2d, name="coriolis").interpolate(
    lambda x, y: coriolis_f + coriolis_beta * (y - ly / 2)
)

salt_const = 35.0
temp_max = 25.0
temp_ddy = -5e-6
temp_ddz = 8.2e-3
u_scale = 0.5
reynolds_number = 200.0
nu_scale = u_scale * delta_x / reynolds_number

solver_obj = FlowSolver(mesh2d, bathymetry_2d, nlayers)
options = solver_obj.options
options.timestepper_type = "SSPRK22"
options.solve_salinity = False
options.solve_temperature = True
options.constant_salinity = salt_const
options.use_baroclinic_formulation = True
options.use_implicit_vertical_diffusion = True
options.use_bottom_friction = True
options.coriolis_frequency = coriolis_2d.data
options.vertical_viscosity = 1e-3
options.vertical_diffusivity = 1e-5
options.horizontal_viscosity = nu_scale
options.horizontal_diffusivity = 30.0
options.equation_of_state_type = "linear"
options.timestep = 600.0 if os.environ.get("THETIS_REGRESSION_TEST") else 300.0
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.no_exports = True

# initial temperature: linear meridional + vertical gradients with a small
# sinusoidal perturbation of the front to seed the instability (ref file)
V = FunctionSpace(mesh2d, "DG", 1)
x2, y2 = SpatialCoordinate(V)


def temp_2d_fn(x, y):
    y_pert = 0.1 * ly * np.sin(2 * np.pi * x / lx)
    return temp_max + temp_ddy * (y + y_pert - ly / 2)


temp_surf = Function(V).interpolate(temp_2d_fn)
# expand to 3D with the vertical gradient relative to the surface
import jax.numpy as jnp

solver_obj.initialize()
z_levels = -(1.0 - np.asarray(solver_obj.extruded.sigma)) * depth  # (nz+1,)
z_nodes = jnp.stack([jnp.asarray(z_levels[:-1]), jnp.asarray(z_levels[1:])],
                    axis=-1)  # (nz, 2)
temp_3d = (temp_surf.data[:, :, None, None]
           + temp_ddz * z_nodes[None, None, :, :])
solver_obj.assign_initial_conditions(temp=temp_3d, salt=salt_const)

if __name__ == "__main__":
    T0_min = float(np.asarray(temp_3d).min())
    T0_max = float(np.asarray(temp_3d).max())
    solver_obj.iterate()
    temp = np.asarray(solver_obj.fields.temp_3d.data)
    print_output(
        f"final temperature range: {temp.min():.2f} .. {temp.max():.2f} degC"
        f" (initial {T0_min:.2f} .. {T0_max:.2f})"
    )
    assert np.isfinite(temp).all()
    # slope limiter keeps the stratified front inside its initial range
    assert temp.min() > T0_min - 0.1 and temp.max() < T0_max + 0.1
    uv3 = np.asarray(solver_obj.fields.uv_3d.data)
    assert np.isfinite(uv3).all()
    assert np.abs(uv3).max() > 1e-5  # geostrophic adjustment has begun
