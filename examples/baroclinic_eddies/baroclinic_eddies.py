# Baroclinic eddies test (Ilicak et al. 2012; Petersen et al. 2015)
# =================================================================
#
# Port of the reference's
# ``examples/baroclinic_eddies/baroclinic_eddies.py``: a 160x500 km
# x-periodic channel, 1000 m deep, with a sinusoidally perturbed
# temperature front on an f-plane; the front is baroclinically unstable
# and rolls up into eddies.  Standard spurious-dianeutral-mixing
# benchmark.
import os

import numpy as np

from thetis_tpu import *
from thetis_tpu.mesh.generation import PeriodicRectangleMesh
from thetis_tpu.model.flowsolver3d import FlowSolver

physical_constants["rho0"] = 1000.0

delta_x = 10e3
lx, ly = 160e3, 500e3
nx, ny = int(lx / delta_x), int(ly / delta_x)
nlayers = 20
depth = 1000.0
f_cori = -1.2e-4
bottom_drag = 0.01
reynolds_number = 20.0
u_scale = 0.5
nu_scale = u_scale * delta_x / reynolds_number

t_end = 320 * 24 * 3600.0
t_export = 3 * 3600.0
if os.environ.get("THETIS_REGRESSION_TEST"):
    t_export = 900.0
    t_end = t_export
    nlayers = 4

mesh2d = PeriodicRectangleMesh(nx, ny, lx, ly, direction="x")
P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").assign(depth)

salt_const = 35.0
temp_bot, temp_surf = 10.1, 13.1

solver_obj = FlowSolver(mesh2d, bathymetry_2d, nlayers)
options = solver_obj.options
options.timestepper_type = "SSPRK22"
options.solve_salinity = False
options.constant_salinity = salt_const
options.solve_temperature = True
options.use_implicit_vertical_diffusion = True
options.use_bottom_friction = True
options.quadratic_drag_coefficient = bottom_drag
options.use_baroclinic_formulation = True
options.coriolis_frequency = f_cori
options.use_limiter_for_tracers = True
options.vertical_viscosity = 1.0e-4
options.horizontal_viscosity = nu_scale
options.equation_of_state_type = "linear"
options.equation_of_state_options = dict(
    rho_ref=1000.0, alpha=0.2, beta=0.0, th_ref=5.0, s_ref=35.0)
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.timestep = 300.0
options.no_exports = True

solver_obj.create_equations()

# initial temperature: vertical stratification + perturbed front
xy = mesh2d.coords_np[mesh2d.cells_np]  # (nc, 3, 2)
x_d, y_d = xy[..., 0], xy[..., 1]
sig = np.linspace(-depth, 0.0, nlayers + 1)
z_nodes = np.stack([sig[:-1], sig[1:]], axis=-1)  # (nz, 2)
z = z_nodes[None, None]  # (1, 1, nz, 2)
temp_vert = temp_bot + (temp_surf - temp_bot) * (-depth - z) / -depth

temp_delta, y0, ya, k, yd = -1.2, 250.0e3, 40.0e3, 3, 40.0e3
yw = y0 - ya * np.sin(2 * np.pi * k * x_d / lx)
fy = 1.0 - (y_d - yw) / yd
s_lo = 0.5 * (np.sign(fy) + 1.0)
s_hi = 0.5 * (np.sign(1.0 - fy) + 1.0)
temp_wave = temp_delta * (fy * s_lo * s_hi + (1.0 - s_hi))

temp_delta2, x2, x3 = -0.3, 110.0e3, 130.0e3
yw2 = y0 - ya / 2 * np.sin(np.pi * (x_d - x2) / (x3 - x2))
fy2 = 1.0 - (y_d - yw2) / (yd / 2)
s_lo2 = 0.5 * (np.sign(fy2) + 1.0)
s_hi2 = 0.5 * (np.sign(2.0 - fy2) + 1.0)
temp_wave2 = temp_delta2 * (fy2 * s_lo2 * s_hi2 + (1.0 - s_hi2))
s_w2 = 0.5 * (np.sign(x_d - x2) * (-1) * np.sign(x_d - x3) + 1.0) * s_hi2

temp_hor = s_w2 * temp_wave2 + (1.0 - s_w2) * temp_wave  # (nc, 3)
temp0 = temp_vert + temp_hor[:, :, None, None]
solver_obj.assign_initial_conditions(temp=np.asarray(
    np.broadcast_to(temp0, solver_obj.shape3)))

if __name__ == "__main__":
    solver_obj.iterate()
    T = np.asarray(solver_obj.fields.temp_3d.data)
    uv3 = np.asarray(solver_obj.fields.uv_3d.data)
    assert np.isfinite(T).all() and np.isfinite(uv3).all()
    # limiter keeps temperature within the initial range
    assert T.min() > temp_bot + temp_delta + temp_delta2 - 0.1
    assert T.max() < temp_surf + 0.1
    # the front begins geostrophic adjustment: flow appears
    assert np.abs(uv3).max() > 1e-4
