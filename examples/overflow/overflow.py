# Overflow test case (Haidvogel & Beckmann 1999; Ilicak et al. 2012)
# ==================================================================
#
# Port of the reference's ``examples/overflow/overflow.py``: dense water
# initially sitting on a continental slope in a 200 km channel descends
# as a gravity current.  Tests baroclinic ALE dynamics, the slope limiter
# and Smagorinsky closure on a strongly sloping sigma mesh.
import os

import numpy as np

from thetis_tpu import *
from thetis_tpu.model.flowsolver3d import FlowSolver

physical_constants["rho0"] = 999.7

lx = 200.0e3
delta_x = 4000.0
nx = int(lx / delta_x)
ny = 2
ly = ny * delta_x
mesh2d = RectangleMesh(nx, ny, lx, ly)
layers = 10

dt = 20.0
t_end = 25 * 3600
t_export = 15 * 60.0
Re_h = 10.0
if os.environ.get("THETIS_REGRESSION_TEST"):
    t_export = 10 * dt
    t_end = 3 * t_export
    layers = 5

hmin, hmax = 500.0, 2000.0
Ls, x0 = 10.0e3, 40.0e3
P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").interpolate(
    lambda x, y: hmin + 0.5 * (hmax - hmin) * (1 + np.tanh((x - x0) / Ls))
)

salt_left, salt_right = 2.5489, 0.0
temp_const = 10.0

solver_obj = FlowSolver(mesh2d, bathymetry_2d, layers)
options = solver_obj.options
options.timestepper_type = "SSPRK22"
options.solve_salinity = True
options.solve_temperature = False
options.constant_temperature = temp_const
options.use_implicit_vertical_diffusion = False
options.use_bottom_friction = False
options.use_baroclinic_formulation = True
options.use_smagorinsky_viscosity = True
options.smagorinsky_coefficient = 1.0 / np.sqrt(Re_h)
options.use_limiter_for_tracers = True
options.vertical_viscosity = 1.0e-4
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.timestep = dt
options.no_exports = True

solver_obj.create_equations()
x_dof = mesh2d.coords_np[mesh2d.cells_np][..., 0]  # (nc, 3)
salt_2d = np.where(x_dof < 20.0e3, salt_left, salt_right)
solver_obj.assign_initial_conditions(salt=np.asarray(salt_2d))

if __name__ == "__main__":
    salt_min0, salt_max0 = salt_right, salt_left
    solver_obj.iterate()
    s = np.asarray(solver_obj.fields.salt_3d.data)
    uv3 = np.asarray(solver_obj.fields.uv_3d.data)
    assert np.isfinite(s).all() and np.isfinite(uv3).all()
    # limiter keeps salinity in its initial bounds
    assert s.min() > salt_min0 - 0.05 and s.max() < salt_max0 + 0.05
    # the dense front has started to slide: baroclinic velocity nonzero
    assert np.abs(uv3).max() > 1e-4
