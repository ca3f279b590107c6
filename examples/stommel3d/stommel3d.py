# Stommel gyre test case in 3D
# ============================
#
# Port of the reference's ``examples/stommel3d/stommel3d.py``: the
# wind-driven barotropic gyre of stommel2d run through the 3D mode-split
# solver (linear equations, beta plane, linear drag) — exercises the
# 2D-3D coupling on a barotropic problem.
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu import *
from thetis_tpu.model.flowsolver3d import FlowSolver

lx = 1.0e6
nx = 20
mesh2d = RectangleMesh(nx, nx, lx, lx)
depth = 1000.0
layers = 6
t_end = 75 * 12 * 2 * 3600.0
t_export = 3600.0 * 2
if os.environ.get("THETIS_REGRESSION_TEST"):
    t_end = 5 * t_export

P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").assign(depth)
f0, beta = 1.0e-4, 2.0e-11
coriolis_2d = Function(P1_2d).interpolate(lambda x, y: f0 + beta * y)

solver_obj = FlowSolver(mesh2d, bathymetry_2d, layers)
options = solver_obj.options
options.use_nonlinear_equations = False
options.solve_salinity = False
options.solve_temperature = False
options.use_implicit_vertical_diffusion = True
options.use_bottom_friction = False
options.use_baroclinic_formulation = False
options.coriolis_frequency = coriolis_2d
options.linear_drag_coefficient = 1e-6
options.vertical_viscosity = 1e-2
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.timestepper_type = "SSPRK22"
options.timestep = 360.0
options.no_exports = True

tau_max = 0.1
wind_stress_2d = Function(
    FunctionSpace(mesh2d, "CG", 1, dim=2), name="wind stress")
yv = mesh2d.coords_np[:, 1]
wind_stress_2d.data = jnp.stack(
    [tau_max * jnp.sin(jnp.pi * (jnp.asarray(yv) / lx - 0.5)),
     jnp.zeros(mesh2d.nv)], axis=-1)
options.wind_stress = wind_stress_2d

solver_obj.assign_initial_conditions()

if __name__ == "__main__":
    solver_obj.iterate()
    uv2 = np.asarray(solver_obj.fields.uv_2d.data)
    uv3 = np.asarray(solver_obj.fields.uv_3d.data)
    assert np.isfinite(uv2).all() and np.isfinite(uv3).all()
    speed = np.sqrt((uv2**2).sum(-1))
    # wind spins up a gyre: nonzero circulation, bounded speeds
    assert speed.max() > 1e-3
    assert speed.max() < 2.0
