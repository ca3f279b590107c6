# Non-hydrostatic solitary wave propagation
# =========================================
#
# Port of the reference's
# ``examples/nonhydrostatic_cases/solitary_wave_nh/solitary_wave_2d.py``:
# a Boussinesq solitary wave propagates shape-preserving at speed
# c = sqrt(g (H + a)) when the non-hydrostatic pressure balances the
# amplitude dispersion.
import math
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu import *

lx, ly = 1000.0, 2.0
nx, ny = 250, 1
mesh2d = RectangleMesh(nx, ny, lx, ly)
depth = 10.0

P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").assign(depth)

dt = 0.1
t_export = 5.0
t_end = 50.0
if os.environ.get("THETIS_REGRESSION_TEST"):
    t_end = 4 * t_export

solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
options = solver_obj.options
options.swe_timestepper_type = "CrankNicolson"
options.timestep = dt
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.no_exports = True
options.nh_model_options.solve_nonhydrostatic_pressure = True

solver_obj.create_equations()
g = float(physical_constants["g_grav"])
e = 0.2  # amplitude ratio a/H
a = e * depth
c_sol = math.sqrt(g * (depth + a))
x0 = 250.0
x_dof = mesh2d.coords_np[mesh2d.cells_np][..., 0]
kx = math.sqrt(3 * a / (4 * depth**3))
eta0 = a / np.cosh(kx * (x_dof - x0)) ** 2
u0 = c_sol * eta0 / (depth + eta0)
solver_obj.assign_initial_conditions(
    elev=jnp.asarray(eta0),
    uv=jnp.asarray(np.stack([u0, np.zeros_like(u0)], axis=-1)),
)

if __name__ == "__main__":
    solver_obj.iterate()
    t = solver_obj.simulation_time
    eta = np.asarray(solver_obj.fields.elev_2d.data)
    assert np.isfinite(eta).all()
    # the crest must have advected at ~ c_sol with its amplitude
    # approximately preserved (Boussinesq balance)
    i_peak = np.unravel_index(np.argmax(eta), eta.shape)
    x_peak = x_dof[i_peak]
    x_expect = x0 + c_sol * t
    assert abs(x_peak - x_expect) < 30.0, (x_peak, x_expect)
    assert eta.max() > 0.7 * a, eta.max()
