# Stommel gyre test case in 2D
# ============================
#
# Port of the reference's ``examples/stommel2d/stommel2d.py`` (Comblen et
# al. 2010): a wind-driven geostrophic gyre in a 1000 km closed basin with
# a beta-plane Coriolis field and linear bottom drag; the westward
# intensification of the gyre is the classic Stommel solution.
import os

import numpy as np

from thetis_tpu import *

lx = 1.0e6
nx = 20
mesh2d = RectangleMesh(nx, nx, lx, lx)
depth = 1000.0
t_end = 75 * 12 * 2 * 3600
t_export = 3600 * 2
if os.environ.get("THETIS_REGRESSION_TEST"):
    t_end = 5 * t_export

P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").assign(depth)

f0, beta = 1.0e-4, 2.0e-11
coriolis_2d = Function(P1_2d).interpolate(lambda x, y: f0 + beta * y)

tau_max = 0.1
P1v_2d = FunctionSpace(mesh2d, "CG", 1, dim=2)
xv, yv = SpatialCoordinate(P1_2d)
import jax.numpy as jnp
wind_stress_2d = Function(P1v_2d, name="wind stress")
wind_stress_2d.data = jnp.stack(
    [tau_max * jnp.sin(jnp.pi * (jnp.asarray(yv) / lx - 0.5)),
     jnp.zeros(mesh2d.nv)], axis=-1)

solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
options = solver_obj.options
options.use_nonlinear_equations = False
options.coriolis_frequency = coriolis_2d
options.wind_stress = wind_stress_2d
options.linear_drag_coefficient = Constant(1e-6)
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.swe_timestepper_type = "CrankNicolson"
options.timestep = 360.0
options.no_exports = True

solver_obj.assign_initial_conditions()

if __name__ == "__main__":
    solver_obj.iterate()
    uv = np.asarray(solver_obj.fields.uv_2d.data)
    speed = np.sqrt((uv**2).sum(-1))
    print_output(f"max speed: {speed.max():.4f} m/s")
    assert np.isfinite(uv).all()
    # the wind-driven gyre spins up with a west-intensified boundary
    # current (Stommel solution)
    assert speed.max() > 1e-3 and speed.max() < 2.0
    import os as _os
    if not _os.environ.get("THETIS_REGRESSION_TEST"):
        x_dof = mesh2d.coords_np[mesh2d.cells_np][..., 0]
        west = speed[x_dof < 0.2 * lx].max()
        east = speed[x_dof > 0.8 * lx].max()
        assert west > east
