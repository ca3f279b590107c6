# Geostrophic gyre test case in 2D
# ================================
#
# Port of the reference's ``examples/geostrophicGyre/geoGyre2d.py``: a
# Gaussian elevation bump in geostrophic balance with its velocity field
# should remain stationary (f-plane, linear equations).
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu import *

lx = 1.0e6
nx = 20
mesh2d = RectangleMesh(nx, nx, lx, lx)
depth = 1000.0
elev_amp = 3.0
t_end = 75 * 12 * 2 * 3600
t_export = 3600 * 2
if os.environ.get("THETIS_REGRESSION_TEST"):
    t_export = 900.0
    t_end = 5 * t_export

P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").assign(depth)
f0 = 1.0e-4
coriolis_2d = Function(P1_2d).assign(f0)

solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
options = solver_obj.options
options.use_nonlinear_equations = False
options.coriolis_frequency = coriolis_2d
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.swe_timestepper_type = "CrankNicolson"
options.timestep = 20.0
options.no_exports = bool(os.environ.get("THETIS_REGRESSION_TEST"))
options.check_volume_conservation_2d = True

solver_obj.create_equations()
sigma = 160.0e3
x0 = y0 = lx / 2
g = float(physical_constants["g_grav"])

x_dof = mesh2d.coords_np[mesh2d.cells_np]  # (nc, 3, 2) P1DG nodes
r2 = ((x_dof[..., 0] - x0) ** 2 + (x_dof[..., 1] - y0) ** 2) / sigma**2
elev_dof = elev_amp * np.exp(-r2)
uv_dof = np.stack([
    g / f0 * 2 * (x_dof[..., 1] - y0) / sigma**2 * elev_dof,
    -g / f0 * 2 * (x_dof[..., 0] - x0) / sigma**2 * elev_dof,
], axis=-1)
solver_obj.assign_initial_conditions(elev=jnp.asarray(elev_dof),
                                     uv=jnp.asarray(uv_dof))

if __name__ == "__main__":
    eta0 = np.asarray(solver_obj.fields.elev_2d.data).copy()
    solver_obj.iterate()
    if os.environ.get("THETIS_REGRESSION_TEST"):
        # geostrophic balance: the bump must stay put (small drift only)
        eta = np.asarray(solver_obj.fields.elev_2d.data)
        assert np.isfinite(eta).all()
        rel = np.abs(eta - eta0).max() / elev_amp
        assert rel < 0.05, rel
