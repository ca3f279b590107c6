# 2D shallow water equations in a closed channel
# ==============================================
#
# Port of the reference's ``examples/channel2d/channel2d.py``: sloping
# bathymetry, piecewise-linear initial elevation developing a shock as it
# reaches the shallow end; tests 2D mode integrity and momentum-advection
# stability.
import os

import numpy as np

from thetis_tpu import *

lx, ly = 100e3, 3750.0
nx, ny = 80, 3
mesh2d = RectangleMesh(nx, ny, lx, ly)

t_end = 6 * 3600.0
t_export = 100.0
if os.environ.get("THETIS_REGRESSION_TEST"):
    t_end = 5 * t_export

depth_oce, depth_riv = 20.0, 5.0
P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").interpolate(
    lambda x, y: depth_oce + (depth_riv - depth_oce) * x / lx
)

solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
options = solver_obj.options
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.no_exports = bool(os.environ.get("THETIS_REGRESSION_TEST"))
options.check_volume_conservation_2d = True
options.swe_timestepper_type = "SSPRK33"
options.timestep = 2.0

elev_height = 6.0
elev_ramp_lx = 30e3
elev_init = Function(P1_2d).interpolate(
    lambda x, y: np.where(x < elev_ramp_lx,
                          elev_height * (1 - x / elev_ramp_lx), 0.0)
)
solver_obj.assign_initial_conditions(elev=elev_init)

if __name__ == "__main__":
    solver_obj.iterate()
    if os.environ.get("THETIS_REGRESSION_TEST"):
        eta = np.asarray(solver_obj.fields.elev_2d.data)
        uv = np.asarray(solver_obj.fields.uv_2d.data)
        assert np.isfinite(eta).all() and np.isfinite(uv).all()
        # the released wave front stays bounded by the initial head and
        # moves right: elevation appears beyond the initial ramp foot
        assert eta.max() <= elev_height * 1.05
        x_dof = mesh2d.coords_np[mesh2d.cells_np][..., 0]
        # front speed ~ sqrt(g*15) ~ 12 m/s: past x = 33 km after 500 s
        assert np.abs(eta[x_dof > 33e3]).max() > 0.01
        assert np.sqrt((uv**2).sum(-1)).max() < 10.0
