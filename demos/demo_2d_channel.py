# 2D channel example
# ==================
#
# Port of the reference's ``demos/demo_2d_channel.py`` to thetis_tpu: a
# depth-averaged 2D simulation in a closed rectangular domain, forced by an
# initial elevation perturbation.  The script body is nearly verbatim — the
# only change is expressions being jnp arrays instead of UFL.
from thetis_tpu import *

lx = 40e3
ly = 2e3
nx = 25
ny = 2
mesh2d = RectangleMesh(nx, ny, lx, ly)

P1_2d = FunctionSpace(mesh2d, 'CG', 1)
bathymetry_2d = Function(P1_2d, name='Bathymetry')
depth = 20.0
bathymetry_2d.assign(depth)

# total duration in seconds
t_end = 2 * 3600
# export interval in seconds
t_export = 100.0

solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
options = solver_obj.options
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.swe_timestepper_type = 'CrankNicolson'
options.timestep = 50.0
options.no_exports = True

elev_init = Function(P1_2d, name='initial elevation')
xy = SpatialCoordinate(mesh2d)
gauss_width = 4000.
gauss_ampl = 2.0
gauss_expr = gauss_ampl * exp(-((xy[0]-lx/2)/gauss_width)**2)
elev_init.interpolate(gauss_expr)

solver_obj.assign_initial_conditions(elev=elev_init)

if __name__ == '__main__':
    solver_obj.iterate()
