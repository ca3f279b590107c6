# 2D channel with time-dependent boundary conditions
# ===================================================
#
# Port of the reference's ``demos/demo_2d_channel_bnd.py``: the closed
# channel gains a constant volume flux at the right boundary and a tidal
# volume flux at the left boundary, updated each step through the
# ``update_forcings`` callback.
import os

import numpy as np

from thetis_tpu import *

lx = 40e3
ly = 2e3
nx = 25
ny = 2
mesh2d = RectangleMesh(nx, ny, lx, ly)

P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").assign(20.0)

t_end = 12 * 3600
t_export = 300.0
if os.environ.get("THETIS_REGRESSION_TEST"):
    t_end = 3600.0

solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
options = solver_obj.options
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.swe_timestepper_type = "CrankNicolson"
options.timestep = 50.0
options.no_exports = bool(os.environ.get("THETIS_REGRESSION_TEST"))

left_bnd_id = 1
right_bnd_id = 2

swe_bnd = {}
in_flux = 1e3
swe_bnd[right_bnd_id] = {"elev": Constant(0.0), "flux": Constant(-in_flux)}


def timedep_flux(simulation_time):
    """Time-dependent flux function."""
    tide_amp = -2e3
    tide_t = 12 * 3600.0
    return tide_amp * np.sin(2 * np.pi * simulation_time / tide_t) + in_flux


tide_flux_const = Constant(timedep_flux(0))
swe_bnd[left_bnd_id] = {"flux": tide_flux_const}

solver_obj.bnd_functions["shallow_water"] = swe_bnd


def update_forcings(t_new):
    """Update all time-dependent forcing fields."""
    tide_flux_const.assign(timedep_flux(t_new))


solver_obj.assign_initial_conditions()
solver_obj.iterate(update_forcings=update_forcings)
