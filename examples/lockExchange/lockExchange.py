# Lock exchange test case
# =======================
#
# Port of the reference's ``examples/lockExchange/lockExchange.py``
# (COMODO benchmark): a closed rectangular basin with a vertical
# temperature front that collapses into counter-flowing gravity currents.
# Grid ladder follows the reference (coarse/normal resolutions of the
# dx=2000 m ... ladder, ``lockExchange.py:16-34``).
import argparse
import os

import numpy as np

from thetis_tpu import *
from thetis_tpu.model.flowsolver3d import FlowSolver

parser = argparse.ArgumentParser()
parser.add_argument("-r", "--reso", default="coarse",
                    choices=["coarse", "normal"])
args, _ = parser.parse_known_args()

# COMODO lock exchange: 64 km x 2 km basin, 20 m deep
lx, ly = 64e3, 2e3
depth = 20.0
if args.reso == "coarse":
    dx, n_layers = 2000.0, 10
else:
    dx, n_layers = 1000.0, 20
nx = int(lx / dx)
ny = max(2, int(ly / dx))

mesh2d = RectangleMesh(nx, ny, lx, ly)
P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").assign(depth)

solver_obj = FlowSolver(mesh2d, bathymetry_2d, n_layers)
options = solver_obj.options
options.solve_salinity = False
options.solve_temperature = True
options.constant_salinity = 35.0
options.use_baroclinic_formulation = True
options.use_implicit_vertical_diffusion = True
options.use_bottom_friction = False
options.horizontal_viscosity = 1.0
options.horizontal_diffusivity = 1.0
options.vertical_viscosity = 1e-4
options.vertical_diffusivity = 1e-5
options.equation_of_state_type = "linear"
options.timestep = 25.0
t_end = 25 * 3600.0
if os.environ.get("THETIS_REGRESSION_TEST"):
    t_end = 50 * options.timestep
options.simulation_export_time = 900.0
options.simulation_end_time = t_end

# initial temperature front (ref: delta_T jump at the basin centre)
temp_left, temp_right = 5.0, 30.0
V = FunctionSpace(mesh2d, "DG", 1)
x, y = SpatialCoordinate(V)
temp_init = Function(V).interpolate(
    conditional(x < lx / 2, temp_left, temp_right)
)
solver_obj.assign_initial_conditions(temp=temp_init.data, salt=35.0)

if __name__ == "__main__":
    solver_obj.iterate()
    # report front position: where the bottom temperature crosses the mean
    import jax.numpy as jnp

    temp = solver_obj.fields.temp_3d.data
    t_bot = np.asarray(temp[:, :, 0, 0]).mean(axis=1)
    xc = solver_obj.mesh2d.cell_midpoints()[:, 0]
    tmid = 0.5 * (temp_left + temp_right)
    warm_on_left = xc[(t_bot < tmid) & (xc > lx / 2)]
    front_x = (warm_on_left.max() if len(warm_on_left) else lx / 2)
    print_output(
        f"cold bottom front reached x = {front_x / 1e3:.2f} km"
    )
    assert np.isfinite(np.asarray(temp)).all()
    # limiter keeps temperature within the initial lock values
    assert np.asarray(temp).min() > temp_left - 0.05
    assert np.asarray(temp).max() < temp_right + 0.05
    # the gravity current has moved the bottom front off the midline
    assert front_x > lx / 2
