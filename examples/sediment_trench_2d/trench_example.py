# Migrating trench morphodynamics (Clare et al. 2020)
# ===================================================
#
# Port of the reference's ``examples/sediment_trench_2d``
# (``trench_hydro.py`` + ``trench_example.py``, merged into one script):
# flow over a trench in a laboratory flume erodes the upstream slope and
# deposits on the downstream one, migrating the trench downstream.  The
# trench profile is the reference's piecewise-linear bed (defined
# analytically; the reference tabulates the same profile in ``bed.csv``).
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu import *

lx, ly = 16.0, 1.1
nx, ny = 5 * 16, 5
if os.environ.get("THETIS_REGRESSION_TEST"):
    nx, ny = 40, 4
mesh2d = RectangleMesh(nx, ny, lx, ly)

initialdepth = 0.397
depth_riv = initialdepth - 0.397
depth_trench = depth_riv - 0.15
depth_diff = depth_trench - depth_riv


def trench_profile(x):
    return np.where(
        x <= 5, depth_riv,
        np.where(x <= 6.5, (1 / 1.5) * depth_diff * (x - 6.5) + depth_trench,
                 np.where(x <= 9.5, depth_trench,
                          np.where(x <= 11,
                                   -(1 / 1.5) * depth_diff * (x - 11)
                                   + depth_riv,
                                   depth_riv))))


xv = mesh2d.coords_np[:, 0]
V = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(V, name="bathymetry_2d")
bathymetry_2d.data = jnp.asarray(-trench_profile(xv))

morfac = 100
dt = 0.3
end_time = 15 * 3600
hydro_spinup = 50.0
if os.environ.get("THETIS_REGRESSION_TEST"):
    end_time = 3600.0
    hydro_spinup = 25.0

diffusivity = 0.15
average_size = 160e-6

# --- phase 1: hydrodynamics spin-up (ref trench_hydro.py) -------------
hydro = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
o = hydro.options
o.timestep = dt
o.simulation_export_time = hydro_spinup
o.simulation_end_time = hydro_spinup
o.no_exports = True
o.swe_timestepper_type = "CrankNicolson"
o.swe_timestepper_options.implicitness_theta = 1.0
o.horizontal_viscosity = Constant(1e-6)
o.nikuradse_bed_roughness = Constant(3 * average_size)
o.norm_smoother = Constant(0.1)
hydro.bnd_functions["shallow_water"] = {
    1: {"flux": Constant(-0.22)},
    2: {"elev": Constant(0.397)},
}
hydro.assign_initial_conditions(
    uv=jnp.asarray([0.51, 0.0]), elev=Constant(0.397))

if __name__ == "__main__":
    hydro.iterate()

    # --- phase 2: morphodynamics (ref trench_example.py) --------------
    solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
    options = solver_obj.options
    so = options.sediment_model_options
    so.solve_suspended_sediment = True
    so.use_bedload = True
    so.use_exner = True
    so.use_sediment_conservative_form = False
    so.average_sediment_size = average_size
    so.bed_reference_height = 0.025
    so.morphological_acceleration_factor = morfac
    options.simulation_end_time = end_time / morfac
    options.simulation_export_time = options.simulation_end_time / 5
    options.no_exports = True
    options.nikuradse_bed_roughness = Constant(3 * average_size)
    so.horizontal_diffusivity = Constant(diffusivity)
    options.horizontal_viscosity = Constant(1e-6)
    options.swe_timestepper_type = "CrankNicolson"
    options.swe_timestepper_options.implicitness_theta = 1.0
    options.norm_smoother = Constant(0.1)
    options.timestep = dt
    solver_obj.bnd_functions["shallow_water"] = {
        1: {"flux": Constant(-0.22)},
        2: {"elev": Constant(0.397)},
    }
    solver_obj.bnd_functions["sediment"] = {
        1: {"flux": Constant(-0.22), "equilibrium": None},
        2: {"elev": Constant(0.397)},
    }
    solver_obj.assign_initial_conditions(
        uv=hydro.fields.uv_2d.data, elev=hydro.fields.elev_2d.data)
    solver_obj.iterate()

    zb0 = -trench_profile(xv)
    zb = np.asarray(solver_obj.fields.bathymetry_2d.data)
    dz = zb - zb0
    assert np.isfinite(zb).all()
    assert np.abs(dz).max() > 1e-5, "bed did not evolve"
    assert np.abs(dz).max() < 0.15, "bed evolution exploded"
    # trench migration: erosion on the upstream (lee of inflow) slope,
    # deposition into the trench on the downstream slope.  bathymetry is
    # positive-down: deposition -> dz < 0
    up_slope = (xv > 5.0) & (xv < 6.5)
    assert dz[up_slope].mean() < dz[~up_slope].mean() + 1e-8
