"""
Balzano wetting-drying test case
================================

Port of the reference's ``examples/balzano/balzano.py``: shallow water
equations with wetting and drying in a rectangular domain with uniformly
sloping bathymetry (gradient 1/2760), forced by a 12-h sinusoidal free
surface elevation at the deep end (marker 2).  Initial elevation and
velocity are zero; Manning friction suppresses reflection from the
wet-dry front.

Gourgue et al. (2009), Adv. Water Resources 32:1726-1739.
"""
import os

import numpy as np

from thetis_tpu import *  # noqa: F401,F403

outputdir = "outputs_balzano"
mesh2d = RectangleMesh(12, 6, 13800.0, 7200.0)

dt = 600.0
t_export = 600.0
t_end = 2 * 24 * 3600.0
if os.getenv("THETIS_REGRESSION_TEST") is not None:
    t_end = 5 * t_export

# bathymetry: uniform slope with gradient 1/2760 (deep at x=lx)
P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry = Function(P1_2d, name="Bathymetry").interpolate(
    lambda x, y: x / 2760.0
)

solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry)
options = solver_obj.options
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.output_directory = outputdir
options.check_volume_conservation_2d = True
options.fields_to_export = ["uv_2d", "elev_2d"]
options.no_exports = os.getenv("THETIS_REGRESSION_TEST") is not None
options.swe_timestepper_type = "CrankNicolson"
options.swe_timestepper_options.implicitness_theta = 0.5
options.use_wetting_and_drying = True
options.wetting_and_drying_alpha = 0.4
options.manning_drag_coefficient = Constant(0.02)
options.timestep = dt

# ocean boundary forcing: -2 m amplitude, 12 h period at the deep end
h_amp = -2.0
h_T = 12 * 3600.0

solver_obj.create_function_spaces()
H_2d = solver_obj.function_spaces.H_2d
ocean_elev = Function(H_2d, name="ocean boundary elevation")
solver_obj.bnd_functions["shallow_water"] = {2: {"elev": ocean_elev}}


def update_forcings(t):
    import jax.numpy as jnp

    ocean_elev.data = jnp.full_like(
        ocean_elev.data, h_amp * np.sin(2 * np.pi * t / h_T)
    )


update_forcings(0.0)
solver_obj.assign_initial_conditions()

if __name__ == "__main__":
    solver_obj.iterate(update_forcings=update_forcings)
    e = np.asarray(solver_obj.fields.elev_2d.data)
    print_output(f"final elevation range {e.min():.3f} .. {e.max():.3f}")
    assert np.isfinite(e).all()
    # wetting-drying: the elevation stays within the forcing range (wet
    # end) and above the bathymetry trough (dry end follows the bed)
    assert e.max() < 1.5 * abs(h_amp)
    assert e.min() > -6.0
