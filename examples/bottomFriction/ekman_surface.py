# Surface Ekman layer test
# ========================
#
# Port of the reference's ``examples/bottomFriction/ekman_surface.py``:
# wind-driven rotating channel with constant vertical viscosity; the
# steady state is the classical surface Ekman spiral with 45-degree
# surface deflection.
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu import *
from thetis_tpu.model.flowsolver3d import FlowSolver
from thetis_tpu.mesh.generation import PeriodicRectangleMesh

depth = 100.0


def surface_ekman_test(layers=50, iterate=True, **model_options):
    dx = 2500.0
    nx = ny = 3
    mesh2d = PeriodicRectangleMesh(nx, ny, nx * dx, ny * dx,
                                   direction="both")
    dt = 90.0
    t_end = 6 * 3600.0
    t_export = 450.0
    f_coriolis = 1e-4
    nu_v = 5e-4
    wind_stress_x = 0.1027  # Pa
    if os.environ.get("THETIS_REGRESSION_TEST"):
        t_end = 5 * t_export

    P1_2d = FunctionSpace(mesh2d, "CG", 1)
    bathymetry2d = Function(P1_2d, name="Bathymetry").assign(depth)

    solver_obj = FlowSolver(mesh2d, bathymetry2d, layers)
    options = solver_obj.options
    options.timestepper_type = "SSPRK22"
    options.solve_salinity = False
    options.solve_temperature = False
    options.use_implicit_vertical_diffusion = True
    options.use_bottom_friction = False
    options.use_baroclinic_formulation = False
    options.coriolis_frequency = f_coriolis
    options.vertical_viscosity = nu_v
    options.vertical_diffusivity = nu_v
    options.wind_stress = Constant((wind_stress_x, 0.0))
    options.simulation_export_time = t_export
    options.timestep = dt
    options.simulation_end_time = t_end
    options.no_exports = True
    options.update(model_options)
    solver_obj.assign_initial_conditions()
    if iterate:
        solver_obj.iterate()
    return solver_obj


def analytical_uv(solver_obj, nu_v=5e-4, f_coriolis=1e-4,
                  wind_stress_x=0.1027):
    rho0 = float(physical_constants["rho0"])
    d = np.sqrt(2 * nu_v / f_coriolis)
    a = np.sqrt(2) / (f_coriolis * d * rho0) * wind_stress_x
    ext = solver_obj.extruded
    z_if = np.asarray(ext.z_interfaces(
        solver_obj.bathy_cell, jnp.zeros((solver_obj.mesh2d.nc, 3))
    ))
    z_nodes = np.stack([z_if[..., :-1], z_if[..., 1:]], axis=-1)
    z_s = z_nodes / d
    u = a * np.exp(z_s) * np.cos(z_s - np.pi / 4)
    v = a * np.exp(z_s) * np.sin(z_s - np.pi / 4)
    return u, v


if __name__ == "__main__":
    s = surface_ekman_test(
        layers=10 if os.environ.get("THETIS_REGRESSION_TEST") else 50)
    uv3 = np.asarray(s.fields.uv_3d.data)
    uv2 = np.asarray(s.fields.uv_2d.data)
    uv = uv3 + uv2[:, :, None, None, :]
    assert np.isfinite(uv).all()
    # wind along +x with Coriolis: surface transport deflected to the
    # right (negative v at depth-average; surface u positive)
    u_surf = uv[:, :, -1, 1, 0].mean()
    assert u_surf > 0.0
    if not os.environ.get("THETIS_REGRESSION_TEST"):
        u_ana, v_ana = analytical_uv(s)
        err = np.sqrt((uv[..., 0] - u_ana) ** 2
                      + (uv[..., 1] - v_ana) ** 2).mean()
        print_output(f"mean pointwise error {err:.4f}")
