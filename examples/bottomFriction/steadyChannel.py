"""
Steady-state channel flow in 3D
===============================

Port of the reference's ``examples/bottomFriction/steadyChannel.py``
(the GOTM "channel" test; Karna et al. 2012): water initially at rest
in an x-periodic channel is driven by a momentum source equivalent to a
constant surface slope until the bottom boundary layer reaches steady
state.  Exercises the GLS turbulence closure, vertical viscosity and
the law-of-wall bottom friction; the converged velocity must match the
logarithmic profile

    u(z) = u_b / kappa * log((z + h + z0) / z0),   u_b = sqrt(g |S| h)

to an L2 error below 0.05 (ref ``steadyChannel.py:120-137``).
"""
import os

import numpy as np

from thetis_tpu import *
from thetis_tpu.mesh.generation import PeriodicRectangleMesh
from thetis_tpu.model.flowsolver3d import FlowSolver
from thetis_tpu.equations.turbulence import GLSModelOptions

depth = 15.0
surf_slope = -1.0e-5  # d elev / dx


def bottom_friction_test(layers=25, gls_closure="k-omega",
                         stability_func="Canuto B",
                         fast_convergence=False, verify=True,
                         iterate=True, **model_options):
    """ref ``steadyChannel.py:29-143``."""
    dx = 2500.0
    nx = ny = 3
    lx, ly = nx * dx, ny * dx
    mesh2d = PeriodicRectangleMesh(nx, ny, lx, ly, direction="x")

    dt = 25.0
    t_end = 12 * 3600.0  # sufficient to reach ~steady state
    if fast_convergence:
        t_end = 5 * 3600.0
    t_export = 400.0
    if os.environ.get("THETIS_REGRESSION_TEST"):
        t_end = 5 * t_export
        layers = min(layers, 10)

    P1_2d = FunctionSpace(mesh2d, "CG", 1)
    bathymetry_2d = Function(P1_2d, name="Bathymetry").assign(depth)

    solver_obj = FlowSolver(mesh2d, bathymetry_2d, layers)
    options = solver_obj.options
    options.timestepper_type = "SSPRK22"
    options.solve_salinity = False
    options.solve_temperature = False
    options.use_baroclinic_formulation = False
    options.use_implicit_vertical_diffusion = True
    options.use_bottom_friction = True
    options.bottom_roughness = 1.5e-3
    options.use_turbulence = True
    options.vertical_viscosity = 1.3e-6   # background value
    options.vertical_diffusivity = 1.4e-7
    options.use_limiter_for_tracers = True
    options.simulation_export_time = t_export
    options.timestep = dt
    options.simulation_end_time = t_end
    options.horizontal_velocity_scale = 1.0
    options.no_exports = True
    options.turbulence_model_options = GLSModelOptions(
        closure_name=gls_closure, stability_function_name=stability_func)
    for k, v in model_options.items():
        setattr(options, k, v)

    # drive the flow with the momentum source equivalent to a constant
    # surface slope (ref ``steadyChannel.py:103-106``)
    g = float(physical_constants["g_grav"])
    pressure_grad = -g * surf_slope
    options.momentum_source_2d = np.array([pressure_grad, 0.0])

    solver_obj.create_equations()
    if fast_convergence:
        # speed up convergence by starting with u > 0
        u_init_2d = 0.5
        sig = solver_obj.extruded.sigma_np          # (nz+1,) in [0, 1]
        s_mid = 0.5 * (sig[:-1] + sig[1:]) - 0.5    # z/h + 0.5 analogue
        uv3 = np.zeros(solver_obj.shape3 + (2,))
        uv3[..., 0] = (u_init_2d * 0.3
                       * s_mid[None, None, :, None])
        solver_obj.assign_initial_conditions(
            uv=np.array([u_init_2d, 0.0]), uv_3d=uv3)

    if iterate:
        solver_obj.iterate()
        uv3 = np.asarray(solver_obj.fields.uv_3d.data)
        uv2 = np.asarray(solver_obj.fields.uv_2d.data)
        assert np.isfinite(uv3).all() and np.isfinite(uv2).all()
        tke = np.asarray(solver_obj.fields.tke_3d.data)
        assert tke.min() >= 0.0
        # the source drives +x flow
        assert uv2[..., 0].mean() > 0.0
        if verify and not os.environ.get("THETIS_REGRESSION_TEST"):
            # compare against the logarithmic velocity profile
            u_b = np.sqrt(-g * surf_slope * depth)
            kappa = float(physical_constants["von_karman"])
            z0 = float(options.bottom_roughness)
            z_if = np.asarray(solver_obj.extruded.z_interfaces(
                solver_obj.bathy_cell,
                jnp.asarray(solver_obj.fields.elev_2d.data)))
            z = np.stack([z_if[:, :, :-1], z_if[:, :, 1:]], axis=-1)
            log_u = u_b / kappa * np.log((z + depth + z0) / z0)
            # total velocity at dofs
            u_tot = uv3[..., 0] + uv2[..., 0][:, :, None, None]
            dz = (z_if[:, :, 1:] - z_if[:, :, :-1])[..., None]
            area = np.asarray(mesh2d.cell_area_np)[:, None, None, None]
            w = area / 3.0 * dz / 2.0
            vol = float(w.sum() * 1.0)
            l2 = np.sqrt(float((w * (u_tot - log_u) ** 2).sum()) / vol)
            print_output(f"log-profile L2 error {l2:.4f}")
            assert l2 < 0.05, f"L2 error too large: {l2}"
    return solver_obj


if __name__ == "__main__":
    bottom_friction_test()
