# Bottom Ekman layer test
# =======================
#
# Port of the reference's ``examples/bottomFriction/ekman_bottom.py``:
# steady flow in a doubly periodic channel driven by a constant surface
# slope (momentum source), subject to rotation and bottom friction with
# constant vertical viscosity, which admits the classical Ekman-spiral
# analytical solution.
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu import *
from thetis_tpu.model.flowsolver3d import FlowSolver
from thetis_tpu.mesh.generation import PeriodicRectangleMesh

depth = 20.0
surf_slope = -5.0e-6  # d elev/dx


def bottom_ekman_test(layers=50, verify=True, iterate=True,
                      **model_options):
    dx = 2500.0
    nx = ny = 3
    mesh2d = PeriodicRectangleMesh(nx, ny, nx * dx, ny * dx,
                                   direction="both")
    dt = 90.0
    t_end = 5 * 3600.0
    t_export = 450.0
    f_coriolis = 1e-4
    nu_v = 5e-4
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
    options.use_bottom_friction = True
    options.bottom_roughness = 1e-3
    options.use_baroclinic_formulation = False
    options.coriolis_frequency = f_coriolis
    options.vertical_viscosity = nu_v
    options.vertical_diffusivity = nu_v
    options.simulation_export_time = t_export
    options.timestep = dt
    options.simulation_end_time = t_end
    options.no_exports = True
    g = float(physical_constants["g_grav"])
    options.momentum_source_2d = Constant((-g * surf_slope, 0.0))
    options.update(model_options)

    solver_obj.assign_initial_conditions(uv=jnp.asarray([0.0, -0.49]))
    if iterate:
        solver_obj.iterate()
    return solver_obj


def analytical_uv(solver_obj, nu_v=5e-4, f_coriolis=1e-4):
    """No-slip bottom Ekman spiral at the 3D dof points: (u, v)."""
    v_max = 0.4905  # g/f d(elev)/dx
    d = np.sqrt(2 * nu_v / f_coriolis)
    ext = solver_obj.extruded
    z_if = np.asarray(ext.z_interfaces(
        solver_obj.bathy_cell, jnp.zeros((solver_obj.mesh2d.nc, 3))
    ))  # (nc, 3, nz+1)
    z_nodes = np.stack([z_if[..., :-1], z_if[..., 1:]], axis=-1)
    z_b = (depth + z_nodes) / d
    v = -v_max * (1 - np.exp(-z_b) * np.cos(z_b))
    u = v_max * np.exp(-z_b) * np.sin(z_b)
    return u, v


if __name__ == "__main__":
    s = bottom_ekman_test(
        layers=10 if os.environ.get("THETIS_REGRESSION_TEST") else 50)
    uv3 = np.asarray(s.fields.uv_3d.data)  # deviation velocity
    uv2 = np.asarray(s.fields.uv_2d.data)  # depth average
    uv = uv3 + uv2[:, :, None, None, :]
    assert np.isfinite(uv).all()
    if os.environ.get("THETIS_REGRESSION_TEST"):
        # short run: flow is spinning up toward the spiral — the bottom
        # shear must already oppose the interior flow
        assert np.abs(uv[..., 1].mean() + 0.49) < 0.2
        # bottom layer slower than surface layer (friction acts)
        v_bot = uv[:, :, 0, 0, 1].mean()
        v_top = uv[:, :, -1, 1, 1].mean()
        assert abs(v_bot) < abs(v_top)
    else:
        u_ana, v_ana = analytical_uv(s)
        vol = s.mesh2d.cell_area_np.sum() * depth
        err = np.sqrt(
            ((uv[..., 0] - u_ana) ** 2 + (uv[..., 1] - v_ana) ** 2)
        ).mean()
        print_output(f"mean pointwise error {err:.4f}")
