# Baroclinic eddies test (Ilicak et al. 2012; Petersen et al. 2015)
# =================================================================
#
# Port of the reference's
# ``examples/baroclinic_eddies/baroclinic_eddies.py``: a 160x500 km
# x-periodic channel, 1000 m deep, with a sinusoidally perturbed
# temperature front on an f-plane; the front is baroclinically unstable
# and rolls up into eddies.  Standard spurious-dianeutral-mixing
# benchmark, tracked by the reference-potential-energy (RPE) diagnostic
# (``diagnostics.py``).
#
# Mirrors the reference's full configuration ladder (ref
# ``baroclinic_eddies.py:35-160``): resolution, vertical level count
# (default via the reference's ``get_nlayers`` rule), mesh Reynolds
# number or explicit viscosity scale, constant vs Smagorinsky closure,
# Lax-Friedrichs factors, dt override — and the same output naming
# scheme, conservation monitors and linear EOS settings.
import os
import sys

import numpy as np

from thetis_tpu import *
from thetis_tpu.mesh.generation import PeriodicRectangleMesh
from thetis_tpu.model.flowsolver3d import FlowSolver

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from diagnostics import RPECalculator  # noqa: E402


def get_nlayers(delta_x):
    """Vertical level count from the horizontal resolution (ref
    ``baroclinic_eddies.py:44-46``)."""
    return int(60.0 / delta_x * 1000.0 + 20)


def initial_temperature(mesh2d, nlayers, depth, temp_bot, temp_surf):
    """Vertically stratified state with the Ilicak perturbed front
    (ref ``baroclinic_eddies.py:180-230``)."""
    lx = 160e3
    xy = mesh2d.coords_np[mesh2d.cells_np]  # (nc, 3, 2)
    x_d, y_d = xy[..., 0], xy[..., 1]
    sig = np.linspace(-depth, 0.0, nlayers + 1)
    z_nodes = np.stack([sig[:-1], sig[1:]], axis=-1)  # (nz, 2)
    z = z_nodes[None, None]  # (1, 1, nz, 2)
    temp_vert = temp_bot + (temp_surf - temp_bot) * (-depth - z) / -depth

    temp_delta, y0, ya, k, yd = -1.2, 250.0e3, 40.0e3, 3, 40.0e3
    yw = y0 - ya * np.sin(2 * np.pi * k * x_d / lx)
    fy = 1.0 - (y_d - yw) / yd
    s_lo = 0.5 * (np.sign(fy) + 1.0)
    s_hi = 0.5 * (np.sign(1.0 - fy) + 1.0)
    temp_wave = temp_delta * (fy * s_lo * s_hi + (1.0 - s_hi))

    temp_delta2, x2, x3 = -0.3, 110.0e3, 130.0e3
    yw2 = y0 - ya / 2 * np.sin(np.pi * (x_d - x2) / (x3 - x2))
    fy2 = 1.0 - (y_d - yw2) / (yd / 2)
    s_lo2 = 0.5 * (np.sign(fy2) + 1.0)
    s_hi2 = 0.5 * (np.sign(2.0 - fy2) + 1.0)
    temp_wave2 = temp_delta2 * (fy2 * s_lo2 * s_hi2 + (1.0 - s_hi2))
    s_w2 = 0.5 * (np.sign(x_d - x2) * (-1) * np.sign(x_d - x3) + 1.0) * s_hi2

    temp_hor = s_w2 * temp_wave2 + (1.0 - s_w2) * temp_wave  # (nc, 3)
    bounds = (temp_bot + temp_delta + temp_delta2, temp_surf)
    return temp_vert + temp_hor[:, :, None, None], bounds


def run_problem(reso_dx=10.0, poly_order=1, element_family="dg-dg",
                reynolds_number=20.0, viscosity_scale=None, dt=300.0,
                laxfriedrichs_vel=0.0, laxfriedrichs_trc=0.0,
                number_of_z_levels=None, viscosity="const"):
    """Run the eddy test with the reference's option ladder (ref
    ``baroclinic_eddies.py:35-160``).  Returns the solver object."""
    delta_x = reso_dx * 1.0e3
    nlayers = (number_of_z_levels if number_of_z_levels is not None
               else get_nlayers(delta_x))
    lx, ly = 160e3, 500e3
    nx, ny = int(lx / delta_x), int(ly / delta_x)
    delta_x = lx / nx
    depth = 1000.0
    u_max, w_max = 1.0, 1e-3
    uscale = 0.1
    if viscosity_scale is None:
        nu_scale = uscale * delta_x / reynolds_number
        visc_str = f"Re{reynolds_number}"
    else:
        nu_scale = viscosity_scale
        reynolds_number = uscale * delta_x / nu_scale
        visc_str = f"nu{nu_scale}"
    f_cori = -1.2e-4
    bottom_drag = 0.01
    t_end = 320 * 24 * 3600.0
    t_export = 3 * 3600.0
    if os.environ.get("THETIS_REGRESSION_TEST"):
        t_export = 900.0
        t_end = t_export
        nlayers = 4

    reso_str = f"dx{np.round(delta_x / 1000.0, decimals=1)}_nz{nlayers}"
    if dt is not None:
        reso_str += f"_dt{np.round(dt, 1)}"
    options_str = "_".join([
        reso_str, element_family, "tri", f"p{poly_order}",
        f"visc-{viscosity}", visc_str,
        f"lf-vel{laxfriedrichs_vel:.1f}", f"lf-trc{laxfriedrichs_trc:.1f}",
    ])
    outputdir = "outputs_" + options_str

    mesh2d = PeriodicRectangleMesh(nx, ny, lx, ly, direction="x")
    P1_2d = FunctionSpace(mesh2d, "CG", 1)
    bathymetry_2d = Function(P1_2d, name="Bathymetry").assign(depth)

    salt_const = 35.0
    temp_bot, temp_surf = 10.1, 13.1
    physical_constants["rho0"] = 1000.0

    solver_obj = FlowSolver(mesh2d, bathymetry_2d, nlayers)
    options = solver_obj.options
    options.timestepper_type = "SSPRK22"
    options.solve_salinity = False
    options.constant_salinity = salt_const
    options.solve_temperature = True
    options.use_implicit_vertical_diffusion = True
    options.use_bottom_friction = True
    options.quadratic_drag_coefficient = bottom_drag
    options.use_baroclinic_formulation = True
    options.coriolis_frequency = f_cori
    if laxfriedrichs_vel > 0:
        options.lax_friedrichs_velocity_scaling_factor = laxfriedrichs_vel
    if laxfriedrichs_trc > 0:
        options.use_lax_friedrichs_tracer = True
        options.lax_friedrichs_tracer_scaling_factor = laxfriedrichs_trc
    options.use_limiter_for_tracers = True
    options.use_limiter_for_velocity = True
    options.vertical_viscosity = 1.0e-4
    if viscosity == "smag":
        options.use_smagorinsky_viscosity = True
        options.smagorinsky_coefficient = 1.0 / np.sqrt(reynolds_number)
        options.horizontal_viscosity_scale = nu_scale
    elif viscosity == "const":
        options.horizontal_viscosity = nu_scale
        options.horizontal_viscosity_scale = nu_scale
    elif viscosity != "none":
        raise ValueError(f"Unknown viscosity type {viscosity}")
    options.horizontal_velocity_scale = u_max
    options.vertical_velocity_scale = w_max
    options.check_volume_conservation_2d = True
    options.check_volume_conservation_3d = True
    options.check_temperature_conservation = True
    options.check_temperature_overshoot = True
    options.equation_of_state_type = "linear"
    options.equation_of_state_options = dict(
        rho_ref=1000.0, alpha=0.2, beta=0.0, th_ref=5.0, s_ref=salt_const)
    options.simulation_export_time = t_export
    options.simulation_end_time = t_end
    options.timestep = dt if dt is not None else 300.0
    options.output_directory = outputdir
    options.no_exports = True

    solver_obj.create_equations()
    temp0, bounds = initial_temperature(mesh2d, nlayers, depth,
                                        temp_bot, temp_surf)
    solver_obj.assign_initial_conditions(temp=np.asarray(
        np.broadcast_to(temp0, solver_obj.shape3)))
    rpe = RPECalculator(solver_obj)
    solver_obj.add_callback(rpe)
    solver_obj.iterate()

    T = np.asarray(solver_obj.fields.temp_3d.data)
    uv3 = np.asarray(solver_obj.fields.uv_3d.data)
    assert np.isfinite(T).all() and np.isfinite(uv3).all()
    # limiter keeps temperature within the initial range
    assert T.min() > bounds[0] - 0.1
    assert T.max() < bounds[1] + 0.1
    # the front begins geostrophic adjustment: flow appears
    assert np.abs(uv3).max() > 1e-4
    # spurious mixing stays tiny over the short regression window
    rpe_val, rel_rpe = rpe()
    print_output(f"final RPE {rpe_val:.6e}, rel {rel_rpe:.3e}")
    assert abs(rel_rpe) < 1e-3, f"excessive spurious mixing: {rel_rpe}"
    return solver_obj


if __name__ == "__main__":
    run_problem()
