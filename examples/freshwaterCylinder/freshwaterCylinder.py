# Geostrophic freshwater cylinder (Tartinville et al. 1998)
# ==========================================================
#
# Port of the reference's ``examples/freshwaterCylinder/freshwaterCylinder.py``:
# a 30 x 30 km, 20 m deep box on an f-plane (f = 1.15e-4) with a 3 km
# freshwater cylinder (salinity 33.75 at the core, 34.85 outside, upper
# 10 m).  The cylinder geostrophically adjusts into anticyclonic rotation;
# the intercomparison metrics are conservation of salt mass, total
# (relative) vorticity and angular momentum.
#
# Linear EOS: rho = 1025 + 0.78 (S - 33.75); no bottom friction, explicit
# vertical diffusion, SSPRK22 mode-split stepping.
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu import *
from thetis_tpu.model.flowsolver3d import FlowSolver

rho0 = 1025.0
physical_constants["rho0"] = rho0

REGRESSION = bool(os.environ.get("THETIS_REGRESSION_TEST"))
layers = 3 if REGRESSION else 7
nx = 12 if REGRESSION else 25  # reference 'coarse' msh: ~1.2 km resolution
lx = 30e3
mesh2d = RectangleMesh(nx, nx, lx, lx, originX=-lx / 2, originY=-lx / 2)

dt = 25.0
t_end = 360 * 3600.0
t_export = 900.0
depth = 20.0
if REGRESSION:
    t_export = 10 * dt
    t_end = t_export

temp_const = 10.0
salt_center = 33.75
salt_outside = 34.85
f0 = 1.15e-4

reynolds_number = 75.0
delta_x = lx / nx
nu_scale = 1.0 * delta_x / reynolds_number

P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").assign(depth)

solver_obj = FlowSolver(mesh2d, bathymetry_2d, layers)
options = solver_obj.options
options.element_family = "dg-dg"
options.timestepper_type = "SSPRK22"
options.solve_salinity = True
options.solve_temperature = False
options.constant_temperature = temp_const
options.use_implicit_vertical_diffusion = False
options.use_bottom_friction = False
options.use_baroclinic_formulation = True
options.coriolis_frequency = f0
options.use_lax_friedrichs_velocity = False
options.use_lax_friedrichs_tracer = False
options.vertical_viscosity = 1.3e-6
options.vertical_diffusivity = 1.4e-7
options.use_limiter_for_tracers = True
options.horizontal_viscosity = nu_scale
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.horizontal_velocity_scale = 1.5
options.timestep = dt
options.equation_of_state_type = "linear"
options.equation_of_state_options = dict(
    rho_ref=rho0, s_ref=33.75, th_ref=5.0, alpha=0.0, beta=0.78)
options.no_exports = True

solver_obj.initialize()

# initial salinity: radial power-8 profile in the upper 10 m
# (ref ``freshwaterCylinder.py:273-281``), cropped at the ambient value
x = mesh2d.coords_np[mesh2d.cells_np]  # (nc, 3, 2) P1DG nodes
r_km3 = np.sqrt((x ** 2).sum(-1)) / 1000.0 / 3.0  # (nc, 3)
z_levels = -(1.0 - np.asarray(solver_obj.extruded.sigma)) * depth  # (nz+1,)
z_nodes = np.stack([z_levels[:-1], z_levels[1:]], axis=-1)  # (nz, 2)
zfac = (1.0 - np.tanh(10.0 * (z_nodes + 10.0))) * 0.5  # 0 above -10 m, 1 below
salt0 = salt_center + 1.1 * (
    r_km3[:, :, None, None] + zfac[None, None]) ** 8
salt0 = np.minimum(salt0, salt_outside)
solver_obj.assign_initial_conditions(salt=jnp.asarray(salt0))


def _metrics():
    """Salt mass, total relative vorticity and angular momentum (the
    reference's VorticityCalculator / AngularMomentumCalculator
    diagnostics, computed on the P1DG prism fields)."""
    from thetis_tpu.model.diagnostics import VorticityCalculator2D

    s = solver_obj
    mesh = mesh2d
    area = np.asarray(mesh.cell_area_np)
    salt = np.asarray(s.fields.salt_3d.data)  # (nc, 3, nz, 2)
    uv = np.asarray(s.fields.uv_3d.data)      # (nc, 3, nz, 2, 2)
    dz = depth / salt.shape[2]
    # nodal quadrature: cell mean over 3 horizontal x 2 vertical nodes
    salt_mass = (salt.mean(axis=(1, 3)) * dz).sum(axis=1) @ area
    # relative vorticity of the depth-averaged flow (P1 projection)
    uv_dav = uv.mean(axis=(2, 3))  # (nc, 3, 2)
    vort = VorticityCalculator2D(s.eq_sw.asm)
    zeta = np.asarray(vort.solve(jnp.asarray(uv_dav)))  # (nv,)
    vort_int = (zeta[mesh.cells_np].mean(axis=1) * area).sum() * depth
    # angular momentum per unit mass: int (x v - y u) rho dV / int rho dV
    xn = mesh.coords_np[mesh.cells_np]  # (nc, 3, 2)
    ang = (xn[:, :, 0] * uv_dav[:, :, 1]
           - xn[:, :, 1] * uv_dav[:, :, 0]).mean(axis=1) @ area
    return salt_mass, vort_int, ang


mass0, vort0, ang0 = _metrics()
solver_obj.iterate()
mass1, vort1, ang1 = _metrics()

salt = np.asarray(solver_obj.fields.salt_3d.data)
uv = np.asarray(solver_obj.fields.uv_3d.data)
assert np.isfinite(salt).all() and np.isfinite(uv).all()
# salt mass conservation (DG advection is conservative)
assert abs(mass1 - mass0) < 1e-6 * abs(mass0), (mass0, mass1)
# limiter keeps salinity in its initial range
assert salt.min() > salt_center - 0.01 and salt.max() < salt_outside + 0.01
# the adjustment spins up anticyclonic motion (f > 0, light core):
# total relative vorticity stays near zero but local speed develops
assert np.abs(uv).max() > 1e-6
print_output(
    f"salt mass rel drift {abs(mass1 - mass0) / abs(mass0):.2e}, "
    f"vorticity {vort0:.3e} -> {vort1:.3e}, angmom {ang0:.3e} -> {ang1:.3e}"
)
