# DOME — Dynamics of Overflow Mixing and Entrainment (Legg et al. 2006)
# =====================================================================
#
# Port of the reference's ``examples/dome/dome.py``: a dense gravity
# current enters a sloping basin from an embayment and descends the
# slope while turning right under rotation.  Exercises 3D inflow
# boundary conditions (momentum 'uv' + tracer 'value'), the linear EOS
# and baroclinic ALE dynamics on a notched (L-shaped) domain; geometry
# and inflow profiles follow the reference's ``dome_setup.py``.
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu import *
from thetis_tpu.mesh.mesh2d import Mesh2d
from thetis_tpu.model.flowsolver3d import FlowSolver

physical_constants["rho0"] = 1000.0

# geometry (ref dome_setup.py)
bay_width = 100e3
bay_length = 50e3
bay_x = [800e3, 900e3]
basin_x = [-120e3, 1100e3]
basin_ly = 600e3
basin_depth, bay_depth = 3600.0, 600.0
y_slope = [300e3, 600e3]

dx = 20e3
nlayers = 12
t_end = 40 * 24 * 3600.0
t_export = 6 * 3600.0
if os.environ.get("THETIS_REGRESSION_TEST"):
    dx = 40e3
    nlayers = 6
    t_export = 1800.0
    t_end = 5 * t_export

# --- notched structured mesh ------------------------------------------
nx = int(round((basin_x[1] - basin_x[0]) / dx))
ny = int(round((basin_ly + bay_length) / dx))
xs = np.linspace(basin_x[0], basin_x[1], nx + 1)
ys = np.linspace(0.0, basin_ly + bay_length, ny + 1)
X, Y = np.meshgrid(xs, ys, indexing="ij")
coords = np.stack([X.ravel(), Y.ravel()], axis=1)


def vid(i, j):
    return i * (ny + 1) + j


quads = []
for i in range(nx):
    for j in range(ny):
        xm = 0.5 * (xs[i] + xs[i + 1])
        ym = 0.5 * (ys[j] + ys[j + 1])
        if ym > basin_ly and not (bay_x[0] < xm < bay_x[1]):
            continue  # outside the embayment notch
        quads.append((i, j))
quads = np.asarray(quads)
i, j = quads[:, 0], quads[:, 1]
tri1 = np.stack([vid(i, j), vid(i + 1, j), vid(i + 1, j + 1)], axis=1)
tri2 = np.stack([vid(i, j), vid(i + 1, j + 1), vid(i, j + 1)], axis=1)
cells = np.concatenate([tri1, tri2], axis=0)
# drop unused vertices
used = np.unique(cells)
remap = -np.ones(len(coords), np.int64)
remap[used] = np.arange(len(used))
coords = coords[used]
cells = remap[cells]

ytop = basin_ly + bay_length


def markers(mid):
    m = np.zeros(len(mid), dtype=np.int32)
    m[np.abs(mid[:, 1] - ytop) < 1e-3] = 5       # bay head: inflow
    m[np.abs(mid[:, 0] - basin_x[1]) < 1e-3] = 2  # east: open
    return m


mesh2d = Mesh2d(coords, cells, boundary_markers=markers, name="dome")

# --- bathymetry ---------------------------------------------------------
yv = mesh2d.coords_np[:, 1]
bathy = np.where(
    yv >= y_slope[1], bay_depth,
    np.where(yv <= y_slope[0], basin_depth,
             basin_depth + (bay_depth - basin_depth)
             * (yv - y_slope[0]) / (y_slope[1] - y_slope[0])))
P1 = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1, name="Bathymetry")
bathymetry_2d.data = jnp.asarray(bathy)

# --- inflow profiles (ref dome_setup.py, Legg et al. 2006) --------------
temp_lim = [10.0, 20.0]
delta_rho = 2.0
alpha_eos = delta_rho / (temp_lim[1] - temp_lim[0])
h_0, h_e = 300.0, bay_depth
g = 9.81
db_0 = g / 1000.0 * delta_rho
U_0 = np.sqrt(db_0 * h_0)
f_0 = 1e-4
L_rho = U_0 / f_0
Ri_m = 1.0 / 3.0

solver_obj = FlowSolver(mesh2d, bathymetry_2d, nlayers)
options = solver_obj.options
options.timestepper_type = "SSPRK22"
options.solve_salinity = False
options.solve_temperature = True
options.constant_salinity = 0.0
options.use_baroclinic_formulation = True
options.use_quadratic_pressure = True  # ref enables P2DGxP2 head here
options.use_implicit_vertical_diffusion = True
options.use_bottom_friction = True
options.quadratic_drag_coefficient = 2e-3
options.coriolis_frequency = f_0
options.use_limiter_for_tracers = True
options.vertical_viscosity = 1e-3
options.vertical_diffusivity = 1e-5
options.horizontal_viscosity = 100.0
options.horizontal_diffusivity = 50.0
options.equation_of_state_type = "linear"
options.equation_of_state_options = dict(
    rho_ref=1000.0, alpha=alpha_eos, beta=0.0, th_ref=temp_lim[1],
    s_ref=0.0)
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.timestep = 150.0 if os.environ.get("THETIS_REGRESSION_TEST") else 75.0
options.no_exports = True

# inflow: dense water occupying the bottom h(x_w) of the bay columns
solver_obj.create_function_spaces()
xy_dof = mesh2d.coords_np[mesh2d.cells_np]  # (nc, 3, 2)
x_d, y_d = xy_dof[..., 0], xy_dof[..., 1]
sig = np.linspace(0.0, 1.0, nlayers + 1)  # sigma from bottom (0) to top (1)
z_frac = 0.5 * (sig[:-1] + sig[1:])

x_w = np.clip(x_d - bay_x[0], 0.0, bay_width)
h_in = h_0 * np.exp(-x_w / L_rho)  # (nc, 3)
# column structure at the bay depth h_e: dense (T_low) below h(x_w)
zn = np.stack([sig[:-1], sig[1:]], axis=-1)  # (nz, 2) bottom/top fractions
depth_frac = zn[None, None]  # (1, 1, nz, 2)
z_above_bed = depth_frac * h_e
dense = (z_above_bed < h_in[:, :, None, None]).astype(float)
temp_in = temp_lim[1] + (temp_lim[0] - temp_lim[1]) * dense  # (nc,3,nz,2)
v_in = -U_0 * dense  # southward inflow in the dense layer

uv_in = np.stack([np.zeros_like(v_in), v_in], axis=-1)
solver_obj.bnd_functions["shallow_water"] = {
    5: {"flux": Constant(-U_0 * h_0 * L_rho * (1 - np.exp(-bay_width / L_rho)))},
    2: {"elev": Constant(0.0)},
}
solver_obj.bnd_functions["momentum"] = {
    5: {"uv": jnp.asarray(uv_in)},
    2: {"symm": None},
}
solver_obj.bnd_functions["temp"] = {5: {"value": jnp.asarray(temp_in)}}

solver_obj.create_equations()
# ambient stratification: linear from T_low at the basin bottom
z_bed = -np.asarray(bathymetry_2d.data)[mesh2d.cells_np]  # (nc, 3)
z_nodes = z_bed[:, :, None, None] * (1.0 - depth_frac)  # z<0 downward
temp0 = temp_lim[1] + (temp_lim[1] - temp_lim[0]) * z_nodes / basin_depth
solver_obj.assign_initial_conditions(temp=jnp.asarray(temp0))

if __name__ == "__main__":
    solver_obj.iterate()
    T = np.asarray(solver_obj.fields.temp_3d.data)
    uv3 = np.asarray(solver_obj.fields.uv_3d.data)
    assert np.isfinite(T).all() and np.isfinite(uv3).all()
    assert T.min() > temp_lim[0] - 0.2 and T.max() < temp_lim[1] + 0.2
    # the dense inflow has entered the bay: bottom-layer water south of
    # the bay head is colder than the initial profile there
    bay = (x_d > bay_x[0]) & (x_d < bay_x[1]) & (y_d > basin_ly - 1e-3)
    t_bot = T[:, :, 0, 0]
    t0_bot = temp0[:, :, 0, 0]
    assert (t_bot[bay] - t0_bot[bay]).min() < -0.05, "no dense inflow"
    assert np.abs(uv3).max() > 1e-3
