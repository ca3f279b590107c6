# Rhine ROFI: idealized river plume under tidal forcing
# ======================================================
#
# Port of the reference's ``examples/rhineROFI/rhineROFI.py`` (de Boer
# et al. 2006; Fischer et al. 2009): a 724 x 764 km ocean box with a
# 45 km river channel discharging 1500 m3/s of freshwater at 52.5 N,
# forced by an M2 Kelvin wave along the open boundaries.  3D baroclinic
# LeapFrog-AM3 (ALE) stepping with GLS turbulence, Smagorinsky
# viscosity, bottom friction and tracer limiting.
#
# The gmsh domain is replaced by a graded tensor-product mesh: fine
# (2 km) around the river mouth, coarsening geometrically offshore; the
# river channel (2 km wide) attaches conformally at y = 30 km.
import math
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu import *
from thetis_tpu.mesh.mesh2d import Mesh2d
from thetis_tpu.model.flowsolver3d import FlowSolver

physical_constants["rho0"] = 1000.0

REGRESSION = bool(os.environ.get("THETIS_REGRESSION_TEST"))
layers = 2 if REGRESSION else 12

# physical parameters (ref L78-100)
eta_amplitude = 1.0
H_ocean, H_river = 20.0, 5.0
L_river, W_river, Y_river = 45e3, 2e3, 30e3
Q_river = 1.5e3
temp_const = 10.0
salt_river, salt_ocean = 0.0, 32.0
Ttide = 44714.0
Tday = 0.99726968 * 24 * 3600
omega_earth = 2 * np.pi / Tday
omega_tide = 2 * np.pi / Ttide
g = float(physical_constants["g_grav"])
c_wave = math.sqrt(g * H_ocean)
coriolis_f = 2 * omega_earth * math.sin(math.radians(52.5))
kelvin_k = omega_tide / c_wave     # alongshore wavenumber
kelvin_m = coriolis_f / c_wave     # cross-shore decay

dt = 7.0
t_end = 34 * Ttide
t_export = Ttide / 40
if REGRESSION:
    t_export = 10 * dt
    t_end = t_export


def _graded(x0, x1, dx0, ratio, reverse=False):
    """Grid lines from x0 to x1 starting at spacing dx0, growing by
    ``ratio`` per cell; the last line lands exactly on x1."""
    xs = [0.0]
    d = dx0
    while xs[-1] < (x1 - x0):
        xs.append(xs[-1] + d)
        d *= ratio
    xs = np.asarray(xs) * (x1 - x0) / xs[-1]
    return x0 + ((x1 - x0) - xs[::-1] if reverse else xs)


def make_rofi_mesh(coarse=2.0):
    """Ocean box [-Lx, 0] x [0, Ly] + river strip, conformally joined."""
    lx, ly = 724e3, 764e3
    dx0 = 2e3 * coarse
    # ocean grid lines: fine at the coast (x=0) / mouth (y ~ 30 km)
    xs = _graded(-lx, 0.0, dx0, 1.35, reverse=True)
    ys_south = _graded(0.0, Y_river - W_river / 2, dx0, 1.35, reverse=True)
    ys_mouth = np.asarray([Y_river - W_river / 2, Y_river + W_river / 2])
    ys_north = _graded(Y_river + W_river / 2, ly, dx0, 1.35)
    ys = np.unique(np.concatenate([ys_south, ys_mouth, ys_north]))
    nxo, nyo = len(xs) - 1, len(ys) - 1

    coords = []
    vid = {}

    def add(x, y):
        key = (round(x, 3), round(y, 3))
        if key not in vid:
            vid[key] = len(coords)
            coords.append((x, y))
        return vid[key]

    cells = []

    def add_quad(x0, x1, y0, y1):
        v00, v10 = add(x0, y0), add(x1, y0)
        v01, v11 = add(x0, y1), add(x1, y1)
        cells.append((v00, v10, v11))
        cells.append((v00, v11, v01))

    for i in range(nxo):
        for j in range(nyo):
            add_quad(xs[i], xs[i + 1], ys[j], ys[j + 1])
    # river channel: [0, L_river] x [Y_river +- W/2], 1 cell across
    xr = _graded(0.0, L_river, dx0, 1.2)
    for i in range(len(xr) - 1):
        add_quad(xr[i], xr[i + 1], Y_river - W_river / 2,
                 Y_river + W_river / 2)

    coords = np.asarray(coords)
    cells = np.asarray(cells, dtype=np.int32)
    eps = 1.0

    def markers(mid):
        m = np.zeros(len(mid), dtype=np.int32)
        m[np.abs(mid[:, 1]) < eps] = 1                  # south
        m[np.abs(mid[:, 0] + lx) < eps] = 2             # west
        m[np.abs(mid[:, 1] - ly) < eps] = 3             # north
        m[np.abs(mid[:, 0] - L_river) < eps] = 6        # river inlet
        return m

    return Mesh2d(coords, cells, boundary_markers=markers,
                  name="rhine_rofi")


mesh2d = make_rofi_mesh(coarse=16.0 if REGRESSION else 1.0)
print_output(f"ROFI mesh: {mesh2d.nc} cells, {mesh2d.nv} vertices")

P1_2d = FunctionSpace(mesh2d, "CG", 1)
xv, yv = mesh2d.coords_np[:, 0], mesh2d.coords_np[:, 1]
bathymetry_2d = Function(P1_2d, name="Bathymetry")
bathymetry_2d.data = jnp.asarray(np.where(
    xv <= 0.0, H_ocean,
    H_ocean * (1 - xv / L_river) + H_river * (xv / L_river)))

solver_obj = FlowSolver(mesh2d, bathymetry_2d, layers)
options = solver_obj.options
options.element_family = "dg-dg"
options.timestepper_type = "LeapFrogAM3"
options.solve_salinity = True
options.solve_temperature = False
options.constant_temperature = temp_const
options.use_implicit_vertical_diffusion = True
options.use_bottom_friction = True
options.bottom_roughness = 0.005
options.use_turbulence = True
options.use_baroclinic_formulation = True
options.use_lax_friedrichs_velocity = True
options.use_lax_friedrichs_tracer = True
options.vertical_viscosity = 1.3e-6
options.vertical_diffusivity = 1.4e-7
options.use_limiter_for_tracers = True
options.use_smagorinsky_viscosity = True
options.smagorinsky_coefficient = 1.0 / math.sqrt(5.0)
options.coriolis_frequency = coriolis_f
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.horizontal_velocity_scale = 2.0
options.check_salinity_overshoot = True
options.check_salinity_conservation = True
options.timestep = dt
options.no_exports = True

# Kelvin-wave boundary forcing (ref L163-185): elevation along the open
# ocean boundaries, evaluated on the CG1 nodes each step
bnd_time = {"t": 0.0}


def kelvin_elev(t):
    return (eta_amplitude * np.exp(xv * kelvin_m)
            * np.cos(yv * kelvin_k - omega_tide * t))


bnd_elev = Function(P1_2d, name="bnd elevation")
bnd_elev.data = jnp.asarray(kelvin_elev(0.0))

solver_obj.bnd_functions["shallow_water"] = {
    1: {"elev": bnd_elev},
    2: {"elev": bnd_elev},
    3: {"elev": bnd_elev},
    6: {"flux": Constant(-Q_river)},
}
solver_obj.bnd_functions["momentum"] = {
    1: {"symm": None}, 2: {"symm": None}, 3: {"symm": None},
    6: {"symm": None},
}
solver_obj.bnd_functions["salt"] = {
    1: {"value": Constant(salt_ocean)},
    2: {"value": Constant(salt_ocean)},
    3: {"value": Constant(salt_ocean)},
    6: {"value": Constant(salt_river)},
}

solver_obj.initialize()

# initial state: equilibrium Kelvin wave + salinity front at the mouth
xc = mesh2d.coords_np[mesh2d.cells_np]  # (nc, 3, 2)
elev0 = np.where(
    xc[..., 0] <= 0.0,
    eta_amplitude * np.exp(xc[..., 0] * kelvin_m) * np.cos(
        xc[..., 1] * kelvin_k),
    eta_amplitude * np.cos(xc[..., 1] * kelvin_k))
v0 = np.where(
    xc[..., 0] <= 0.0,
    (g * kelvin_k / omega_tide) * eta_amplitude
    * np.exp(xc[..., 0] * kelvin_m) * np.cos(xc[..., 1] * kelvin_k),
    0.0)
uv0 = np.stack([np.zeros_like(v0), v0], axis=-1)
xoff, sigma_f = 10.5e3, 2000.0
salt2d = (salt_ocean - (salt_ocean - salt_river)
          * (1 + np.tanh((xc[..., 0] - xoff) / sigma_f)) / 2)
salt0 = np.broadcast_to(
    salt2d[:, :, None, None], salt2d.shape + (layers, 2)).copy()
solver_obj.assign_initial_conditions(
    elev=jnp.asarray(elev0), uv_2d=jnp.asarray(uv0),
    salt=jnp.asarray(salt0))


def freshwater_volume():
    """int (1 - S/S_ocean) dV — the reference's freshwater conservation
    diagnostic (``FreshwaterConservationCallback``)."""
    s = np.asarray(solver_obj.fields.salt_3d.data)  # (nc, 3, nz, 2)
    elev = np.asarray(solver_obj.fields.elev_2d.data)  # (nc, 3)
    area = np.asarray(mesh2d.cell_area_np)
    depth = np.asarray(bathymetry_2d.data)[mesh2d.cells_np] + elev
    fresh = (1.0 - s / salt_ocean).mean(axis=(1, 2, 3))
    return float((fresh * depth.mean(axis=1) * area).sum())


def update_forcings(t):
    bnd_elev.data = jnp.asarray(kelvin_elev(t))


fw0 = freshwater_volume()
solver_obj.iterate(update_forcings=update_forcings)
fw1 = freshwater_volume()

salt = np.asarray(solver_obj.fields.salt_3d.data)
uv3 = np.asarray(solver_obj.fields.uv_3d.data)
elev = np.asarray(solver_obj.fields.elev_2d.data)
assert np.isfinite(salt).all() and np.isfinite(uv3).all()
assert np.isfinite(elev).all()
# limiter keeps salinity within the physical range
assert salt.min() > -0.01 and salt.max() < salt_ocean + 0.01
# freshwater volume only changes through the river inflow; over the short
# regression window the relative drift must stay small
drift = abs(fw1 - fw0) / max(abs(fw0), 1.0)
print_output(f"freshwater volume {fw0:.4e} -> {fw1:.4e} "
             f"(rel change {drift:.2e})")
if REGRESSION:
    assert drift < 0.05, drift
