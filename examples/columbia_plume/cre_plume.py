# Columbia river plume
# ====================
#
# Port of the reference's ``examples/columbia_plume/cre-plume.py``: a
# realistic-domain 3D baroclinic plume simulation on the reference's
# unstructured CMOP shelf mesh (UTM zone 10), with GLS turbulence,
# Smagorinsky viscosity, tidal elevation forcing on the open ocean
# boundaries, a river discharge boundary and boundary-relaxation
# viscosity sponges (ref ``cre-plume.py:169-180``).
#
# The reference drives this case from unshipped netCDF archives (NCOM
# ocean state, NAM winds, FES2004 tides, CMOP bathymetry).  This port
# keeps the full model configuration (ref ``cre-plume.py:120-165``) but
# synthesizes the data-driven inputs:
#
# * mesh — the reference's ``mesh_cre-plume_03_coarse.msh`` is read at
#   runtime when available (the reader handles gmsh 2.2); otherwise a
#   structured shelf box stands in,
# * bathymetry — a shelf profile from the distance to the coast,
#   smoothed by the diffusion iteration of ref ``bathymetry.py``'s
#   ``smooth_bathymetry`` (min depth 3.5 m, 30 sweeps),
# * tides — M2 + K1 harmonic elevation (ref uses FES2004 amplitudes),
#   ramped over 12 h exactly as ref ``cre-plume.py:236-240``,
# * river — constant 5000 m3/s discharge (a typical spring freshet;
#   ref interpolates the Beaver Army Terminal gauge).
import math
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu import *
from thetis_tpu.mesh.mesh2d import Mesh2d
from thetis_tpu.mesh.gmsh import Mesh
from thetis_tpu.model.flowsolver3d import FlowSolver
from thetis_tpu.model.forcing import TidalBoundaryForcing
from thetis_tpu.utils.coordsys import beta_plane_coriolis_params

physical_constants["rho0"] = 1000.0

REGRESSION = bool(os.environ.get("THETIS_REGRESSION_TEST"))

REF_MESH = "/root/reference/examples/columbia_plume/mesh_cre-plume_03_coarse.msh"

# boundary ids of the coarse mesh (ref ``cre-plume.py:73-77``)
north_bnd_id, coast_bnd_id, west_bnd_id = 2, 3, 4
river_bnd_id, south_bnd_id = 5, 6
open_bnd_ids = [north_bnd_id, west_bnd_id, south_bnd_id]

nlayers, z_stretch = (9, 4.0) if not REGRESSION else (3, 2.0)
dt = 30.0
t_export = 900.0
t_end = 3 * 24 * 3600.0
if REGRESSION:
    t_export = 8 * dt
    t_end = t_export

salt_river, salt_ocean = 0.0, 32.0
temp_river, temp_ocean = 12.0, 10.0
q_river = 5.0e3        # m3/s
reynolds_number = 160.0
u_scale, delta_x = 3.0, 2e3
nu_scale = u_scale * delta_x / reynolds_number
coriolis_f, _ = beta_plane_coriolis_params(46.25)


def make_fallback_mesh():
    """Structured stand-in when the reference mesh is absent: a
    270 x 430 km shelf box with the same marker ids."""
    from thetis_tpu.mesh.generation import RectangleMesh
    m = RectangleMesh(14, 22, 270e3, 430e3, originX=215e3, originY=4.911e6)
    # RectangleMesh markers: 1=x-, 2=x+, 3=y-, 4=y+
    remap = {1: west_bnd_id, 2: coast_bnd_id, 3: south_bnd_id,
             4: north_bnd_id}
    fm = np.asarray(m.facet_marker_np).copy()
    for a, b in remap.items():
        fm[np.asarray(m.facet_marker_np) == a] = b
    # one coast facet near the river mouth latitude becomes the river
    mids = m.coords_np[m.facet_verts_np].mean(axis=1)
    coast = np.where(fm == coast_bnd_id)[0]
    j = coast[np.argmin(np.abs(mids[coast, 1] - 5.1145e6))]
    fm[j] = river_bnd_id
    return Mesh2d(m.coords_np, m.cells_np,
                  boundary_markers=np.column_stack(
                      [m.facet_verts_np[fm > 0][:, 0],
                       m.facet_verts_np[fm > 0][:, 1],
                       fm[fm > 0]]),
                  name="cre_fallback")


if os.path.exists(REF_MESH):
    mesh2d = Mesh(REF_MESH)
else:
    mesh2d = make_fallback_mesh()
print_output(f"CRE plume mesh: {mesh2d.nc} cells, {mesh2d.nv} vertices")

# ---------------------------------------------------------------------------
# vertex hop-distance to a marker set (used for both the synthetic
# bathymetry and the boundary viscosity sponge)
def vertex_distance_to(marker_ids):
    """Graph-propagated Euclidean distance from every vertex to the
    nearest boundary vertex of ``marker_ids`` (Bellman-Ford sweeps over
    the edge graph — the analogue of ref ``bathymetry.py``'s PDE-based
    distance, adequate at mesh resolution)."""
    fv = np.asarray(mesh2d.facet_verts_np)
    fm = np.asarray(mesh2d.facet_marker_np)
    coords = np.asarray(mesh2d.coords_np)
    cells = np.asarray(mesh2d.cells_np)
    edges = np.concatenate([cells[:, [0, 1]], cells[:, [1, 2]],
                            cells[:, [2, 0]]], axis=0)
    dist = np.full(mesh2d.nv, np.inf)
    seed = np.unique(fv[np.isin(fm, marker_ids)])
    dist[seed] = 0.0
    elen = np.linalg.norm(coords[edges[:, 0]] - coords[edges[:, 1]], axis=1)
    for _ in range(200):
        # two directed relaxations via scatter-min
        upd = dist.copy()
        np.minimum.at(upd, edges[:, 0], dist[edges[:, 1]] + elen)
        np.minimum.at(upd, edges[:, 1], dist[edges[:, 0]] + elen)
        if np.allclose(upd, dist, equal_nan=True):
            break
        dist = upd
    return np.where(np.isfinite(dist), dist, dist[np.isfinite(dist)].max())


def smooth_vertex_field(v, niter=30):
    """Jacobi smoothing over the vertex edge graph (ref
    ``bathymetry.py::smooth_bathymetry`` implicit-diffusion analogue)."""
    cells = np.asarray(mesh2d.cells_np)
    edges = np.concatenate([cells[:, [0, 1]], cells[:, [1, 2]],
                            cells[:, [2, 0]]], axis=0)
    deg = np.zeros(mesh2d.nv)
    np.add.at(deg, edges[:, 0], 1.0)
    np.add.at(deg, edges[:, 1], 1.0)
    for _ in range(niter):
        acc = np.zeros(mesh2d.nv)
        np.add.at(acc, edges[:, 0], v[edges[:, 1]])
        np.add.at(acc, edges[:, 1], v[edges[:, 0]])
        v = 0.5 * v + 0.5 * acc / np.maximum(deg, 1.0)
    return v


# synthetic CMOP-like bathymetry: 3.5 m at the coast/estuary deepening
# to ~1800 m at the shelf break, 15 m in the river channel
d_coast = vertex_distance_to([coast_bnd_id, river_bnd_id])
bathy_v = 3.5 + 1800.0 * (1.0 - np.exp(-d_coast / 60e3))
xv, yv = mesh2d.coords_np[:, 0], mesh2d.coords_np[:, 1]
in_river = (xv > 425e3) & (np.abs(yv - 5.115e6) < 25e3)
bathy_v = np.where(in_river, np.minimum(bathy_v, 15.0), bathy_v)
bathy_v = np.maximum(smooth_vertex_field(bathy_v, niter=30), 3.5)

P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry")
bathymetry_2d.data = jnp.asarray(bathy_v)

# boundary viscosity sponge (ref ``cre-plume.py:169-180``): 80 m2/s at
# the open boundaries relaxing to the interior value over 60 km
d_open = vertex_distance_to(open_bnd_ids)
visc_v = 1.0 + 80.0 * np.maximum(0.0, 1.0 - d_open / 60e3)
viscosity_2d = Function(P1_2d, name="visc_bnd")
viscosity_2d.data = jnp.asarray(visc_v)

solver_obj = FlowSolver(mesh2d, bathymetry_2d, nlayers,
                        extrude_options={"z_stretch_fact": z_stretch})
options = solver_obj.options
options.element_family = "dg-dg"
options.timestepper_type = "SSPRK22"
options.solve_salinity = True
options.solve_temperature = True
options.use_implicit_vertical_diffusion = True
options.use_bottom_friction = True
options.bottom_roughness = 0.005
options.use_turbulence = True   # GLS closure (the default model)
options.use_baroclinic_formulation = True
options.use_quadratic_pressure = True  # ref enables P2DGxP2 head here
options.use_lax_friedrichs_velocity = True
options.use_lax_friedrichs_tracer = False
options.lax_friedrichs_velocity_scaling_factor = 1.0
options.vertical_viscosity = 2e-5
options.vertical_diffusivity = 2e-5
options.horizontal_viscosity = viscosity_2d
options.horizontal_diffusivity = 1.0
options.use_limiter_for_tracers = True
options.use_smagorinsky_viscosity = True
options.smagorinsky_coefficient = 1.0 / math.sqrt(reynolds_number)
options.coriolis_frequency = coriolis_f
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.horizontal_velocity_scale = u_scale
options.vertical_velocity_scale = 1e-3
options.horizontal_viscosity_scale = nu_scale
options.check_salinity_overshoot = True
options.check_temperature_overshoot = True
options.timestep = dt
options.no_exports = True
options.equation_of_state_type = "full"

# tidal + river boundary forcing -------------------------------------------
fv = np.asarray(mesh2d.facet_verts_np)
fm = np.asarray(mesh2d.facet_marker_np)
open_verts = np.unique(fv[np.isin(fm, open_bnd_ids)])
amp = {"M2": np.full(mesh2d.nv, 0.9), "K1": np.full(mesh2d.nv, 0.4)}
phase = {"M2": 2e-6 * (yv - yv.min()),    # slow alongshore propagation
         "K1": np.zeros(mesh2d.nv)}
tide = TidalBoundaryForcing(amp, phase)

ramp_t = 12 * 3600.0
bnd_elev = Function(P1_2d, name="bnd elevation")
bnd_elev.data = jnp.asarray(np.zeros(mesh2d.nv))

river_flux = Constant(-q_river * min(1.0, dt / ramp_t))

solver_obj.bnd_functions["shallow_water"] = {
    north_bnd_id: {"elev": bnd_elev},
    west_bnd_id: {"elev": bnd_elev},
    south_bnd_id: {"elev": bnd_elev},
    river_bnd_id: {"flux": river_flux},
}
solver_obj.bnd_functions["momentum"] = {
    m: {"symm": None} for m in open_bnd_ids + [river_bnd_id]
}
solver_obj.bnd_functions["salt"] = {
    m: {"value": Constant(salt_ocean)} for m in open_bnd_ids
}
solver_obj.bnd_functions["salt"][river_bnd_id] = {
    "value": Constant(salt_river)}
solver_obj.bnd_functions["temp"] = {
    m: {"value": Constant(temp_ocean)} for m in open_bnd_ids
}
solver_obj.bnd_functions["temp"][river_bnd_id] = {
    "value": Constant(temp_river)}

# file-driven forcing branch (the reference's data chain, ref
# ``cre-plume.py``: NCOM ocean state archive + atmospheric wind files).
# Activated when real-format archives exist under $CRE_FORCING_DIR
# (default ./forcings): NCOM grid side files + daily s3d/t3d files set
# the initial T/S state, and ERA5-format wind files drive the surface
# stress through ``update_forcings``.  Without the archives the
# synthetic fallbacks below reproduce the same regime.
import glob as _glob
import datetime as _dt
from thetis_tpu.utils.timezone import FixedTimeZone as _FTZ

FORCING_DIR = os.environ.get("CRE_FORCING_DIR", "forcings")
_ncom_dir = os.path.join(FORCING_DIR, "ncom")
_atm_pattern = os.path.join(FORCING_DIR, "atm", "wind_*.nc")
USE_NCOM = os.path.exists(os.path.join(_ncom_dir, "model_lat.nc"))
USE_ATM = bool(_glob.glob(_atm_pattern))
_init_date = _dt.datetime.strptime(
    os.environ.get("CRE_INIT_DATE", "2006-05-01"), "%Y-%m-%d"
).replace(tzinfo=_FTZ(0, "UTC"))

wind_field = None
if USE_ATM:
    from thetis_tpu.model.forcing_adapters import ERA5Interpolator
    from thetis_tpu.utils.coordsys import UTMCoordinateSystem
    _cs = UTMCoordinateSystem(utm_zone=10)
    _lonv, _latv = _cs.to_lonlat(mesh2d.coords_np[:, 0],
                                 mesh2d.coords_np[:, 1])
    wind_field = Function(FunctionSpace(mesh2d, "CG", 1, dim=2),
                          name="wind stress")
    atm_interp = ERA5Interpolator(
        np.column_stack([_lonv, _latv]), _atm_pattern, _init_date,
        wind_stress_field=wind_field)
    options.wind_stress = wind_field
    print_output(f"columbia_plume: ERA5-format wind forcing from "
                 f"{_atm_pattern}")

solver_obj.initialize()

# initial state: NCOM-archive T/S when the files are present (the
# reference's ``interpolate_ocean_*`` chain, ref cre-plume.py), else
# ocean salinity with a fresh estuary, weakly stratified temperature
xc = mesh2d.coords_np[mesh2d.cells_np]           # (nc, 3, 2)
est = ((xc[..., 0] > 425e3) & (np.abs(xc[..., 1] - 5.115e6) < 25e3))
salt2d = np.where(est, salt_river, salt_ocean)
salt0 = np.broadcast_to(salt2d[:, :, None, None],
                        salt2d.shape + (nlayers, 2)).copy()
sig = solver_obj.extruded.sigma_np
z_mid = 0.5 * (sig[:-1] + sig[1:])               # (nz,) in [0, 1]
temp_prof = temp_ocean + 4.0 * z_mid             # warmer at surface
temp0 = np.broadcast_to(temp_prof[None, None, :, None],
                        (mesh2d.nc, 3, nlayers, 2)).copy()
if USE_NCOM:
    from thetis_tpu.model.forcing_adapters import NCOMInterpolator
    from thetis_tpu.utils.coordsys import UTMCoordinateSystem
    _cs = UTMCoordinateSystem(utm_zone=10)
    _lon3, _lat3 = _cs.to_lonlat(xc[..., 0], xc[..., 1])
    _z_if = np.asarray(solver_obj.extruded.z_interfaces(
        solver_obj.bathy_cell, jnp.zeros((mesh2d.nc, 3))))
    _z3 = np.stack([_z_if[:, :, :-1], _z_if[:, :, 1:]], axis=-1)
    shape3 = _z3.shape                              # (nc, 3, nz, 2)
    _lat_b = np.broadcast_to(_lat3[:, :, None, None], shape3)
    _lon_b = np.broadcast_to(_lon3[:, :, None, None], shape3)
    tgt3 = np.column_stack([_lat_b.ravel(), _lon_b.ravel(), _z3.ravel()])
    tgt2 = np.column_stack([_lat3.ravel(), _lon3.ravel()])
    ncom = NCOMInterpolator(
        tgt3, tgt2,
        fields={"Salinity": None, "Temperature": None},
        field_fnstr={"Salinity": "s3d", "Temperature": "t3d"},
        basedir=_ncom_dir,
        file_pattern="{year:04d}/{fieldstr:}/{fieldstr:}.glb8_2f_"
                     "{year:04d}{month:02d}{day:02d}00.nc",
        init_date=_init_date)
    _out = ncom.set_fields(0.0)
    salt0 = np.asarray(_out["Salinity"]).reshape(shape3)
    temp0 = np.asarray(_out["Temperature"]).reshape(shape3)
    # the archive does not resolve the river: keep the estuary fresh
    salt0 = np.where(est[..., None, None], salt_river, salt0)
    print_output(f"columbia_plume: NCOM-format initial T/S from "
                 f"{_ncom_dir}")
solver_obj.assign_initial_conditions(salt=jnp.asarray(salt0),
                                     temp=jnp.asarray(temp0))


def update_forcings(t):
    ramp = min(1.0, max(t, dt) / ramp_t)
    eta = np.zeros(mesh2d.nv)
    eta[open_verts] = ramp * tide.set_tidal_field(t)[open_verts]
    bnd_elev.data = jnp.asarray(eta)
    river_flux.assign(-q_river * ramp)
    if USE_ATM:
        atm_interp.set_fields(t)  # updates wind_field in place


solver_obj.iterate(update_forcings=update_forcings)

salt = np.asarray(solver_obj.fields.salt_3d.data)
elev = np.asarray(solver_obj.fields.elev_2d.data)
assert np.isfinite(salt).all() and np.isfinite(elev).all()
# the estuary stays fresher than the ocean and inside physical bounds
mouth = ((xc[..., 0] > 430e3) & (np.abs(xc[..., 1] - 5.115e6) < 15e3))
surf_salt = salt[..., -1, :].mean(axis=-1)       # (nc, 3) surface layer
est_salt = float(surf_salt[mouth].mean())
oce_salt = float(surf_salt[~mouth].mean())
print_output(f"estuary surface salinity {est_salt:.2f} "
             f"vs ocean {oce_salt:.2f}")
assert est_salt < oce_salt - 5.0, "river plume signature missing"
# bounds anchored to the actual initial salinity range (the
# NCOM-archive branch may provide a saltier ocean than the
# synthetic fallback)
salt_max0 = float(np.asarray(salt0).max())
assert salt.min() > -0.5 and salt.max() < salt_max0 + 0.5
if not REGRESSION:
    # tidal response on the shelf after spin-up
    assert np.abs(elev).max() > 0.3
