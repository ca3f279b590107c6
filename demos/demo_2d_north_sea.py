# North Sea tidal model
# =====================
#
# Port of the reference's ``demos/demo_2d_north_sea.py``: a tidal model of
# the North Sea on an unstructured mesh (open-ocean boundary tag 100,
# coasts tag 200), with Coriolis computed from latitude through the
# UTM-zone-30 coordinate system, Manning friction, TPXO-format file-driven
# tidal forcing on the open boundary, and tide-gauge station callbacks.
#
# Self-contained: the mesh comes from ``north_sea_mesh.py`` (the reference's
# binary ``north_sea.msh`` is not shipped; set ``NORTH_SEA_MSH`` to use a
# gmsh file instead), and the TPXO constituent file is synthesised on first
# run with realistic M2/S2 magnitudes (drop in a real ``h_tpxo9.v5a.nc`` to
# use actual TPXO data).
import datetime
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from thetis_tpu import *  # noqa: F401,F403
from thetis_tpu.utils import coordsys
from thetis_tpu.utils.timezone import FixedTimeZone
from thetis_tpu.model.forcing import TPXOTidalBoundaryForcing

MESH_FILE = os.environ.get("NORTH_SEA_MSH")
if MESH_FILE:
    from thetis_tpu.mesh.gmsh import read_msh

    coord_system = coordsys.UTMCoordinateSystem(utm_zone=30)
    mesh2d = read_msh(MESH_FILE)
else:
    from north_sea_mesh import make_north_sea_mesh

    mesh2d, coord_system = make_north_sea_mesh(resolution_km=40.0)

# Bathymetry: the reference interpolates ETOPO1 (netCDF not shipped);
# use a smooth latitude-dependent shelf profile with the same range.
P1_2d = FunctionSpace(mesh2d, "CG", 1)
lon, lat = coord_system.get_mesh_lonlat_function(mesh2d)
bathymetry_2d = Function(P1_2d, name="Bathymetry")
bathymetry_2d.data = __import__("jax.numpy", fromlist=["asarray"]).asarray(
    np.clip(20.0 + 150.0 * np.clip((np.asarray(lat) - 50.0) / 12.0, 0, 1) ** 2
            + 30.0 * np.cos(np.deg2rad(np.asarray(lon)) * 3), 10.0, 700.0)
)

manning_2d = Function(P1_2d, name="Manning coefficient").assign(3.0e-02)

omega = 7.292e-05
coriolis_2d = Function(P1_2d, name="Coriolis forcing").interpolate(
    2 * omega * sin(np.asarray(lat) * pi / 180.0)
)

dt = 3600.0
t_export = 3600.0
t_end = 2 * dt if os.environ.get("THETIS_REGRESSION_TEST") else 24 * 3600.0

solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
options = solver_obj.options
options.element_family = "dg-dg"
options.polynomial_degree = 1
options.coriolis_frequency = coriolis_2d
options.manning_drag_coefficient = manning_2d
options.horizontal_velocity_scale = Constant(1.5)
options.use_lax_friedrichs_velocity = True
options.simulation_initial_date = None
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.swe_timestepper_type = "DIRK22"
options.swe_timestepper_options.use_semi_implicit_linearization = True
options.timestep = dt
options.fields_to_export = ["elev_2d", "uv_2d"]
options.no_exports = True

# ---------------------------------------------------------------------
# Tidal forcing on the open-ocean boundary (tag 100), TPXO netCDF format
# (ref reads h_tpxo9.v5a.nc through uptide, forcing.py:1086-1143).  The
# real database is not shipped: synthesise a constituent file with
# realistic M2/S2 magnitudes once, then read it back through the same
# file-driven path a real TPXO file would use.
init_date = datetime.datetime(2022, 1, 1, tzinfo=FixedTimeZone(0, "UTC"))
open_nodes = np.unique(
    mesh2d.facet_verts_np[mesh2d.facet_marker_np == 100].ravel()
)
lat_b = np.asarray(lat)[open_nodes]
lon_b = np.asarray(lon)[open_nodes]

TPXO_FILE = os.environ.get("TPXO_ELEV_FILE")
if not TPXO_FILE:
    TPXO_FILE = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "outputs_north_sea",
        "h_synthetic_tpxo.nc",
    )
    if not os.path.exists(TPXO_FILE):
        os.makedirs(os.path.dirname(TPXO_FILE), exist_ok=True)
        from scipy.io import netcdf_file

        lon_ax = np.linspace(-5.0, 12.0, 35)
        lat_ax = np.linspace(49.0, 62.0, 27)
        LON, LAT = np.meshgrid(np.linspace(-5.0, 12.0, 35), lat_ax,
                               indexing="ij")
        amp_m2 = 1.2 + 0.3 * np.sin(np.deg2rad(LON))
        pha_m2 = np.deg2rad(LON * 8.0)
        amp_s2 = np.full_like(LON, 0.4)
        pha_s2 = np.deg2rad(LON * 8.0 + 30)
        h_re = np.stack([amp_m2 * np.cos(pha_m2), amp_s2 * np.cos(pha_s2)])
        h_im = np.stack([-amp_m2 * np.sin(pha_m2),
                         -amp_s2 * np.sin(pha_s2)])
        with netcdf_file(TPXO_FILE, "w") as f:
            f.createDimension("nc", 2)
            f.createDimension("nct", 4)
            f.createDimension("nx", len(lon_ax))
            f.createDimension("ny", len(lat_ax))
            con = f.createVariable("con", "c", ("nc", "nct"))
            con[0, :] = np.frombuffer(b"m2  ", dtype="S1")
            con[1, :] = np.frombuffer(b"s2  ", dtype="S1")
            f.createVariable("lon_z", "d", ("nx",))[:] = lon_ax
            f.createVariable("lat_z", "d", ("ny",))[:] = lat_ax
            f.createVariable("hRe", "d", ("nc", "nx", "ny"))[:] = h_re
            f.createVariable("hIm", "d", ("nc", "nx", "ny"))[:] = h_im

tide = TPXOTidalBoundaryForcing(
    np.stack([lat_b, lon_b], axis=-1), init_date,
    constituents=["M2", "S2"],
    data_dir=os.path.dirname(TPXO_FILE),
    elev_file=os.path.basename(TPXO_FILE),
)

elev_bc = Function(P1_2d, name="tidal elevation")
solver_obj.bnd_functions["shallow_water"] = {
    100: {"elev": elev_bc},
    200: {},  # coasts: land (default impermeable)
}


def update_forcings(t):
    vals = np.zeros(mesh2d.nv)
    vals[open_nodes] = tide.set_tidal_field(t)
    import jax.numpy as jnp

    elev_bc.data = jnp.asarray(vals)


update_forcings(0.0)
solver_obj.assign_initial_conditions(elev=elev_bc)

# tide gauge stations (subset of the reference's stations_elev.csv set)
stations = {
    "aberdeen": (57.14, -2.08),
    "lowestoft": (52.47, 1.75),
    "delfzijl": (53.33, 6.93),
}
for name, (slat, slon) in stations.items():
    x, y = coord_system.to_xy(slon, slat)
    cb = TimeSeriesCallback2D(
        solver_obj, ["elev_2d"], float(x), float(y), name,
        append_to_log=False,
    )
    solver_obj.add_callback(cb, "timestep")

if __name__ == "__main__":
    solver_obj.iterate(update_forcings=update_forcings)
