# North Sea tidal model
# =====================
#
# Port of the reference's ``demos/demo_2d_north_sea.py``: a tidal model of
# the North Sea on the unstructured ``north_sea.msh`` mesh (open-ocean
# boundary tag 100, coasts tag 200), with Coriolis computed from latitude
# through the UTM-zone-30 coordinate system, Manning friction, harmonic
# tidal forcing on the open boundary, and tide-gauge station callbacks.
#
# The reference obtains boundary tides from the TPXO database (binary data
# not shipped); here the M2/S2 constituent amplitudes/phases along the open
# boundary are synthetic stand-ins with realistic magnitudes.
import os

import numpy as np

from thetis_tpu import *
from thetis_tpu.mesh.gmsh import read_msh
from thetis_tpu.utils import coordsys
from thetis_tpu.model.forcing import TidalBoundaryForcing

MESH_FILE = os.environ.get(
    "NORTH_SEA_MSH", "/root/reference/demos/north_sea.msh"
)

coord_system = coordsys.UTMCoordinateSystem(utm_zone=30)

mesh2d = read_msh(MESH_FILE)

# Bathymetry: the reference interpolates ETOPO1 (netCDF not shipped);
# use a smooth latitude-dependent shelf profile with the same range.
P1_2d = FunctionSpace(mesh2d, "CG", 1)
lon, lat = coord_system.get_mesh_lonlat_function(mesh2d)
bathymetry_2d = Function(P1_2d, name="Bathymetry")
bathymetry_2d.data = jnp_asarray = __import__("jax.numpy", fromlist=["asarray"]).asarray(
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

# Tidal forcing on the open-ocean boundary (tag 100): harmonic synthesis
# at the boundary vertices (M2 dominant + S2), fed to the solver through a
# Constant-per-step elevation field updated by update_forcings.
elev_bc = Function(P1_2d, name="tidal elevation")
open_nodes = np.unique(
    mesh2d.facet_verts_np[mesh2d.facet_marker_np == 100].ravel()
)
lon_b = np.asarray(lon)[open_nodes]
amp = {"M2": 1.2 + 0.3 * np.sin(np.deg2rad(lon_b)),
       "S2": 0.4 * np.ones_like(lon_b)}
pha = {"M2": np.deg2rad(lon_b * 8.0), "S2": np.deg2rad(lon_b * 8.0 + 30)}
tide = TidalBoundaryForcing(amp, pha)

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
