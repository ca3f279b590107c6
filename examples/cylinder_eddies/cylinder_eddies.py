# 2D flow around a cylinder (vortex shedding)
# ============================================
#
# Port of the reference's ``examples/cylinder_eddies/cylinder_eddies.py``:
# a 1.5 m/s ramped through-flow past a 500 m cylinder in a 19 x 7 km
# channel, with quadratic drag raised to 1e-2 along the cylinder wall to
# force flow separation in the wake.  DIRK22 semi-implicit stepping with
# flux/elevation open boundaries.
#
# The reference snaps the cylinder-wall nodes onto the circle arc with a
# P2 coordinate field (``snap_cylinder_coords``); with P1 geometry the
# same is a direct projection of the marker-5 boundary vertices onto the
# radius-500 circle.  The gmsh mesh is read when the reference tree is
# available; otherwise an equivalent holed-rectangle mesh is synthesized.
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu import *
from thetis_tpu.mesh.mesh2d import Mesh2d

CYL_R = 500.0
CYL_ID = 5

REF_MSH = os.environ.get(
    "CYLINDER_EDDIES_MESH",
    "/root/reference/examples/cylinder_eddies/mesh_cylinder_coarse.msh")


def make_cylinder_mesh(dx=250.0):
    """Self-contained fallback: structured rectangle with the cells inside
    the cylinder removed and the rim vertices snapped to the circle.
    Markers follow the reference .geo: 1 inflow (x=-4000), 2 outflow
    (x=15000), 3/4 lateral walls, 5 cylinder."""
    x0, x1, y0, y1 = -4000.0, 15000.0, -3500.0, 3500.0
    nx, ny = int((x1 - x0) / dx), int((y1 - y0) / dx)
    xs = np.linspace(x0, x1, nx + 1)
    ys = np.linspace(y0, y1, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    coords = np.stack([X.ravel(), Y.ravel()], axis=1)

    def vid(i, j):
        return i * (ny + 1) + j

    i, j = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    i, j = i.ravel(), j.ravel()
    tri = np.concatenate([
        np.stack([vid(i, j), vid(i + 1, j), vid(i + 1, j + 1)], axis=1),
        np.stack([vid(i, j), vid(i + 1, j + 1), vid(i, j + 1)], axis=1),
    ], axis=0)
    # remove cells whose centroid falls inside the cylinder; the hole rim
    # (vertices shared by kept and removed cells) snaps onto the circle
    mids = coords[tri].mean(axis=1)
    keep = (mids ** 2).sum(axis=1) > CYL_R ** 2
    rim_ids = np.intersect1d(np.unique(tri[keep]), np.unique(tri[~keep]))
    tri = tri[keep]
    r = np.sqrt((coords ** 2).sum(axis=1))
    rim = np.zeros(len(coords), dtype=bool)
    rim[rim_ids] = True
    rim &= r > 1e-9
    # displacement-capped snap: no kept cell can invert
    move = np.clip(CYL_R - r, -0.45 * dx, 0.45 * dx)
    scale = np.where(rim, (r + move) / np.maximum(r, 1e-12), 1.0)
    coords = coords * scale[:, None]
    used = np.unique(tri)
    remap = np.full(len(coords), -1, dtype=np.int64)
    remap[used] = np.arange(len(used))
    coords = coords[used]
    tri = remap[tri]

    eps = 1e-6

    def markers(mid):
        m = np.full(len(mid), CYL_ID, dtype=np.int32)  # default: cylinder
        m[np.abs(mid[:, 0] - x0) < eps] = 1
        m[np.abs(mid[:, 0] - x1) < eps] = 2
        m[np.abs(mid[:, 1] - y0) < eps] = 3
        m[np.abs(mid[:, 1] - y1) < eps] = 4
        return m

    return Mesh2d(coords, tri, boundary_markers=markers,
                  name="cylinder_channel")


if os.path.exists(REF_MSH):
    from thetis_tpu.mesh.gmsh import read_msh

    mesh2d = read_msh(REF_MSH)
    # reference snap_cylinder_coords: project wall nodes onto the circle
    coords = mesh2d.coords_np.copy()
    wall = mesh2d.facet_marker_np == CYL_ID
    vids = np.unique(mesh2d.facet_verts_np[wall])
    r = np.sqrt((coords[vids] ** 2).sum(axis=1))
    coords[vids] *= (CYL_R / np.maximum(r, 1e-12))[:, None]
    mesh2d = Mesh2d(
        coords, mesh2d.cells_np,
        boundary_markers=np.concatenate(
            [mesh2d.facet_verts_np[mesh2d.facet_is_boundary_np],
             mesh2d.facet_marker_np[mesh2d.facet_is_boundary_np][:, None]],
            axis=1),
        name="cylinder_msh")
else:
    mesh2d = make_cylinder_mesh()

t_end = 8 * 3600.0
t_export = 2 * 60.0
dt = 60.0

REGRESSION = bool(os.environ.get("THETIS_REGRESSION_TEST"))
if REGRESSION:
    t_end = 5 * t_export

flow_speed = 1.5
depth = 20.0

P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").assign(depth)

# quadratic bottom friction, raised along the cylinder wall (causes flow
# separation in the wake; ref ``cylinder_eddies.py:46-51``)
cd_max = 1e-2
drag = np.zeros(mesh2d.nv)
wall_v = np.unique(
    mesh2d.facet_verts_np[mesh2d.facet_marker_np == CYL_ID])
drag[wall_v] = cd_max
drag_coeff_2d = Function(P1_2d, name="Cd")
drag_coeff_2d.data = jnp.asarray(drag)

solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
options = solver_obj.options
options.element_family = "dg-dg"
options.simulation_export_time = t_export
options.simulation_end_time = t_end
options.quadratic_drag_coefficient = drag_coeff_2d
options.horizontal_viscosity = Constant(0.5)
options.horizontal_velocity_scale = Constant(flow_speed)
options.fields_to_export = [] if REGRESSION else ["uv_2d"]
options.no_exports = REGRESSION
options.swe_timestepper_type = "DIRK22"
options.timestep = dt

# ramped through-flow: flux BCs on inflow/outflow (ref L66-81; flux > 0
# leaves the domain, so the inflow carries -F and the outflow +F)
t_ramp = 1800.0
bnd_len = 7000.0
flux_in = Constant(0.0)
flux_out = Constant(0.0)


def flux_mag(t):
    return depth * bnd_len * flow_speed * min(t / t_ramp, 1.0)


solver_obj.bnd_functions["shallow_water"] = {
    1: {"flux": flux_in, "elev": Constant(0.0)},
    2: {"flux": flux_out, "elev": Constant(0.0)},
}
solver_obj.assign_initial_conditions(uv=Constant((1e-4, 0.0)))


def update_forcings(t):
    flux_in.assign(-flux_mag(t))
    flux_out.assign(flux_mag(t))


solver_obj.iterate(update_forcings=update_forcings)

if REGRESSION:
    uv = np.asarray(solver_obj.fields.uv_2d.data)
    elev = np.asarray(solver_obj.fields.elev_2d.data)
    assert np.isfinite(uv).all() and np.isfinite(elev).all()
    speed = np.sqrt((uv ** 2).sum(-1))
    # at t = 600 s the ramp admits u ~ 0.5 m/s through flow
    assert 0.05 < speed.max() < 3.0, speed.max()
    assert abs(elev).max() < 1.0, abs(elev).max()
