"""Self-contained unstructured North Sea mesh generator.

Replaces the reference's binary ``north_sea.msh`` (not shipped): a
simplified North Sea coastline polygon (lon/lat) is mapped to UTM zone 30,
filled with an interior point lattice, Delaunay-triangulated and clipped
back to the polygon.  Boundary markers follow the reference's convention:
100 = open ocean (northern boundary + Dover strait), 200 = coast.
"""
import numpy as np

from thetis_tpu.mesh.mesh2d import Mesh2d
from thetis_tpu.utils import coordsys

# simplified coastline, counter-clockwise (lon, lat)
_OUTLINE = np.array([
    (1.60, 51.20),   # Dover strait (UK side) -- open segment start
    (1.75, 52.40),   # East Anglia
    (1.40, 52.90),
    (0.30, 53.40),
    (-0.20, 54.20),
    (-1.20, 55.20),
    (-1.80, 56.20),
    (-2.40, 57.20),
    (-1.90, 58.20),
    (-1.30, 59.20),
    (-1.00, 60.60),  # Shetland -- north open boundary start
    (1.00, 60.80),
    (3.00, 60.80),
    (4.80, 60.70),   # north open boundary end (Norway side)
    (5.30, 59.60),   # Norwegian coast
    (6.30, 58.30),
    (7.80, 57.80),
    (8.60, 56.80),   # Danish coast
    (8.20, 55.60),
    (8.00, 54.60),
    (7.20, 53.80),   # German Bight
    (5.60, 53.35),   # Dutch coast
    (4.60, 52.90),
    (3.90, 51.90),   # Belgian coast
    (2.60, 51.25),   # Dover strait (continental side)
])

#: open-boundary segments as (start_index, end_index) into _OUTLINE
_OPEN_SEGMENTS = [(24, 0), (10, 13)]  # Dover strait, northern boundary


def _point_in_polygon(pts, poly):
    """Vectorised ray casting."""
    x, y = pts[:, 0], pts[:, 1]
    inside = np.zeros(len(pts), dtype=bool)
    n = len(poly)
    for i in range(n):
        x0, y0 = poly[i]
        x1, y1 = poly[(i + 1) % n]
        cond = (y0 > y) != (y1 > y)
        xint = (x1 - x0) * (y - y0) / (y1 - y0 + 1e-300) + x0
        inside ^= cond & (x < xint)
    return inside


def make_north_sea_mesh(resolution_km=40.0):
    """Build the mesh; returns (mesh2d, coord_system)."""
    from scipy.spatial import Delaunay

    cs = coordsys.UTMCoordinateSystem(utm_zone=30)
    res = resolution_km * 1e3

    # polygon in UTM coordinates
    poly_xy = np.array([cs.to_xy(lo, la) for lo, la in _OUTLINE])

    # boundary points: walk the outline at ~res spacing
    bpts = []
    for i in range(len(poly_xy)):
        a = poly_xy[i]
        b = poly_xy[(i + 1) % len(poly_xy)]
        seg = np.linalg.norm(b - a)
        nseg = max(1, int(round(seg / res)))
        for k in range(nseg):
            bpts.append(a + (b - a) * (k / nseg))
    bpts = np.asarray(bpts)

    # interior lattice (hex-staggered), kept off the boundary
    x0, y0 = poly_xy.min(axis=0) - res
    x1, y1 = poly_xy.max(axis=0) + res
    xs = np.arange(x0, x1, res)
    ys = np.arange(y0, y1, res * np.sqrt(3) / 2)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    X[:, 1::2] += 0.5 * res
    grid = np.stack([X.ravel(), Y.ravel()], axis=1)
    inside = _point_in_polygon(grid, poly_xy)
    d2b = np.min(
        np.linalg.norm(grid[:, None, :] - bpts[None, :, :], axis=-1), axis=1
    )
    interior = grid[inside & (d2b > 0.55 * res)]

    pts = np.concatenate([bpts, interior])
    tri = Delaunay(pts)
    cells = tri.simplices
    cent = pts[cells].mean(axis=1)
    keep = _point_in_polygon(cent, poly_xy)
    # drop boundary slivers (tiny area relative to res^2)
    p0, p1, p2 = pts[cells[:, 0]], pts[cells[:, 1]], pts[cells[:, 2]]
    area2 = np.abs((p1 - p0)[:, 0] * (p2 - p0)[:, 1]
                   - (p1 - p0)[:, 1] * (p2 - p0)[:, 0])
    keep &= area2 > 0.05 * res * res
    cells = cells[keep]
    # re-index used vertices
    used = np.unique(cells.ravel())
    remap = -np.ones(len(pts), dtype=np.int64)
    remap[used] = np.arange(len(used))
    coords = pts[used]
    cells = remap[cells]

    # open-boundary polylines in UTM for marker classification
    open_lines = []
    for i0, i1 in _OPEN_SEGMENTS:
        idx = [i0]
        j = i0
        while j != i1:
            j = (j + 1) % len(_OUTLINE)
            idx.append(j)
        open_lines.append(poly_xy[idx])

    def markers(mids):
        m = np.full(len(mids), 200, dtype=np.int32)
        for line in open_lines:
            # distance from facet midpoint to the open polyline
            dmin = np.full(len(mids), np.inf)
            for k in range(len(line) - 1):
                a, b = line[k], line[k + 1]
                ab = b - a
                tpar = np.clip(
                    ((mids - a) @ ab) / max(ab @ ab, 1e-300), 0.0, 1.0
                )
                proj = a + tpar[:, None] * ab
                dmin = np.minimum(dmin, np.linalg.norm(mids - proj, axis=1))
            m[dmin < 0.3 * res] = 100
        return m

    mesh = Mesh2d(coords, cells.astype(np.int32), boundary_markers=markers,
                  name="north_sea_synthetic")
    return mesh, cs


if __name__ == "__main__":
    mesh, _ = make_north_sea_mesh()
    print(mesh)
