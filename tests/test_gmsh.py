"""Gmsh reader test against the reference's north_sea mesh (read directly
from the read-only reference checkout; the file is input data for the
north-sea demo parity run)."""
import os

import numpy as np
import pytest

from thetis_tpu.mesh.gmsh import read_msh

NORTH_SEA = "/root/reference/demos/north_sea.msh"


@pytest.mark.skipif(not os.path.exists(NORTH_SEA), reason="mesh unavailable")
def test_read_north_sea():
    mesh = read_msh(NORTH_SEA)
    assert mesh.nv == 6396
    assert mesh.nc == 10583
    assert mesh.boundary_markers == [100, 200]
    assert mesh.detJ_np.min() > 0
    # coast (200) is much longer than the open boundary (100)
    assert mesh.boundary_len[200] > mesh.boundary_len[100]
    # outward normals integrate to ~0 over the closed boundary
    sel = mesh.facet_is_boundary_np
    total = (
        mesh.facet_normal_np[sel] * mesh.facet_len_np[sel][:, None]
    ).sum(axis=0)
    assert np.abs(total).max() < 1e-4 * mesh.facet_len_np[sel].sum()
