"""North Sea demo regression (the reference's demo_2d_north_sea config:
unstructured gmsh mesh, Coriolis from latitude via UTM, Manning friction,
harmonic tidal forcing on the open boundary, station callbacks).  Runs two
implicit steps under THETIS_REGRESSION_TEST like the reference CI."""
import os
import runpy

import numpy as np
import pytest

MESH = "/root/reference/demos/north_sea.msh"


@pytest.mark.skipif(not os.path.exists(MESH), reason="mesh unavailable")
def test_north_sea_demo(monkeypatch):
    monkeypatch.setenv("THETIS_REGRESSION_TEST", "1")
    ns = runpy.run_path("demos/demo_2d_north_sea.py", run_name="__main__")
    so = ns["solver_obj"]
    e = np.asarray(so.fields.elev_2d.data)
    u = np.asarray(so.fields.uv_2d.data)
    assert np.isfinite(e).all() and np.isfinite(u).all()
    # the tide drives a realistic flow: 1 mm/s < |u|max < 10 m/s
    assert 1e-3 < np.abs(u).max() < 10.0
    assert np.abs(e).max() < 10.0
    # station callbacks sampled the run
    cbs = so.callbacks["timestep"]
    assert len(cbs) == 3
