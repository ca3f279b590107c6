"""Demo regression runs (reference ``demos/`` parity): each demo runs in
shortened THETIS_REGRESSION_TEST mode and its physics sanity-checks."""
import pytest as _pytest

#: long-running integration tier: run with `pytest -m slow`
pytestmark = _pytest.mark.slow

import runpy

import numpy as np


def test_demo_2d_tracer(monkeypatch):
    monkeypatch.setenv("THETIS_REGRESSION_TEST", "1")
    ns = runpy.run_path("demos/demo_2d_tracer.py", run_name="__main__")
    so = ns["solver_obj"]
    q = np.asarray(so.fields.tracer_2d.data)
    assert np.isfinite(q).all()
    assert 0.5 < q.min() and q.max() < 2.5
    assert ns["rel_err"] < 0.5


def test_demo_2d_channel_bnd(monkeypatch):
    monkeypatch.setenv("THETIS_REGRESSION_TEST", "1")
    ns = runpy.run_path("demos/demo_2d_channel_bnd.py", run_name="__main__")
    so = ns["solver_obj"]
    # the flux forcing must have driven a flow
    assert float(so.asm.norm_l2(so.fields.uv_2d.data)) > 1.0
    assert np.isfinite(np.asarray(so.fields.elev_2d.data)).all()


def test_demo_3d_channel(monkeypatch):
    monkeypatch.setenv("THETIS_REGRESSION_TEST", "1")
    ns = runpy.run_path("demos/demo_3d_channel.py", run_name="__main__")
    so = ns["solver_obj"]
    salt = np.asarray(so.fields.salt_3d.data)
    # uniform salinity stays uniform (consistency) while the tide drives flow
    assert abs(salt - 4.5).max() < 1e-8
    assert float(so.asm.norm_l2(so.fields.uv_2d.data)) > 1.0
