"""Multiple-tracers demo regression (LeVeque solid-body rotation,
tracer-only mode, mixed 3-tracer system)."""
import runpy

import numpy as np
import pytest


def test_multiple_tracers_demo(monkeypatch):
    monkeypatch.setenv("THETIS_REGRESSION_TEST", "1")
    ns = runpy.run_path("demos/demo_2d_multiple_tracers.py",
                        run_name="__main__")
    so = ns["solver_obj"]
    for label in ("bell_2d", "cone_2d", "slot_cyl_2d"):
        q = np.asarray(so.fields[label].data)
        assert np.isfinite(q).all()
        # background value 1.0 is preserved away from the shapes;
        # min should not undershoot much below 1 (no limiter here)
        assert q.min() > 0.5 and q.max() < 2.5
    # velocity untouched in tracer-only mode
    assert float(so.asm.norm_l2(so.fields.uv_2d.data)) == pytest.approx(
        0.4082, abs=1e-3
    )
