"""Run every example script under THETIS_REGRESSION_TEST (the reference's
``test/examples/test_examples.py`` pattern: scripts shorten themselves when
the env flag is set)."""
import pytest as _pytest

#: long-running integration tier: run with `pytest -m slow`
pytestmark = _pytest.mark.slow

import glob
import os
import runpy

import pytest

EXAMPLES = sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), "..", "examples", "*", "*.py")
))


@pytest.mark.parametrize("script", EXAMPLES,
                         ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_runs(script, monkeypatch):
    monkeypatch.setenv("THETIS_REGRESSION_TEST", "1")
    runpy.run_path(script, run_name="__main__")
