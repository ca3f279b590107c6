"""Optimisation-callback module (ref ``thetis/optimisation.py`` +
``test_optimisation.py`` pattern): callbacks fire during a small
ReducedFunctional optimisation and export controls/derivatives."""
import glob
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu import RectangleMesh, FunctionSpace, Function
from thetis_tpu.adjoint import Control, ReducedFunctional, minimize
from thetis_tpu.model.optimisation import (
    ControlsExportOptimisationCallback,
    DerivativesExportOptimisationCallback,
    FunctionalOptimisationCallback,
    OptimisationCallbackList,
    UserExportManager,
)


def test_optimisation_callbacks(tmp_path):
    mesh = RectangleMesh(4, 4, 1.0, 1.0)
    V = FunctionSpace(mesh, "CG", 1)
    target = Function(V).interpolate(lambda x, y: x * (1 - x))
    c0 = Function(V, name="control")

    def forward(c):
        return jnp.sum((c - target.data) ** 2)

    func_cb = FunctionalOptimisationCallback()
    deriv_cb = OptimisationCallbackList([
        DerivativesExportOptimisationCallback(str(tmp_path)),
    ])
    controls_cb = ControlsExportOptimisationCallback(str(tmp_path))

    rf = ReducedFunctional(
        forward, Control(c0),
        eval_cb_post=lambda j, vals: (func_cb(j, vals),
                                      controls_cb(j, vals)),
        derivative_cb_post=deriv_cb,
    )
    opt = minimize(rf, options={"maxiter": 5})
    assert np.allclose(np.asarray(opt), np.asarray(target.data), atol=1e-4)
    assert len(func_cb.history) >= 2
    assert func_cb.history[-1] < func_cb.history[0]
    # exports landed on disk
    assert glob.glob(os.path.join(str(tmp_path), "*control*"))
    assert glob.glob(os.path.join(str(tmp_path), "*derivative*"))


def test_user_export_manager(tmp_path):
    mesh = RectangleMesh(3, 3, 1.0, 1.0)
    V = FunctionSpace(mesh, "DG", 1)
    f = Function(V, name="my_diag").assign(2.5)
    em = UserExportManager(str(tmp_path), [f])
    em.export()
    files = glob.glob(os.path.join(str(tmp_path), "**", "*my_diag*"),
                      recursive=True)
    assert files


def test_minimize_bounds_pairs_two_controls():
    """Regression: with exactly 2 control entries, scipy-style
    [(lb, ub), (lb, ub)] bounds must NOT be misread as pyadjoint-style
    [lb_list, ub_list] (which pinned the 2nd control to its 'bound'
    pair and broke the tohoku 2-parameter inversion)."""
    import numpy as np
    import jax.numpy as jnp
    from thetis_tpu.adjoint.reduced_functional import (
        Control, ReducedFunctional, minimize)

    target = jnp.asarray([3.0, 42.0])

    def fwd(c):
        return jnp.sum((c - target) ** 2)

    rf = ReducedFunctional(fwd, Control(jnp.asarray([1.0, 30.0])))
    out = minimize(rf, bounds=[(0.5, 10.0), (5.0, 60.0)],
                   options=dict(maxiter=50))
    np.testing.assert_allclose(np.asarray(out), [3.0, 42.0], atol=1e-6)
