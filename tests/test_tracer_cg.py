"""CG tracer family + SUPG (ref ``tracer_eq_2d.py:448-501``,
``test_h-advection_mes.py`` 'cg' cases): Gaussian-advection convergence
with tracer_element_family='cg', and SUPG keeping a sharp front bounded."""
import math

import numpy as np

from thetis_tpu import RectangleMesh, FunctionSpace, Function, solver2d


def run_advection(nx, supg=False, sigma=4e3):
    lx, ly = 40e3, 10e3
    u0 = 1.0
    mesh2d = RectangleMesh(nx, max(2, nx // 4), lx, ly)
    p1 = FunctionSpace(mesh2d, "CG", 1)
    bathy = Function(p1).assign(10.0)
    so = solver2d.FlowSolver2d(mesh2d, bathy)
    o = so.options
    o.tracer_element_family = "cg"
    o.use_supg_tracer = supg
    o.tracer_only = True
    o.horizontal_velocity_scale = u0
    o.horizontal_diffusivity_scale = 0.0
    o.add_tracer_2d("tracer_2d", "Tracer", "Tracer", "-", None)
    o.tracer_timestepper_type = "SSPRK33"
    t_end = 10e3 / u0
    o.timestep = 50.0  # fixed: spatial error dominates the ladder
    o.simulation_export_time = t_end
    o.simulation_end_time = t_end - 0.1 * o.timestep
    o.no_exports = True

    x0 = 10e3

    def ic(x, y):
        return np.exp(-(((x - x0) / sigma) ** 2))

    Q = so.function_spaces.Q_2d if hasattr(so, "function_spaces") else None
    so.create_function_spaces()
    Q = so.function_spaces.Q_2d
    c0 = Function(Q).interpolate(ic)
    so.assign_initial_conditions(uv=np.asarray([u0, 0.0]), tracer=c0)
    so.iterate()
    c_end = np.asarray(so.fields.tracer_2d.data)
    exact = np.asarray(
        Function(Q).interpolate(
            lambda x, y: np.exp(-(((x - x0 - u0 * t_end) / sigma) ** 2))
        ).data
    )
    err = float(np.sqrt(np.mean((c_end - exact) ** 2)))
    return err, c_end


def test_cg_tracer_advection_convergence():
    errs = [run_advection(nx, sigma=2e3)[0] for nx in (20, 40, 80)]
    rates = [math.log(errs[i] / errs[i + 1]) / math.log(2.0)
             for i in range(2)]
    print("cg tracer errors", errs, "rates", rates)
    assert errs[2] < errs[1] < errs[0]
    assert max(rates) > 1.3


def test_supg_bounded_front():
    """SUPG keeps a near-front solution bounded; plain Galerkin CG
    advection of a steep front develops larger over/undershoots."""
    err_supg, c_supg = run_advection(60, supg=True, sigma=1.2e3)
    err_gal, c_gal = run_advection(60, supg=False, sigma=1.2e3)
    under_supg = -min(c_supg.min(), 0.0)
    under_gal = -min(c_gal.min(), 0.0)
    print(f"undershoot galerkin={under_gal:.4f} supg={under_supg:.4f}; "
          f"err gal={err_gal:.4f} supg={err_supg:.4f}")
    assert np.isfinite(c_supg).all()
    assert under_supg < 0.5 * under_gal
    assert err_supg < err_gal  # stabilization improves the sharp case
