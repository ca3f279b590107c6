"""
Williamson test case 2 (steady zonal flow on the sphere)
========================================================

Port of the reference's ``test/sphere/test_williamson.py`` setup: the
global steady nonlinear geostrophic flow on an icosahedral sphere mesh
through the ``FlowSolver2d`` facade with the rt-dg H(div) family
(required on manifolds, ref ``solver2d.py:314-318``) and CellNormal
Coriolis.  The analytic balance must be preserved; the run prints the
relative elevation error per day.
"""
import math
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu.mesh.sphere import IcosahedralSphereMesh
from thetis_tpu.model.flowsolver2d import FlowSolver2d
from thetis_tpu.solvers.newton import NewtonParameters
from thetis_tpu.utils.log import print_output

R = 6371220.0
OMEGA = 7.292e-5
G = 9.81

refinement = 4
days = 5.0
dt = 900.0
if os.getenv("THETIS_REGRESSION_TEST") is not None:
    refinement, days = 3, 0.25

mesh = IcosahedralSphereMesh(R, refinement)
print_output(f"{mesh}")

u0 = 2 * np.pi * R / (12.0 * 86400.0)
h0 = 2.94e4 / G

solver_obj = FlowSolver2d(mesh, jnp.asarray(h0))
options = solver_obj.options
options.element_family = "rt-dg"
options.polynomial_degree = 0
options.swe_timestepper_type = "CrankNicolson"
options.swe_timestepper_options.use_semi_implicit_linearization = True
options.swe_timestepper_options.solver_parameters = NewtonParameters(
    ksp_rtol=1e-8, ksp_max_it=96, gmres_restart=24)
options.timestep = dt
options.simulation_export_time = 86400.0
options.simulation_end_time = days * 86400.0
options.no_exports = True

xyz = mesh.coords_np
cent = mesh.cell_midpoints()
sin_lat = cent[:, 2] / np.linalg.norm(cent, axis=1)
amp = (R * OMEGA * u0 + 0.5 * u0**2) / G
eta0 = (-amp * sin_lat**2)[:, None]
uvec = (u0 / R) * np.stack([-xyz[:, 1], xyz[:, 0], np.zeros(mesh.nv)],
                           axis=-1)
options.coriolis_frequency = jnp.asarray(2.0 * OMEGA * xyz[:, 2] / R)
solver_obj.assign_initial_conditions(elev=jnp.asarray(eta0),
                                     uv=jnp.asarray(uvec))

if __name__ == "__main__":
    area = np.asarray(mesh.cell_area_np)

    def report():
        err = np.asarray(
            solver_obj.fields.elev_2d.data[:, 0] - eta0[:, 0])
        l2 = math.sqrt(float((area * err**2).sum()) / area.sum()) / amp
        print_output(
            f"t={solver_obj.simulation_time / 86400.0:.2f} d: "
            f"elevation rel. L2 error {l2:.4f}")
        return err, l2

    solver_obj.iterate(export_func=lambda: report())
    err, l2 = report()
    # Williamson case 2 is a steady geostrophic state: the elevation
    # error growth must stay small on this coarse icosahedral mesh
    assert np.isfinite(err).all()
    assert l2 < 0.05, l2
