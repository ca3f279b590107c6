"""
Williamson test case 2 (steady zonal flow on the sphere)
========================================================

Port of the reference's ``test/sphere/test_williamson.py`` setup: the
global steady nonlinear geostrophic flow on an icosahedral sphere mesh
with the rt-dg H(div) family (required on manifolds) and CellNormal
Coriolis.  The analytic balance must be preserved; the run prints the
relative elevation error per day.
"""
import math
import os
from types import SimpleNamespace
from functools import partial

import numpy as np

from thetis_tpu.mesh.sphere import IcosahedralSphereMesh
from thetis_tpu.fem.rt import RTSpace
from thetis_tpu.fem.reference_element import ELEMENTS
from thetis_tpu.equations.shallowwater_rtdg import ShallowWaterEquationsRTDG
from thetis_tpu.timeintegration.steppers import CrankNicolson
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

quad = SimpleNamespace(space=SimpleNamespace(
    _tab_np=ELEMENTS[("DG", 1)].tabulate(3)))
rt = RTSpace(mesh, quad)
opts = SimpleNamespace(use_nonlinear_equations=True,
                       use_wetting_and_drying=False)
u0 = 2 * np.pi * R / (12.0 * 86400.0)
h0 = 2.94e4 / G
eq = ShallowWaterEquationsRTDG(mesh, rt.asm, rt, opts, h0,
                               bnd_conditions={})

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

xyz = mesh.coords_np
cent = mesh.cell_midpoints()
sin_lat = cent[:, 2] / np.linalg.norm(cent, axis=1)
amp = (R * OMEGA * u0 + 0.5 * u0**2) / G
eta0 = jnp.asarray((-amp * sin_lat**2)[:, None])
uvec = (u0 / R) * np.stack([-xyz[:, 1], xyz[:, 0], np.zeros(mesh.nv)],
                           axis=-1)
U0 = rt.project_vector(jnp.asarray(uvec))
fields = {"coriolis": jnp.asarray(2.0 * OMEGA * xyz[:, 2] / R)}

stepper = CrankNicolson(
    eq, dt, semi_implicit=True,
    solver_parameters=NewtonParameters(ksp_rtol=1e-8, ksp_max_it=96,
                                       gmres_restart=24))


@partial(jax.jit, static_argnames=("n",))
def advance_n(s, n):
    return jax.lax.scan(
        lambda c, _: (stepper.advance(0.0, c, fields, fields, {}), None),
        s, None, length=n)[0]


if __name__ == "__main__":
    state = {"uv": U0, "elev": eta0}
    area = np.asarray(mesh.cell_area_np)
    per_day = max(1, int(round(min(days, 1.0) * 86400.0 / dt)))
    n_days = max(1, int(round(days / min(days, 1.0))))
    for day in range(n_days):
        state = advance_n(state, per_day)
        err = np.asarray(state["elev"][:, 0] - eta0[:, 0])
        l2 = math.sqrt(float((area * err**2).sum()) / area.sum()) / amp
        print_output(f"day {day + 1}: elevation rel. L2 error {l2:.4f}")
    # Williamson case 2 is a steady geostrophic state: the elevation
    # error growth must stay small on this coarse icosahedral mesh
    assert np.isfinite(err).all()
    assert l2 < 0.05, l2
