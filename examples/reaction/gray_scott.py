# Gray-Scott diffusion-reaction demo
# ==================================
#
# Port of the reference's ``examples/reaction/gray_scott.py``
# (Hundsdorfer & Verwer 2003; also a PETSc TS tutorial): two tracer
# species with different diffusivities and a nonlinear reaction coupling,
# solved alternately with tracer Picard iterations on a doubly periodic
# domain.
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu import *
from thetis_tpu.mesh.generation import PeriodicRectangleMesh

mesh2d = PeriodicRectangleMesh(48, 48, 2.5, 2.5, direction="both")
P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry2d = Function(P1_2d).assign(1.0)

D1, D2 = 8.0e-5, 4.0e-5
gamma, kappa = 0.024, 0.06

solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry2d)
options = solver_obj.options
options.tracer_only = True
options.tracer_element_family = "cg"
options.use_supg_tracer = False
options.use_limiter_for_tracers = False
options.no_exports = True
sim_end_time = 2000.0
if os.environ.get("THETIS_REGRESSION_TEST"):
    sim_end_time = 150.0

options.tracer_picard_iterations = 2
options.tracer_timestepper_type = "CrankNicolson"
options.tracer_timestepper_options.implicitness_theta = 1.0

# reaction sources are callables of the tracer state, re-evaluated at
# each Picard iterate inside the jitted advance
options.add_tracer_2d(
    "a_2d", "Tracer A", "TracerA2d", shortname="TracerA",
    diffusivity=D1,
    source=lambda tr: gamma - tr["a_2d"] * tr["b_2d"] ** 2
    - gamma * tr["a_2d"],
)
options.add_tracer_2d(
    "b_2d", "Tracer B", "TracerB2d", shortname="TracerB",
    diffusivity=D2,
    source=lambda tr: tr["a_2d"] * tr["b_2d"] ** 2
    - (gamma + kappa) * tr["b_2d"],
)

xv, yv = mesh2d.coords_np[:, 0], mesh2d.coords_np[:, 1]
in_sq = (1.0 <= xv) & (xv <= 1.5) & (1.0 <= yv) & (yv <= 1.5)
b_init = np.where(
    in_sq, 0.25 * np.sin(4 * np.pi * xv) ** 2 * np.sin(4 * np.pi * yv) ** 2,
    0.0,
)
a_init = 1.0 - 2.0 * b_init
solver_obj.assign_initial_conditions(a_2d=jnp.asarray(a_init),
                                     b_2d=jnp.asarray(b_init))

# spin up the timestep like the reference (stiff reaction at start)
dt = 1.0e-4
end_time = 0.0
for i in range(4):
    dt *= 10
    end_time += 10 * dt if i == 0 else 9 * dt
    options.timestep = dt
    options.simulation_export_time = 10 * dt
    options.simulation_end_time = end_time
    solver_obj.create_timestepper()
    if __name__ == "__main__":
        solver_obj.iterate()

options.simulation_end_time = sim_end_time
solver_obj.create_timestepper()

if __name__ == "__main__":
    solver_obj.iterate()
    a = np.asarray(solver_obj.fields.a_2d.data)
    b = np.asarray(solver_obj.fields.b_2d.data)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # species stay in the physically meaningful range and the reaction
    # has consumed A where B lives
    # CG transport without a limiter under/overshoots slightly
    assert a.min() > -0.05 and a.max() < 1.05
    assert b.min() > -0.05 and b.max() < 1.0
    assert b.max() > 0.05, "pattern died"
    assert a.min() < 0.9, "no reaction happened"
