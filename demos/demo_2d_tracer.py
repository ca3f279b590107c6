# 2D tracer advection: LeVeque solid-body rotation
# =================================================
#
# Port of the reference's ``demos/demo_2d_tracer.py``: the classic bell /
# cone / slotted-cylinder field advected around the unit square for one
# revolution in tracer-only mode with SSPRK33 (single combined tracer,
# cf. the multiple-tracers demo for the split variant).
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu import *

mesh2d = UnitSquareMesh(40, 40)
P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry2d = Function(P1_2d).assign(1.0)

solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry2d)
options = solver_obj.options
options.tracer_only = True
options.no_exports = True
options.fields_to_export = ["tracer_2d"]
options.add_tracer_2d("tracer_2d", "Depth averaged tracer", "Tracer2d",
                      source=None, diffusivity=None)
t_end = 2 * np.pi
timestep = np.pi / 300.0
options.tracer_timestepper_type = "SSPRK33"
options.timestep = timestep
options.simulation_end_time = t_end
options.simulation_export_time = np.pi / 15.0
options.use_lax_friedrichs_tracer = False
options.use_limiter_for_tracers = False
if os.environ.get("THETIS_REGRESSION_TEST"):
    options.simulation_end_time = np.pi / 4

# background value 1.0 at all open boundaries
solver_obj.bnd_functions["tracer"] = {
    m: {"value": Constant(1.0)} for m in (1, 2, 3, 4)
}

x, y = SpatialCoordinate(mesh2d)
uv_init = jnp.stack([0.5 - np.asarray(y), np.asarray(x) - 0.5], axis=-1)

bell_r0, bell_x0, bell_y0 = 0.15, 0.25, 0.5
cone_r0, cone_x0, cone_y0 = 0.15, 0.5, 0.25
cyl_r0, cyl_x0, cyl_y0 = 0.15, 0.5, 0.75
slot_left, slot_right, slot_top = 0.475, 0.525, 0.85


def q_init_fn(x, y):
    bell = 0.25 * (1 + np.cos(np.pi * np.minimum(
        np.sqrt((x - bell_x0) ** 2 + (y - bell_y0) ** 2) / bell_r0, 1.0)))
    cone = 1.0 - np.minimum(
        np.sqrt((x - cone_x0) ** 2 + (y - cone_y0) ** 2) / cone_r0, 1.0)
    in_cyl = np.sqrt((x - cyl_x0) ** 2 + (y - cyl_y0) ** 2) < cyl_r0
    in_slot = (x > slot_left) & (x < slot_right) & (y < slot_top)
    slot_cyl = np.where(in_cyl & ~in_slot, 1.0, 0.0)
    return 1.0 + bell + cone + slot_cyl


q_init = Function(P1_2d).interpolate(q_init_fn)
solver_obj.assign_initial_conditions(uv=uv_init, tracer_2d=q_init)
solver_obj.iterate()

q = solver_obj.fields.tracer_2d.data
asm = solver_obj.asm
Q = solver_obj.function_spaces.Q_2d
q0_dg = Function(Q).interpolate(q_init_fn).data
L2_err = float(asm.norm_l2(q - q0_dg))
L2_init = float(asm.norm_l2(q0_dg))
rel_err = L2_err / L2_init
print_output(f"relative L2 error vs initial: {rel_err:.4f}")
