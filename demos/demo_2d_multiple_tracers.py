# Multiple tracers: LeVeque solid-body rotation
# =============================================
#
# Port of the reference's ``demos/demo_2d_multiple_tracers.py``: three
# tracers (Gaussian bell, cone, slotted cylinder) advected around the unit
# square by a rotational velocity field for one revolution, tracer-only
# mode with SSPRK33.
import os

import jax.numpy as jnp

from thetis_tpu import *

mesh2d = UnitSquareMesh(40, 40)
P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry2d = Function(P1_2d).assign(1.0)

solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry2d)
labels = ["bell_2d", "cone_2d", "slot_cyl_2d"]
names = ["Gaussian bell", "Cone", "Slotted cylinder"]
filenames = ["GaussianBell2d", "Cone2d", "SlottedCylinder2d"]
options = solver_obj.options
options.tracer_only = True
options.fields_to_export = labels
options.no_exports = True
for label, name, filename in zip(labels, names, filenames):
    options.add_tracer_2d(label, name, filename, source=None,
                          diffusivity=None)
solver_obj.bnd_functions["tracer"] = {
    m: {"value": Constant(1.0)} for m in (1, 2, 3, 4)
}
options.tracer_timestepper_type = "SSPRK33"
options.timestep = pi / 300.0
n_rev = 1.0
if os.environ.get("THETIS_REGRESSION_TEST"):
    n_rev = 0.25
options.simulation_end_time = n_rev * 2 * pi
options.simulation_export_time = pi / 15.0
options.tracer_timestepper_options.use_automatic_timestep = False
options.use_lax_friedrichs_tracer = False
options.use_limiter_for_tracers = False

x, y = SpatialCoordinate(mesh2d)
uv_init = jnp.stack([0.5 - y, x - 0.5], axis=-1)

bell_r0, bell_x0, bell_y0 = 0.15, 0.25, 0.5
cone_r0, cone_x0, cone_y0 = 0.15, 0.5, 0.25
cyl_r0, cyl_x0, cyl_y0 = 0.15, 0.5, 0.75
slot_left, slot_right, slot_top = 0.475, 0.525, 0.85

bell = 0.25 * (1 + cos(pi * min_value(
    sqrt((x - bell_x0) ** 2 + (y - bell_y0) ** 2) / bell_r0, 1.0)))
cone = 1.0 - min_value(
    sqrt((x - cone_x0) ** 2 + (y - cone_y0) ** 2) / cone_r0, 1.0)
slot_cyl = conditional(
    sqrt((x - cyl_x0) ** 2 + (y - cyl_y0) ** 2) < cyl_r0,
    conditional((x > slot_left) & (x < slot_right) & (y < slot_top),
                0.0, 1.0),
    0.0,
)

bell_init = Function(P1_2d).interpolate(1.0 + bell)
cone_init = Function(P1_2d).interpolate(1.0 + cone)
slot_cyl_init = Function(P1_2d).interpolate(1.0 + slot_cyl)
solver_obj.assign_initial_conditions(
    uv=uv_init, bell_2d=bell_init, cone_2d=cone_init,
    slot_cyl_2d=slot_cyl_init,
)

if __name__ == "__main__":
    solver_obj.iterate()
    rel_errors = {}
    for label, name, init in zip(
        labels, names, [bell_init, cone_init, slot_cyl_init]
    ):
        q = solver_obj.fields[label].data
        q0 = solver_obj._interp_to(solver_obj.function_spaces.Q_2d, init)
        L2_err = float(solver_obj.asm.norm_l2(q - q0))
        L2_init = float(solver_obj.asm.norm_l2(q0))
        rel_errors[label] = L2_err / L2_init
        print_output(
            "Relative error {:8s}: {:.2f}%".format(name,
                                                   100 * L2_err / L2_init)
        )
