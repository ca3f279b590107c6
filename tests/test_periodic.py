"""x-periodic mesh (Firedrake PeriodicRectangleMesh analogue): geometry
is seam-aware and a tracer advected a full circuit returns to its start
with exact mass conservation."""
import numpy as np
import jax.numpy as jnp

from thetis_tpu import (
    PeriodicRectangleMesh, FunctionSpace, Function, solver2d,
)


def test_periodic_geometry():
    lx, ly = 10e3, 2e3
    mesh = PeriodicRectangleMesh(40, 8, lx, ly)
    assert mesh.nv == 40 * 9
    # uniform structured mesh: every cell has the same Jacobian
    assert np.allclose(np.asarray(mesh.detJ_np), mesh.detJ_np[0])
    # only the y boundaries are real boundaries
    assert sorted(mesh.boundary_markers) == [1, 2]
    area = float(np.asarray(mesh.cell_area_np).sum())
    assert abs(area - lx * ly) < 1e-6 * lx * ly


def test_periodic_full_circuit_advection():
    lx, ly = 10e3, 2e3
    u0 = 1.0
    mesh = PeriodicRectangleMesh(40, 8, lx, ly)
    p1 = FunctionSpace(mesh, "CG", 1)
    bathy = Function(p1).assign(10.0)
    so = solver2d.FlowSolver2d(mesh, bathy)
    o = so.options
    o.tracer_only = True
    o.add_tracer_2d("tracer_2d", "T", "T", "-", None)
    o.tracer_timestepper_type = "SSPRK33"
    o.timestep = 0.2 * (lx / 40) / u0
    o.simulation_export_time = lx / u0
    o.simulation_end_time = lx / u0 - 0.1 * o.timestep
    o.no_exports = True
    so.create_function_spaces()
    Q = so.function_spaces.Q_2d
    c0 = Function(Q).interpolate(
        lambda x, y: np.exp(-(((x - 3e3) / 800.0) ** 2))
    )
    so.assign_initial_conditions(uv=np.asarray([u0, 0.0]), tracer_2d=c0)
    so.iterate()
    c1 = so.fields.tracer_2d.data
    rel = float(so.asm.norm_l2(c1 - c0.data) / so.asm.norm_l2(c0.data))
    mass0 = float(so.asm.integrate(c0.data))
    mass1 = float(so.asm.integrate(c1))
    assert rel < 0.2, f"seam-crossing advection error {rel}"
    assert abs(mass1 - mass0) < 1e-10 * abs(mass0)
