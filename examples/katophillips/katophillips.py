"""
Kato-Phillips wind-driven entrainment
=====================================

Port of the reference's ``test/turbulence/test_katophillips.py`` setup as
a runnable example: an initially linearly stratified water column
(N0 = 0.01 1/s) mixed by a constant surface wind stress
(u* = 0.01 m/s) on an x-periodic channel.  The GLS k-epsilon closure
with Canuto-A stability functions deepens the surface mixed layer along
the empirical curve D(t) = 1.05 u* sqrt(t / N0).
"""
import os

import numpy as np

from thetis_tpu import *  # noqa: F401,F403
from thetis_tpu.mesh.generation import PeriodicRectangleMesh
from thetis_tpu.model.flowsolver3d import FlowSolver

g = float(physical_constants["g_grav"])
rho0 = float(physical_constants["rho0"])
depth = 50.0
layers = 25
u_s = 0.01
buoyfreq0 = 0.01

mesh2d = PeriodicRectangleMesh(3, 2, 7500.0, 5000.0, direction="x")
P1 = FunctionSpace(mesh2d, "CG", 1)
bath = Function(P1).assign(depth)

t_end = 30 * 3600.0
if os.getenv("THETIS_REGRESSION_TEST") is not None:
    t_end = 2 * 3600.0

solver_obj = FlowSolver(mesh2d, bath, layers)
options = solver_obj.options
options.timestep = 60.0
options.simulation_export_time = 1800.0
options.simulation_end_time = t_end - 1e-9
options.no_exports = True
options.use_nonlinear_equations = False
options.solve_salinity = True
options.solve_temperature = False
options.use_implicit_vertical_diffusion = True
options.use_bottom_friction = False
options.use_turbulence = True
options.use_baroclinic_formulation = True
options.vertical_viscosity = 1.3e-6
options.vertical_diffusivity = 1.4e-7
options.wind_stress = np.array([rho0 * u_s**2, 0.0])

solver_obj.create_fields()
beta = 0.77
salt_grad = -(buoyfreq0**2) * rho0 / g / beta
sigma = np.asarray(solver_obj.extruded.sigma)
z_if = -depth * (1.0 - sigma)
s_if = 35.0 + salt_grad * z_if
s_layers = np.stack([s_if[:-1], s_if[1:]], axis=-1)
import jax.numpy as jnp  # noqa: E402

solver_obj.assign_initial_conditions(salt=jnp.broadcast_to(
    jnp.asarray(s_layers)[None, None], (mesh2d.nc, 3, layers, 2)))

if __name__ == "__main__":
    solver_obj.iterate()
    tke = np.asarray(solver_obj.fields.tke_3d.data)
    prof = np.concatenate([tke[0, 0, :, 0], tke[0, 0, -1:, 1]])
    zfine = np.linspace(z_if[0], z_if[-1], layers * 8)
    pfine = np.interp(zfine, z_if, prof)
    ix = pfine > 1e-5
    ml_depth = -zfine[ix].min() if ix.any() else 0.0
    target = 1.05 * u_s * np.sqrt(solver_obj.simulation_time / buoyfreq0)
    print_output(
        f"Mixed layer depth: {ml_depth:.2f} m (empirical: {target:.2f} m)"
    )
    assert np.isfinite(tke).all() and tke.min() >= 0.0
    # wind-driven mixed layer deepens toward the empirical
    # Kato-Phillips curve (exercised strictly in tests/test_katophillips)
    assert ml_depth > 0.0
    assert ml_depth < 3.0 * target + 5.0
