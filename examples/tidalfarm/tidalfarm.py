# Tidal farm optimisation example
# ===============================
#
# Port of the reference's ``examples/tidalfarm/tidalfarm.py``: optimise a
# turbine-density field in a tidal channel to maximise energy profit
# (power revenue minus turbine cost), with the adjoint gradient supplied
# by jax.grad instead of pyadjoint.
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu import *
from thetis_tpu.model.turbines import (
    TidalTurbineFarmOptions,
    TidalTurbineOptions,
)
from thetis_tpu.adjoint import Control, ReducedFunctional, minimize

# channel with a constriction-free rectangular farm area
lx, ly = 2000.0, 600.0
mesh2d = RectangleMesh(50, 15, lx, ly)
P1_2d = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(P1_2d, name="Bathymetry").assign(40.0)

solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
options = solver_obj.options
options.timestep = 10.0
options.simulation_export_time = 200.0
options.simulation_end_time = 200.0
options.no_exports = True
options.swe_timestepper_type = "CrankNicolson"
options.horizontal_viscosity = Constant(2.0)
options.quadratic_drag_coefficient = Constant(0.0025)

farm = TidalTurbineFarmOptions()
farm.turbine_options = TidalTurbineOptions(diameter=18.0,
                                           thrust_coefficient=0.8)
x, y = SpatialCoordinate(mesh2d)
farm_mask = ((jnp.abs(x - lx / 2) < 300.0) & (jnp.abs(y - ly / 2) < 200.0))
farm.turbine_density = Function(P1_2d).interpolate(
    jnp.where(farm_mask, 0.003, 0.0)
)
farm.break_even_wattage = 200.0  # W per turbine
options.tidal_turbine_farms = {"everywhere": [farm]}

solver_obj.bnd_functions["shallow_water"] = {
    1: {"un": Constant(-2.0)},
    2: {"elev": Constant(0.0)},
}
solver_obj.assign_initial_conditions(uv=jnp.asarray([2.0, 0.0]), elev=0.0)
solver_obj.initialize()

n_steps = 5 if os.environ.get("THETIS_REGRESSION_TEST") else 20
asm = solver_obj.asm
farm_obj = solver_obj.tidal_farms[0]
dt = solver_obj.dt


def profit_step(state, fields, t):
    """Average profit integrand: farm power minus break-even cost."""
    uv_q = asm.cell_values(state["uv"])
    eta_q = asm.cell_values(state["elev"])
    H_q = solver_obj.depth.total_depth(solver_obj.eq_sw.bathy_q, eta_q)
    density_q = fields["turbine_density_0"]
    power = asm.integrate_cellq(farm_obj.turbine.power(uv_q, H_q) * density_q)
    cost = farm.break_even_wattage * asm.integrate_cellq(density_q)
    return (power - cost) / (n_steps * dt)


forward = solver_obj.differentiable_forward(
    ["turbine_density_0"], step_functional=profit_step, n_steps=n_steps
)

# maximise profit = minimise -profit; scale for optimizer conditioning
rf = ReducedFunctional(forward, Control(farm.turbine_density),
                       scale=-1e-5)

if __name__ == "__main__":
    d0 = farm.turbine_density.data
    J0 = rf([d0])
    print_output(f"initial profit functional: {-J0 / 1e-5:.4e} W")
    mask_p1 = np.asarray(
        Function(P1_2d).interpolate(jnp.where(farm_mask, 1.0, 0.0)).data
    )
    # optimise within [0, d_max] inside the farm area only
    bounds = list(zip(np.zeros(mesh2d.nv), 0.01 * mask_p1))
    maxiter = 3 if os.environ.get("THETIS_REGRESSION_TEST") else 15
    optimal = minimize(rf, bounds=bounds, options={"maxiter": maxiter})
    J1 = rf([optimal])
    print_output(f"optimised profit functional: {-J1 / 1e-5:.4e} W")
    assert J1 <= J0, "optimisation must not decrease profit"
