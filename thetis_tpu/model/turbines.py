"""Tidal turbine farms.

Re-implementation of the reference's ``thetis/turbines.py``: thrust/power
models (constant and tabulated thrust curves with upwind and support-drag
corrections, ref L17-145), continuous-density and discrete (bump-function)
farms (ref L148-210), and the power functional callback (ref L213-264).

Everything is expressed in jnp over cell-quadrature arrays so that farm
power and drag are differentiable w.r.t. turbine density *and* discrete
turbine coordinates — the pyadjoint-based farm optimisation of the
reference becomes plain ``jax.grad``.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..config import physical_constants
from .callback import DiagnosticCallback
from .options import FrozenOptions
from ..utils.log import print_output

__all__ = [
    "TidalTurbineOptions",
    "TidalTurbineFarmOptions",
    "DiscreteTidalTurbineFarmOptions",
    "TidalTurbine",
    "ConstantThrustTurbine",
    "TabulatedThrustTurbine",
    "TidalTurbineFarm",
    "DiscreteTidalTurbineFarm",
    "TurbineFunctionalCallback",
    "MinimumDistanceConstraints",
    "load_turbine",
]


class TidalTurbineOptions(FrozenOptions):
    """ref ``options.py`` TidalTurbineOptions family."""

    def __init__(self, **kw):
        self.diameter = 18.0
        self.projected_diameter = None
        self.C_support = 0.0
        self.A_support = 0.0
        self.thrust_coefficient = 0.8
        self.power_coefficient = None
        self.thrust_coefficients = None
        self.power_coefficients = None
        self.thrust_speeds = None
        self.apply_shear_profile = False
        self.shear_alpha = 7.0
        self.shear_beta = 0.4
        self.rel_hub_height = None
        self.structure_type = "bottom-fixed"
        self.update(kw)
        self._freeze()


class TidalTurbineFarmOptions(FrozenOptions):
    """ref ``options.py`` TidalTurbineFarmOptions."""

    def __init__(self, **kw):
        self.turbine_type = "constant"
        self.turbine_options = TidalTurbineOptions()
        self.turbine_density = 0.0
        self.break_even_wattage = 0.0
        self.upwind_correction = False
        self.update(kw)
        self._freeze()


class DiscreteTidalTurbineFarmOptions(TidalTurbineFarmOptions):
    def __init__(self, **kw):
        self.turbine_coordinates = []
        self.quadrature_degree = 10
        super().__init__(**kw)


#: hardcoded rotor-disc vertical sampling weights (ref ``turbines.py:29-34``)
ROTOR_WEIGHTINGS = np.array([0.052, 0.0903, 0.1099, 0.1212, 0.1266,
                             0.1266, 0.1212, 0.1099, 0.0903, 0.052])


class TidalTurbine:
    """ref ``turbines.py:17-93``."""

    def __init__(self, options, upwind_correction=False,
                 rotor_weightings=None):
        self.diameter = options.diameter
        self.projected_diameter = options.projected_diameter or self.diameter
        self.C_support = options.C_support
        self.A_support = options.A_support
        self.upwind_correction = upwind_correction
        self.apply_shear_profile = bool(
            getattr(options, "apply_shear_profile", False))
        self.shear_alpha = float(getattr(options, "shear_alpha", 7.0))
        self.shear_beta = float(getattr(options, "shear_beta", 0.4))
        self.rel_hub_height = getattr(options, "rel_hub_height", None)
        self.structure_type = getattr(options, "structure_type",
                                      "bottom-fixed")
        self.rotor_weightings = np.asarray(
            rotor_weightings if rotor_weightings is not None
            else ROTOR_WEIGHTINGS)

    def rotor_averaged_velocity(self, uv, depth):
        """Cube-weighted rotor-disc average of a power-law shear profile
        (ref ``turbines.py:60-84``): returns an effective SPEED (scalar
        per site)."""
        if not self.apply_shear_profile:
            return uv
        if self.rel_hub_height is None:
            raise ValueError(
                "`rel_hub_height` must be specified when applying a "
                "shear profile.")
        if self.structure_type == "bottom-fixed":
            hub = self.rel_hub_height          # height above seabed
        elif self.structure_type == "floating":
            hub = depth - self.rel_hub_height  # depth below free surface
        else:
            raise ValueError(
                f"Unknown turbine structure type '{self.structure_type}'")
        N = len(self.rotor_weightings)
        offs = jnp.asarray(np.linspace(-self.diameter / 2,
                                       self.diameter / 2, N))
        w = jnp.asarray(self.rotor_weightings)
        shape = jnp.shape(depth) if hasattr(depth, "shape") else ()
        z_vals = (jnp.asarray(hub) + offs.reshape((N,) + (1,) * len(shape)))
        umag = jnp.sqrt(jnp.maximum((uv**2).sum(-1), 1e-28))
        u_samples = umag[None] * (
            z_vals / (self.shear_beta * depth)[None]) ** (1.0 / self.shear_alpha)
        return (jnp.sum(u_samples**3
                        * w.reshape((N,) + (1,) * len(shape)),
                        axis=0)) ** (1.0 / 3.0)

    def _thrust_area(self, uv):
        C_T = self.thrust_coefficient(uv)
        A_T = np.pi * self.diameter**2 / 4
        fric = C_T * A_T
        if self.C_support:
            fric = fric + self.C_support * self.A_support
        return fric

    def velocity_correction(self, uv, depth):
        if self.upwind_correction:
            fric = self._thrust_area(uv)
            return 0.5 * (
                1 + jnp.sqrt(1 - fric / (self.projected_diameter * depth))
            )
        return 1.0

    def friction_coefficient(self, uv, depth):
        if self.apply_shear_profile:
            u_eff = self.rotor_averaged_velocity(uv, depth)  # speed
            thrust_area = self._thrust_area(u_eff)
            alpha = self.velocity_correction(u_eff, depth)
        else:
            thrust_area = self._thrust_area(uv)
            alpha = self.velocity_correction(uv, depth)
        return thrust_area / 2.0 / alpha**2

    def power(self, uv, depth):
        """Power density expression at quadrature points (W per turbine)."""
        alpha = self.velocity_correction(uv, depth)
        A_T = np.pi * self.diameter**2 / 4
        if self.apply_shear_profile:
            u_eff = self.rotor_averaged_velocity(uv, depth)
            uv3 = u_eff**3 / alpha**3
        else:
            uv3 = ((uv**2).sum(-1)) ** 1.5 / alpha**3
        C_P = self.power_coefficient(uv3 ** (1.0 / 3.0))
        return 0.5 * physical_constants["rho0"] * A_T * C_P * uv3


class ConstantThrustTurbine(TidalTurbine):
    """ref ``turbines.py:96-106``."""

    def __init__(self, options, upwind_correction=False):
        super().__init__(options, upwind_correction)
        self.C_T = options.thrust_coefficient
        self.C_P = options.power_coefficient or 0.5 * self.C_T * (
            1 + (1 - self.C_T) ** 0.5
        )

    def thrust_coefficient(self, uv):
        return self.C_T

    def power_coefficient(self, umag):
        return self.C_P


class TabulatedThrustTurbine(TidalTurbine):
    """Piecewise-linear thrust/power curves (ref ``turbines.py:128-145``);
    zero below the cut-in speed and above the last tabulated speed."""

    def __init__(self, options, upwind_correction=False):
        super().__init__(options, upwind_correction)
        self.C_T = np.asarray(options.thrust_coefficients, dtype=float)
        self.speeds = np.asarray(options.thrust_speeds, dtype=float)
        assert len(self.C_T) == len(self.speeds)
        if options.power_coefficients is not None:
            self.C_P = np.asarray(options.power_coefficients, dtype=float)
        else:
            self.C_P = 0.5 * self.C_T * (1 + (1 - self.C_T) ** 0.5)

    def _interp(self, table, uv_or_umag):
        umag = (
            jnp.sqrt((uv_or_umag**2).sum(-1))
            if uv_or_umag.ndim and uv_or_umag.shape[-1:] == (2,)
            else uv_or_umag
        )
        val = jnp.interp(umag, jnp.asarray(self.speeds), jnp.asarray(table))
        return jnp.where(
            (umag < self.speeds[0]) | (umag > self.speeds[-1]), 0.0, val
        )

    def thrust_coefficient(self, uv):
        return self._interp(self.C_T, uv)

    def power_coefficient(self, umag):
        return self._interp(self.C_P, umag)


class TidalTurbineFarm:
    """Continuous turbine-density farm (ref ``turbines.py:148-173``)."""

    def __init__(self, asm, turbine_density, options, cell_mask=None):
        """
        :arg asm: DGAssembler
        :arg turbine_density: density at quadrature points (nc, nq) or any
            coefficient convertible via the SWE equation's helpers
        :arg cell_mask: optional (nc,) 0/1 mask restricting the farm's
            subdomain (the reference's dx(subdomain_id) measure)
        """
        self.asm = asm
        upwind_correction = getattr(options, "upwind_correction", False)
        if options.turbine_type == "constant":
            self.turbine = ConstantThrustTurbine(
                options.turbine_options, upwind_correction
            )
        elif options.turbine_type == "table":
            self.turbine = TabulatedThrustTurbine(
                options.turbine_options, upwind_correction
            )
        else:
            raise ValueError(f"unknown turbine_type {options.turbine_type}")
        self.break_even_wattage = options.break_even_wattage
        from ..fem.assembly import coefficient_cell_q

        density_q = coefficient_cell_q(asm, turbine_density)
        if cell_mask is not None:
            density_q = density_q * jnp.asarray(cell_mask)[:, None]
        self.turbine_density_q = density_q

    # used by the SWE TurbineDragTerm
    def friction_coefficient_q(self, uv_q, H_q):
        return self.turbine.friction_coefficient(uv_q, H_q)

    def number_of_turbines(self):
        return float(self.asm.integrate_cellq(self.turbine_density_q))

    def power_output_q(self, uv_q, H_q):
        """Total farm power (W): integral of power density * turbine
        density."""
        p = self.turbine.power(uv_q, H_q)
        return self.asm.integrate_cellq(p * self.turbine_density_q)


def turbine_density_from_coordinates(asm, coordinates, radius):
    """Sum of C-infinity bump functions at the turbine coordinates,
    normalised to unit integral per turbine (ref ``turbines.py:193-210``).
    Differentiable w.r.t. ``coordinates``."""
    mesh = asm.mesh
    # quadrature point coordinates (nc, nq, 2)
    qp = asm.space._tab_np["qp"]
    p = mesh.coords_np[mesh.cells_np]
    J = np.stack([p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]], axis=2)
    xq = jnp.asarray(p[:, 0][:, None, :] + np.einsum("cij,qj->cqi", J, qp))
    coords = jnp.asarray(coordinates, dtype=jnp.result_type(float))  # (nt, 2)
    dx0 = (xq[None, ..., 0] - coords[:, None, None, 0]) / radius
    dx1 = (xq[None, ..., 1] - coords[:, None, None, 1]) / radius
    def psi(d):
        d2 = jnp.minimum(d**2, 1.0 - 1e-12)
        return jnp.where(jnp.abs(d) < 1.0, jnp.exp(1.0 - 1.0 / (1.0 - d2)), 0.0)
    bumps = psi(dx0) * psi(dx1)  # (nt, nc, nq)
    # normalise each bump by its DISCRETE integral so every turbine
    # contributes exactly one to the farm count on this mesh+quadrature
    # (the analytic normalisation 1.45661 r^2 drifts when the bump is
    # marginally resolved — and the degree-3 triangle rule's negative
    # centroid weight can even flip the sign of an unresolved bump;
    # remains differentiable w.r.t. the coordinates)
    wdetJ = asm.wdetJ  # (nc, nq)
    integrals = jnp.einsum("tcq,cq->t", bumps, wdetJ)
    analytic = 1.45661 * radius**2
    if not isinstance(integrals, jax.core.Tracer) and \
            bool(jnp.any(integrals < 0.3 * analytic)):
        raise ValueError(
            "turbine bump function is not resolved by the mesh "
            f"(discrete integrals {np.asarray(integrals)} vs analytic "
            f"{analytic:.3g}); refine the mesh near the turbines"
        )
    return (bumps / integrals[:, None, None]).sum(axis=0)


class DiscreteTidalTurbineFarm(TidalTurbineFarm):
    """Farm of individually-positioned turbines (ref ``turbines.py:176-210``)."""

    def __init__(self, asm, options, cell_mask=None):
        upwind_correction = getattr(options, "upwind_correction", False)
        turbine = (
            ConstantThrustTurbine(options.turbine_options, upwind_correction)
            if options.turbine_type == "constant"
            else TabulatedThrustTurbine(options.turbine_options, upwind_correction)
        )
        radius = turbine.projected_diameter * 0.5
        density = turbine_density_from_coordinates(
            asm, options.turbine_coordinates, radius
        )
        super().__init__(asm, density, options, cell_mask=cell_mask)


class TurbineFunctionalCallback(DiagnosticCallback):
    """Farm power/profit time-integrator (ref ``turbines.py:213-264``)."""

    name = "turbine"
    variable_names = ["current_power", "average_power", "average_profit"]

    def __init__(self, solver_obj, **kwargs):
        if not hasattr(solver_obj, "tidal_farms"):
            solver_obj.create_equations()
        self.farms = solver_obj.tidal_farms
        nfarms = len(self.farms)
        super().__init__(solver_obj, array_dim=nfarms, **kwargs)
        self.dt = solver_obj.dt or solver_obj.options.timestep
        self.cost = [farm.number_of_turbines() for farm in self.farms]
        if self.append_to_log:
            print_output(f"Number of turbines = {sum(self.cost)}")
        self.break_even_wattage = [f.break_even_wattage for f in self.farms]
        self.instantaneous_power = [0.0] * nfarms
        self.integrated_power = [0.0] * nfarms
        self.average_power = [0.0] * nfarms
        self.average_profit = [0.0] * nfarms
        self.time_period = 0.0

    def __call__(self):
        so = self.solver_obj
        asm = so.asm
        uv_q = asm.cell_values(so.fields.uv_2d.data)
        eta_q = asm.cell_values(so.fields.elev_2d.data)
        H_q = so.depth.total_depth(so.eq_sw.bathy_q, eta_q, so.eq_sw.alpha_q)
        self.time_period += self.dt
        current = []
        for i, farm in enumerate(self.farms):
            power = float(farm.power_output_q(uv_q, H_q))
            current.append(power)
            self.instantaneous_power[i] = power
            self.integrated_power[i] += power * self.dt
            self.average_power[i] = self.integrated_power[i] / self.time_period
            self.average_profit[i] = (
                self.average_power[i]
                - self.break_even_wattage[i] * self.cost[i]
            )
        return current, list(self.average_power), list(self.average_profit)

    def message_str(self, current, avg_power, avg_profit):
        return (
            f"Current power, average power and profit for each farm: "
            f"{current}, {avg_power}, {avg_profit}"
        )


class MinimumDistanceConstraints:
    """Minimum-distance inequality constraints between turbines for
    position optimisation (ref ``turbines.py:293-368``): ``function(m)``
    returns one value per turbine pair that must be positive, and
    ``jacobian(m)`` its gradient; plugs into scipy SLSQP as
    ``{'type': 'ineq', 'fun': ..., 'jac': ...}`` (the pyadjoint
    InequalityConstraint analogue)."""

    def __init__(self, turbine_positions, minimum_distance):
        self._turbines = [float(xi) for xy in turbine_positions for xi in xy]
        self._minimum_distance = float(minimum_distance)
        self._nturbines = len(turbine_positions)

    def length(self):
        return int(self._nturbines * (self._nturbines - 1) / 2)

    def function(self, m):
        m = np.asarray(m, dtype=float)
        out = []
        for i in range(self._nturbines):
            for j in range(i):
                out.append(
                    (m[2 * i] - m[2 * j]) ** 2
                    + (m[2 * i + 1] - m[2 * j + 1]) ** 2
                    - self._minimum_distance ** 2
                )
        out = np.asarray(out)
        if (out <= 0).any():
            print_output(
                "Minimum distance inequality constraints (should all "
                f"be > 0): {out}"
            )
        return out

    def jacobian(self, m):
        m = np.asarray(m, dtype=float)
        grad = np.zeros((self.length(), self._nturbines * 2))
        row = 0
        for i in range(self._nturbines):
            for j in range(i):
                grad[row, 2 * i] = 2 * (m[2 * i] - m[2 * j])
                grad[row, 2 * j] = -2 * (m[2 * i] - m[2 * j])
                grad[row, 2 * i + 1] = 2 * (m[2 * i + 1] - m[2 * j + 1])
                grad[row, 2 * j + 1] = -2 * (m[2 * i + 1] - m[2 * j + 1])
                row += 1
        return grad

    def scipy_constraint(self):
        """As a scipy.optimize constraint dict."""
        return {"type": "ineq", "fun": self.function,
                "jac": self.jacobian}


def load_turbine(path, include_support=True, discrete=True):
    """Load a turbine definition from a YAML or JSON file into a farm
    options object (ref ``turbines.py:371-419``): supports constant and
    table-based thrust/power curves and optional support-structure data.
    """
    import json

    with open(path) as f:
        if path.endswith((".yaml", ".yml")):
            import yaml

            data = yaml.safe_load(f)
        else:
            data = json.load(f)

    opts_cls = (DiscreteTidalTurbineFarmOptions if discrete
                else TidalTurbineFarmOptions)
    opts = opts_cls()
    opts.turbine_type = data.get("turbine_thrust_def", "constant")
    to = opts.turbine_options
    if opts.turbine_type == "table":
        to.thrust_speeds = data["curves"]["speeds"]
        to.thrust_coefficients = data["curves"]["thrust"]
        to.power_coefficients = data["curves"]["power"]
    else:
        to.thrust_coefficient = data["thrust_coefficient"]
        to.power_coefficient = data.get("power_coefficient")
    if include_support and "support_structure" in data:
        ss = data["support_structure"]
        to.structure_type = ss.get("type", "bottom-fixed")
        to.rel_hub_height = ss.get("rel_hub_height")
        to.C_support = ss.get("C_support", 0.0)
        to.A_support = ss.get("A_support", 0.0)
    to.diameter = data["diameter"]
    if discrete:
        opts.upwind_correction = data.get("upwind_correction", True)
    return opts
