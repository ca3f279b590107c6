# Tidal lagoon power plant operation (Angeloudis et al. 2018)
# ============================================================
#
# Port of the reference's ``examples/tidal_barrage/lagoon2d.py`` +
# ``modules/``: a tidal lagoon whose turbines/sluices are represented by
# paired flux boundaries (outer marker 1 / inner marker 2), driven by a
# two-way-generation operation algorithm (hill-chart bulb turbines,
# gate sluicing, ramp functions) that converts the instantaneous
# inner/outer head difference into plant fluxes each timestep.
#
# The reference's gmsh lagoon is replaced by a self-contained two-basin
# mesh: sea basin and impounded basin are disjoint components of one
# mesh, coupled only through the plant's flux boundaries — hydraulically
# identical to an impermeable barrage with embedded hydraulic
# structures.  Seaward boundary (marker 5) carries the M2 tide.
import math
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu import *
from thetis_tpu.mesh.mesh2d import Mesh2d
from thetis_tpu.model.callback import DiagnosticCallback


# ---------------------------------------------------------------------------
# Plant parametrisation (ref ``modules/parameterisations.py``)
# ---------------------------------------------------------------------------
class BulbTurbine:
    """Hill-chart bulb-turbine parametrisation (Aggidis & Feather 2012;
    ref ``parameterisations.py:5-37``): power (MW) and discharge (m3/s)
    as functions of the head, capped at the generator capacity."""

    def __init__(self, diameter=7.35, capacity_mw=20.0, grid_hz=50,
                 poles=95, rho=1025.0, g=9.807, h_min=1.0,
                 efficiency=(0.93, 0.83)):
        self.d = diameter
        self.cap = capacity_mw
        self.speed = 2 * 60 * grid_hz / poles  # rpm
        self.rho = rho
        self.g = g
        self.h_min = h_min
        self.eta = efficiency

    def rating(self, h):
        """(power MW, discharge m3/s) at head h > 0."""
        n11 = self.speed * self.d / math.sqrt(h)
        q11 = 0.0166 * n11 + 0.4861 if n11 < 255 else 4.75
        q = q11 * self.d ** 2 * math.sqrt(h)
        eff = -0.0019 * n11 + 1.2461
        p_hyd = self.rho * self.g * q * h * 1e-6
        gearbox = 0.9725
        if p_hyd * eff < self.cap:
            p = p_hyd * eff * gearbox
        else:
            p = self.cap * gearbox
            p_hyd = p / (eff * gearbox)
        q = p_hyd * 1e6 / (self.rho * self.g * h)
        return p, q

    @property
    def sluice_cd(self):
        """Discharge coefficient when free-wheeling (sluicing) through
        the runner, anchored to the rated flow at h_min."""
        area = math.pi * (self.d / 2) ** 2
        return self.rating(self.h_min)[1] / (
            area * math.sqrt(2 * self.g * self.h_min))


def _limited(q_new, q_old, ramp, limiter=0.2):
    """Rate-limit a structure flux between timesteps (stability; ref
    ``gate_sluicing``/``turbine_sluicing`` flux_limiter logic)."""
    if ramp >= 0.5 and abs(q_new) >= abs(q_old) > 0.0:
        return min(abs((1 + limiter) * q_old), abs(q_new))
    if ramp >= 0.5 and abs(q_old) >= abs(q_new):
        return max(abs((1 - limiter) * q_old), abs(q_new))
    return abs(q_new)


# operation modes (ref ``lagoon_operation.py``)
HOLD_HW, GEN_EBB, GENSLUICE_EBB, SLUICE_EBB, PUMP_EBB = 1, 2, 3, 4, 5
HOLD_LW, GEN_FLOOD, GENSLUICE_FLOOD, SLUICE_FLOOD, PUMP_FLOOD = 6, 7, 8, 9, 10


class TidalPowerPlant:
    """Two-way tidal power plant operation state machine
    (ref ``modules/lagoon_operation.py::lagoon_operation``).

    Times in the control dictionary are in HOURS.  ``step(h_i, h_o, t)``
    advances the plant state and returns (Q_turbine, Q_sluice, P_MW),
    with Q > 0 flowing INTO the basin (flood direction).
    """

    def __init__(self, n_turbines=25, n_sluices=0, holding_h=3.0,
                 gen_h=3.0, pump_h=2.5, pump_t=0.0, trigger_levels=(7, -6),
                 sluice_area=100.0, sluice_cd=1.0, turbine=None):
        self.turb = turbine or BulbTurbine()
        self.n_t = n_turbines
        self.n_s = n_sluices
        self.t_hold = [holding_h, holding_h]   # holding duration (h)
        self.t_gen = [gen_h, gen_h]            # generation duration (h)
        self.h_pump = pump_h
        self.t_pump = [pump_t, pump_t]
        self.tr_l = trigger_levels
        self.a_s = sluice_area
        self.c_d = sluice_cd
        # state
        self.mode = HOLD_HW
        self.mode_start = 0.0
        self.mode_age = 0.0
        self.ramp = 0.0
        self.q_t = 0.0
        self.q_s = 0.0
        self.power = 0.0
        self.energy = 0.0

    # -- state transitions -------------------------------------------------
    def _next_mode(self, dz, t):
        m, age = self.mode, self.mode_age
        hmin = self.turb.h_min

        def go(new):
            self.mode, self.mode_start = new, t

        if m == SLUICE_FLOOD and dz > 0:
            go(PUMP_FLOOD)
            if self.t_pump[0] <= 0.2:
                go(HOLD_HW)
        elif m == PUMP_FLOOD and age >= self.t_pump[0]:
            go(HOLD_HW)
        elif m == HOLD_HW and self.t_hold[0] <= 0.2 and dz > 0:
            go(SLUICE_EBB)
        elif m == HOLD_HW and age >= self.t_hold[0] and dz > hmin:
            go(GEN_EBB)
        elif m == GEN_EBB and dz < hmin and age > 0.25:
            go(SLUICE_EBB)
        elif m == GEN_EBB and age > self.t_gen[0]:
            go(GENSLUICE_EBB)
        elif m == GENSLUICE_EBB and dz < hmin:
            go(SLUICE_EBB)
        elif m == SLUICE_EBB and dz < 0:
            go(PUMP_EBB)
            if self.t_pump[1] <= 0.2:
                go(HOLD_LW)
        elif m == PUMP_EBB and age > self.t_pump[1]:
            go(HOLD_LW)
        elif m == HOLD_LW and self.t_hold[1] <= 0.2 and dz < 0:
            go(SLUICE_FLOOD)
        elif m == HOLD_LW and age > self.t_hold[1] and -dz > hmin:
            go(GEN_FLOOD)
        elif m == GEN_FLOOD and -dz < hmin and age > 0.25:
            go(SLUICE_FLOOD)
        elif m == GEN_FLOOD and age > self.t_gen[1]:
            go(GENSLUICE_FLOOD)
        elif m == GENSLUICE_FLOOD and -dz < hmin:
            go(SLUICE_FLOOD)
        # anti-stall guards (ref "special cases")
        if m == HOLD_HW and hmin > -dz > 0 and age > 2.0:
            self.mode = HOLD_LW
        elif m == HOLD_LW and hmin > dz > 0 and age > 2.0:
            self.mode = HOLD_HW
        if m == HOLD_HW and -dz > 0 and age > 0.1:
            go(SLUICE_FLOOD)
        elif m == HOLD_LW and dz > 0 and age > 0.1:
            go(SLUICE_EBB)

    def _update_ramp(self, m_prev, t, h_i):
        """Sine ramp when hydraulic structures open/close (ref L96-126)."""
        if self.mode != m_prev:
            self.ramp = 0.0
        if (self.mode, m_prev) in ((SLUICE_EBB, GENSLUICE_EBB),
                                   (SLUICE_FLOOD, GENSLUICE_FLOOD)):
            self.ramp = 1.0
        if self.mode == m_prev and self.mode_age < 0.2 and self.ramp < 1.0:
            self.ramp = math.sin(math.pi / 2 * (t - self.mode_start) / 0.2)
        elif 0.2 <= self.mode_age < 0.4:
            self.ramp = 1.0
        # pumping cutoffs near the trigger levels / end of the window
        if self.mode == PUMP_EBB and h_i <= self.tr_l[1] + 0.5:
            self.ramp = math.sin(
                math.pi / 2 * abs(h_i - self.tr_l[0]) / 0.5)
            if self.ramp <= 0.3:
                self.mode, self.mode_start, self.mode_age = HOLD_LW, t, 0.0
        if self.mode == PUMP_FLOOD and h_i >= self.tr_l[0] - 0.5:
            self.ramp = math.sin(
                math.pi / 2 * abs(self.tr_l[1] - h_i) / 0.5)
            if self.ramp <= 0.3:
                self.mode, self.mode_start, self.mode_age = HOLD_HW, t, 0.0
        if self.mode == PUMP_EBB and self.t_pump[1] - self.mode_age <= 0.2:
            self.ramp = math.sin(
                math.pi / 2 * (self.t_pump[1] - self.mode_age) / 0.2)
        if self.mode == PUMP_FLOOD and self.t_pump[0] - self.mode_age <= 0.2:
            self.ramp = math.sin(
                math.pi / 2 * (self.t_pump[0] - self.mode_age) / 0.2)

    # -- structure fluxes ---------------------------------------------------
    def _gate_flux(self, dz):
        raw = (self.ramp ** 2 * self.n_s * self.c_d * self.a_s
               * math.sqrt(2 * self.turb.g * abs(dz)))
        return -math.copysign(_limited(raw, self.q_s, self.ramp), dz)

    def _turbine_sluice_flux(self, dz):
        area = math.pi * (self.turb.d / 2) ** 2
        raw = (self.n_t * self.turb.sluice_cd * area
               * math.sqrt(2 * self.turb.g * abs(dz)))
        q = -math.copysign(_limited(raw, self.q_t, 1.0), dz)
        if dz != 0.0 and q == 0.0:
            q = -math.copysign(raw, dz)
        return q

    def _pump_power(self, q, dz):
        pump_eff = min(max(0.4, 0.28409853 * math.log(max(abs(dz), 1e-12))
                           + 0.60270881), 0.9)
        return -(abs(q) * self.turb.rho * self.turb.g * abs(dz) * 1e-6
                 ) / pump_eff

    def step(self, h_i, h_o, t, dt_hours):
        """Advance the plant state; t in hours."""
        dz = h_i - h_o
        m_prev = self.mode
        self._next_mode(dz, t)
        self.mode_age = t - self.mode_start
        self._update_ramp(m_prev, t, h_i)
        m = self.mode
        if m in (HOLD_HW, HOLD_LW):
            self.q_t, self.q_s, self.power = 0.0, 0.0, 0.0
        elif m in (GEN_EBB, GEN_FLOOD):
            side = 0 if m == GEN_EBB else 1
            p, q = self.turb.rating(abs(dz))
            self.power = self.ramp * self.n_t * self.turb.eta[side] * p
            self.q_t = -math.copysign(self.ramp * self.n_t * q, dz)
            self.q_s = 0.0
        elif m in (GENSLUICE_EBB, GENSLUICE_FLOOD):
            side = 0 if m == GENSLUICE_EBB else 1
            p, q = self.turb.rating(abs(dz))
            self.power = self.n_t * self.turb.eta[side] * p
            self.q_t = -math.copysign(self.n_t * q, dz)
            self.q_s = self._gate_flux(dz)
        elif m in (SLUICE_EBB, SLUICE_FLOOD):
            self.power = 0.0
            self.q_t = self._turbine_sluice_flux(dz)
            self.q_s = self._gate_flux(dz)
        elif m in (PUMP_EBB, PUMP_FLOOD):
            q = max(self.ramp * self.n_t
                    * self.turb.rating(self.h_pump)[1], 0.0)
            self.q_t = -q if m == PUMP_EBB else q
            self.power = self._pump_power(self.q_t, dz)
            self.q_s = 0.0
        self.energy += self.power * dt_hours
        return self.q_t, self.q_s, self.power


# ---------------------------------------------------------------------------
# Two-basin lagoon mesh (self-contained stand-in for lagoon.msh)
# ---------------------------------------------------------------------------
def make_lagoon_mesh(dx=400.0, lx=16e3, ly=6e3, x_barrage=8e3):
    """Sea basin [0, x_barrage] and impounded basin [x_barrage, lx] as
    disjoint components of one mesh.  Markers: 5 = seaward (x=0),
    1 = outer plant boundary, 2 = inner plant boundary."""
    voff = 0
    all_coords, all_cells = [], []
    for (x0, x1) in ((0.0, x_barrage), (x_barrage, lx)):
        nx, ny = int((x1 - x0) / dx), int(ly / dx)
        xs = np.linspace(x0, x1, nx + 1)
        ys = np.linspace(0.0, ly, ny + 1)
        X, Y = np.meshgrid(xs, ys, indexing="ij")
        coords = np.stack([X.ravel(), Y.ravel()], axis=1)

        def vid(i, j, ny=ny):
            return i * (ny + 1) + j

        i, j = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
        i, j = i.ravel(), j.ravel()
        tri = np.concatenate([
            np.stack([vid(i, j), vid(i + 1, j), vid(i + 1, j + 1)], axis=1),
            np.stack([vid(i, j), vid(i + 1, j + 1), vid(i, j + 1)], axis=1),
        ], axis=0)
        all_coords.append(coords)
        all_cells.append(tri + voff)
        voff += len(coords)
    coords = np.concatenate(all_coords)
    cells = np.concatenate(all_cells)
    eps = 1e-3

    def markers(mid):
        m = np.zeros(len(mid), dtype=np.int32)
        m[np.abs(mid[:, 0]) < eps] = 5
        near_barrage = np.abs(mid[:, 0] - x_barrage) < eps
        m[near_barrage & (mid[:, 0] <= x_barrage)] = 1
        return m

    # both sides of the barrage share the same x: distinguish the inner
    # component by vertex index range (its vertices start at n_outer)
    n_outer = len(all_coords[0])
    mesh = Mesh2d(coords, cells, boundary_markers=markers,
                  name="lagoon_two_basin")
    # fix up: barrage facets belonging to the inner component -> marker 2
    fm = mesh.facet_marker_np.copy()
    bnd = mesh.facet_is_boundary_np
    mids_x = coords[mesh.facet_verts_np].mean(axis=1)[:, 0]
    inner_facet = mesh.facet_verts_np.min(axis=1) >= n_outer
    sel = bnd & (np.abs(mids_x - x_barrage) < eps) & inner_facet
    fm[sel] = 2
    mesh.facet_marker_np = fm
    mesh.boundary_markers = sorted(
        int(v) for v in np.unique(fm[bnd]) if v != 0) or [0]
    # boundary lengths are derived from markers: recompute
    mesh.boundary_len = {}
    for m in mesh.boundary_markers:
        mesh.boundary_len[m] = float(
            mesh.facet_len_np[(fm == m) & bnd].sum())
    return mesh


# ---------------------------------------------------------------------------
# standalone plant regression: 48 h of M2 forcing through the algorithm
# ---------------------------------------------------------------------------
def run_plant_standalone():
    plant = TidalPowerPlant(n_turbines=25, n_sluices=0)
    amplitude, period = 4.0, 12.42 * 3600.0
    omega = 2 * math.pi / period
    dt = 25.0
    h_i = 0.0   # impounded level (simple storage model)
    basin_area = 8e3 * 6e3
    modes, total_energy = set(), 0.0
    for k in range(int(48 * 3600 / dt)):
        t = k * dt
        h_o = math.tanh(t / (4 * 3600.0)) * math.sin(omega * t) * amplitude
        q_t, q_s, p = plant.step(h_i, h_o, t / 3600.0, dt / 3600.0)
        h_i += (q_t + q_s) * dt / basin_area
        modes.add(plant.mode)
        total_energy = plant.energy
    return modes, total_energy, h_i


REGRESSION = bool(os.environ.get("THETIS_REGRESSION_TEST"))

if __name__ == "__main__":
    # 1. plant algorithm regression (host-side, covers the full 48 h
    #    two-way cycle: holding -> generating -> gen+sluicing -> sluicing)
    modes, energy, h_i_final = run_plant_standalone()
    print_output(f"plant modes visited: {sorted(modes)}, "
                 f"energy {energy:.1f} MWh")
    assert {HOLD_HW, GEN_EBB, SLUICE_EBB, HOLD_LW,
            GEN_FLOOD, SLUICE_FLOOD} <= modes, modes
    # 25 x 20 MW plant, two-way: O(1) GWh over 48 h; generous bounds
    assert 200.0 < energy < 9000.0, energy
    assert abs(h_i_final) < 8.0

    # 2. coupled run: plant fluxes as paired boundary conditions
    mesh2d = make_lagoon_mesh(dx=500.0 if REGRESSION else 250.0)
    x_nodes = mesh2d.coords_np[:, 0]
    # bell-curve channel + seaward-sloping bathymetry (ref L44-50);
    # dries toward the landward end -> wetting-and-drying active
    depth_oce, depth_riv = 20.0, -10.0
    sigma_b = 2000.0
    P1_2d = FunctionSpace(mesh2d, "CG", 1)
    bathy = (2e5 / (sigma_b * math.sqrt(2 * math.pi))
             * np.exp(-(mesh2d.coords_np[:, 1] - 3000.0) ** 2
                      / (2 * sigma_b ** 2))
             + (depth_riv - depth_oce) * x_nodes / 16e3)
    bathymetry_2d = Function(P1_2d, name="Bathymetry")
    bathymetry_2d.data = jnp.asarray(bathy)
    # viscosity sponge at the seaward boundary
    visc = np.where(x_nodes <= 2e3, 1e3 * (2e3 + 1 - x_nodes) / 2e3, 1.0)
    viscosity_2d = Function(P1_2d, name="viscosity")
    viscosity_2d.data = jnp.asarray(visc)

    t_export = 200.0
    t_end = 48 * 3600.0
    if REGRESSION:
        t_end = t_export

    solver_obj = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
    options = solver_obj.options
    options.simulation_export_time = t_export
    options.simulation_end_time = t_end
    options.check_volume_conservation_2d = True
    options.swe_timestepper_type = "CrankNicolson"
    options.swe_timestepper_options.implicitness_theta = 0.5
    options.swe_timestepper_options.use_semi_implicit_linearization = True
    options.use_wetting_and_drying = True
    options.wetting_and_drying_alpha = 0.5
    options.manning_drag_coefficient = 0.02
    options.horizontal_viscosity = viscosity_2d
    options.timestep = 25.0
    options.no_exports = REGRESSION

    amplitude, period = 4.0, 12.42 * 3600.0
    omega = 2 * math.pi / period
    tidal_elev = Constant(0.0)
    q_turb_out = Constant(0.0)
    q_turb_in = Constant(0.0)
    solver_obj.bnd_functions["shallow_water"] = {
        5: {"elev": tidal_elev},
        1: {"flux": q_turb_out},
        2: {"flux": q_turb_in},
    }
    solver_obj.assign_initial_conditions(uv=Constant((1e-5, 0.0)))

    plant = TidalPowerPlant(n_turbines=25, n_sluices=0)
    area = np.asarray(mesh2d.cell_area_np)
    mids_x = mesh2d.coords_np[mesh2d.cells_np].mean(axis=1)[:, 0]
    inner = mids_x > 8e3
    area_in, area_out = area[inner].sum(), area[~inner].sum()

    class LagoonCallback(DiagnosticCallback):
        """Region-averaged water levels -> plant fluxes each timestep
        (ref ``modules/tools.py::LagoonCallback``, 5-step smoothing)."""
        name = "lagoon"
        variable_names = ["h_inner", "h_outer", "power", "energy",
                          "q_turbine", "mode"]

        def __init__(self, solver, n_smooth=5):
            super().__init__(solver)
            self.hist = {"in": [], "out": []}
            self.n = n_smooth

        def __call__(self):
            s = self.solver_obj
            elev = np.asarray(s.fields.elev_2d.data).mean(axis=1)
            h_in = float((elev[inner] * area[inner]).sum() / area_in)
            h_out = float((elev[~inner] * area[~inner]).sum() / area_out)
            self.hist["in"].append(h_in)
            self.hist["out"].append(h_out)
            h_i = float(np.mean(self.hist["in"][-self.n:]))
            h_o = float(np.mean(self.hist["out"][-self.n:]))
            t = s.simulation_time
            dt = s.options.timestep
            q_t, q_s, p = plant.step(h_i, h_o, t / 3600.0, dt / 3600.0)
            # flux > 0 leaves the domain through the boundary: the outer
            # boundary passes -Q (into the sea side when Q < 0), the
            # inner boundary the opposite sign
            q_turb_out.assign(q_t + q_s)
            q_turb_in.assign(-(q_t + q_s))
            return h_in, h_out, p, plant.energy, q_t, float(plant.mode)

        def message_str(self, h_in, h_out, p, e, q, m):
            return (f"lagoon: h_i {h_in:6.3f} h_o {h_out:6.3f} "
                    f"P {p:7.2f} MW mode {int(m)}")

    solver_obj.add_callback(LagoonCallback(solver_obj), "timestep")

    def update_forcings(t):
        tidal_elev.assign(
            math.tanh(t / (4 * 3600.0)) * math.sin(omega * t) * amplitude)

    solver_obj.iterate(update_forcings=update_forcings)
    elev = np.asarray(solver_obj.fields.elev_2d.data)
    uv = np.asarray(solver_obj.fields.uv_2d.data)
    assert np.isfinite(elev).all() and np.isfinite(uv).all()
    assert abs(elev).max() < 12.0
