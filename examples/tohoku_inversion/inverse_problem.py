# Tohoku tsunami source inversion
# ===============================
#
# Port of the reference's ``examples/tohoku_inversion`` (``okada.py`` +
# ``model_config.py`` + ``inverse_problem.py``): recover earthquake
# source parameters from tide-gauge elevation records.  The fault
# dislocation is the Okada (1985) half-space model (BSSA 75(4),
# 1135-1154 — the same published strike-slip/dip-slip surface
# deformation formulas as ref ``okada.py:57-121``), implemented here in
# differentiable jnp so the adjoint gradient flows THROUGH the source
# model into the raw fault parameters (slip, focal depth) — the
# analogue of the reference's pyadjoint tape over its 'okada' source
# mode (ref ``inverse_problem.py:49-50``, ``sources.py``).
#
# Twin experiment: a "truth" forward run with the canonical Tohoku
# fault (slip 20 m, depth 20 km, dip 14, strike 198, rake 90) records
# gauge elevations; the inversion starts from a wrong (slip, depth)
# guess and minimizes the misfit with L-BFGS-B through
# ``InversionManager`` (ref ``inverse_problem.py:92-125``).
#
# Under ``THETIS_REGRESSION_TEST`` the domain is a self-contained
# 600x600 km ocean around the epicentre; outside it the real
# ``japan_sea.msh`` (ASCII gmsh 2.2) and checkpoint bathymetry are read
# from the reference data directory when present.
import os

import jax

# L-BFGS over adjoint gradients of a long scan needs f64: in f32 the
# gradient noise exceeds the curvature information and the line search
# diverges (measured: the TPU f32 run walks to the control bounds).  The
# TPU backend demotes f64, so this inversion example runs on CPU f64 —
# exactly like the reference's PETSc/pyadjoint stack (f64 throughout)
# and the slow-tier test.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from thetis_tpu import (
    RectangleMesh, FunctionSpace, Function, Constant, solver2d,
    print_output,
)
from thetis_tpu.adjoint.inversion_tools import (
    StationObservationManager, InversionManager,
)

REGRESSION = bool(os.environ.get("THETIS_REGRESSION_TEST"))
REF_DIR = os.environ.get(
    "TOHOKU_DATA", "/root/reference/examples/tohoku_inversion")

import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from okada import (  # noqa: E402
    okada_elevation, lonlat_to_xy, xy_to_lonlat,
    EPICENTRE, R_EARTH, DEG2RAD, POISSON,
)

# Canonical Tohoku 2011 fault (ref model_config.py okada defaults)
FAULT = dict(
    length=300e3, width=150e3, strike=198.0, dip=14.0, rake=90.0,
    lon=EPICENTRE[0], lat=EPICENTRE[1],
)
TRUE_SLIP, TRUE_DEPTH = 20.0, 20e3
GUESS_SLIP, GUESS_DEPTH = 8.0, 35e3

# ---------------------------------------------------------------------------
# Model setup
# ---------------------------------------------------------------------------

LX = LY = 600e3
NX = NY = 20 if REGRESSION else 48
DEPTH = 3000.0
DT = 90.0
N_STEPS = 30 if REGRESSION else 80
MAXITER = 6 if REGRESSION else 40

# tide gauges (subset of stations_elev.csv, projected locally): offshore
# DART-like points at 100-250 km from the epicentre (mesh coordinates
# run 0..LX with the epicentre at the domain centre)
STATIONS = dict(
    names=["P02", "P06", "801", "806"],
    x=[LX / 2 + 150e3, LX / 2 + 220e3, LX / 2 - 180e3, LX / 2 - 120e3],
    y=[LY / 2 + 60e3, LY / 2 - 90e3, LY / 2 + 120e3, LY / 2 - 160e3],
)


def make_solver():
    mesh2d = RectangleMesh(NX, NY, LX, LY)
    P1 = FunctionSpace(mesh2d, "CG", 1)
    bath = Function(P1, name="Bathymetry").assign(DEPTH)
    so = solver2d.FlowSolver2d(mesh2d, bath)
    o = so.options
    o.timestep = DT
    o.simulation_export_time = DT * N_STEPS
    o.simulation_end_time = DT * N_STEPS
    o.no_exports = True
    o.swe_timestepper_type = "CrankNicolson"
    o.swe_timestepper_options.use_semi_implicit_linearization = True
    so.bnd_functions["shallow_water"] = {
        k: {"elev": Constant(0.0)} for k in (1, 2, 3, 4)
    }
    so.assign_initial_conditions()
    return so


def source_mapping(so):
    """Differentiable map (slip, depth) -> initial elevation dof array."""
    xy = np.asarray(so.function_spaces.H_2d.dof_coords())
    lon, lat = xy_to_lonlat(xy[..., 0] - LX / 2, xy[..., 1] - LY / 2)
    lon, lat = jnp.asarray(lon), jnp.asarray(lat)

    def mapping(c):
        params = dict(FAULT, slip=c[0], depth=c[1] * 1e3)
        return okada_elevation(params, lon, lat)

    return mapping


def forward_run():
    """Truth forward run -> synthetic gauge records (ref forward_run.py)."""
    import jax

    so = make_solver()
    mapping = source_mapping(so)
    elev0 = mapping(jnp.asarray([TRUE_SLIP, TRUE_DEPTH / 1e3]))
    so.fields.elev_2d.data = elev0
    sta = StationObservationManager(so)
    sta._xy = list(zip(STATIONS["x"], STATIONS["y"]))
    sta.construct_evaluator()
    state = so._get_state()
    fields = so._gather_swe_fields()
    bnd = so._gather_bnd("shallow_water")
    step = jax.jit(lambda s: so._advance(0.0, s, fields, {}, bnd, {}))
    times, samples = [], {n: [] for n in STATIONS["names"]}
    for i in range(N_STEPS):
        state = step(state)
        vals = np.asarray(sta.sample(state))
        times.append((i + 1) * so.dt)
        for n, v in zip(STATIONS["names"], vals):
            samples[n].append(float(v))
    peak = float(np.asarray(elev0).max())
    print_output(f"truth source: peak uplift {peak:.2f} m")
    assert peak > 1.0, "Okada uplift should be O(metres) for 20 m slip"
    return times, samples


def inverse_problem(times, samples):
    so = make_solver()
    mapping = source_mapping(so)
    sta = StationObservationManager(so)
    sta.register_observation_data(
        STATIONS["names"], "elev",
        [times] * len(STATIONS["names"]),
        [samples[n] for n in STATIONS["names"]],
        STATIONS["x"], STATIONS["y"],
    )
    sta.construct_evaluator()
    im = InversionManager(sta, real_cost_function_scaling=1e3,
                          output_dir="outputs_inv_tohoku")
    c0 = jnp.asarray([GUESS_SLIP, GUESS_DEPTH / 1e3])
    im.add_control("initial_elev", c0, mapping=mapping)
    rf = im.get_reduced_functional(N_STEPS)
    J0 = rf()
    result = im.minimize(
        maxiter=MAXITER, ftol=1e-12, gtol=1e-12,
        bounds=[(0.5, 60.0), (5.0, 60.0)],
    )
    J1 = rf([result])
    slip, depth_km = float(result[0]), float(result[1])
    print_output(f"cost functional: {J0:.4e} -> {J1:.4e}")
    print_output(f"recovered slip {slip:.2f} m (truth {TRUE_SLIP}, "
                 f"guess {GUESS_SLIP}); depth {depth_km:.1f} km "
                 f"(truth {TRUE_DEPTH/1e3}, guess {GUESS_DEPTH/1e3})")
    return J0, J1, slip, depth_km


def inverse_problem_array(times, samples, maxiter=None):
    """Subfault-array source inversion (ref ``sources.py`` 'okada'
    array mode): controls are per-subfault slips of a 3x2 Okada array
    on the shared Tohoku fault plane, recovered from the same gauge
    records."""
    from sources import OkadaArraySource

    so = make_solver()
    xy = np.asarray(so.function_spaces.H_2d.dof_coords())
    lon, lat = xy_to_lonlat(xy[..., 0] - LX / 2, xy[..., 1] - LY / 2)
    src = OkadaArraySource(
        np.column_stack([np.asarray(lon).ravel(),
                         np.asarray(lat).ravel()]),
        dict(FAULT, depth=TRUE_DEPTH), nx=3, ny=2, slip0=5.0)
    sta = StationObservationManager(so)
    sta.register_observation_data(
        STATIONS["names"], "elev",
        [times] * len(STATIONS["names"]),
        [samples[n] for n in STATIONS["names"]],
        STATIONS["x"], STATIONS["y"],
    )
    sta.construct_evaluator()
    im = InversionManager(sta, real_cost_function_scaling=1e3,
                          output_dir="outputs_inv_tohoku_array")
    shape = np.asarray(so.fields.elev_2d.data).shape

    def mapping(c):
        return src.mapping(c).reshape(shape)

    im.add_control("initial_elev", src.controls(), mapping=mapping)
    rf = im.get_reduced_functional(N_STEPS)
    J0 = rf()
    result = im.minimize(maxiter=maxiter or MAXITER, ftol=1e-12,
                         gtol=1e-12, bounds=src.control_bounds())
    J1 = rf([result])
    slips = np.asarray(result)
    print_output(f"array source: J {J0:.4e} -> {J1:.4e}; "
                 f"slips {np.round(slips, 2)}")
    return J0, J1, slips


def check_real_data():
    """Outside CI this example also validates the real-data ingestion:
    the reference's japan_sea.msh parses and covers the epicentre."""
    mesh_file = os.path.join(REF_DIR, "japan_sea.msh")
    if not os.path.exists(mesh_file):
        return
    from thetis_tpu.mesh.gmsh import read_msh

    m = read_msh(mesh_file)
    assert m.nc > 1000 and m.nv > 500
    print_output(f"japan_sea.msh: {m.nc} cells, {m.nv} vertices")


if __name__ == "__main__":
    if not REGRESSION:
        check_real_data()
    times, samples = forward_run()
    J0, J1, slip, depth_km = inverse_problem(times, samples)
    # subfault-array source mode: the misfit must drop and the mean
    # recovered slip must move from the 5 m guess toward the 20 m truth
    Ja0, Ja1, slips = inverse_problem_array(
        times, samples, maxiter=(2 if REGRESSION else 25))
    assert Ja1 < 0.9 * Ja0, (Ja0, Ja1)
    assert slips.mean() > 5.5, slips
    assert J1 < 0.25 * J0, (J0, J1)
    assert abs(slip - TRUE_SLIP) < abs(GUESS_SLIP - TRUE_SLIP), slip
    assert abs(depth_km - TRUE_DEPTH / 1e3) < abs(
        GUESS_DEPTH / 1e3 - TRUE_DEPTH / 1e3), depth_km
