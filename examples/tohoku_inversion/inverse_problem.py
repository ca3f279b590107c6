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
import math
import os

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

# Earthquake epicentre (lon, lat) and local equirectangular projection
EPICENTRE = (142.369, 38.322)
R_EARTH = 6367.5e3
DEG2RAD = math.pi / 180.0
COS_LAT0 = math.cos(EPICENTRE[1] * DEG2RAD)


def lonlat_to_xy(lon, lat):
    x = R_EARTH * DEG2RAD * (lon - EPICENTRE[0]) * COS_LAT0
    y = R_EARTH * DEG2RAD * (lat - EPICENTRE[1])
    return x, y


def xy_to_lonlat(x, y):
    lon = EPICENTRE[0] + x / (R_EARTH * DEG2RAD * COS_LAT0)
    lat = EPICENTRE[1] + y / (R_EARTH * DEG2RAD)
    return lon, lat


# ---------------------------------------------------------------------------
# Okada (1985) surface deformation, differentiable jnp
# ---------------------------------------------------------------------------

POISSON = 0.25


def okada_elevation(params, lon, lat):
    """Vertical seafloor displacement of a rectangular finite fault.

    Okada (1985) eqs. (25)-(30) restricted to the vertical component of
    the strike-slip and dip-slip point contributions, assembled with the
    standard four-corner Chinnery substitution f(x,p) - f(x,p-W) -
    f(x-L,p) + f(x-L,p-W).  Matches ref ``okada.py`` (same published
    formulas); written directly in jnp over dof-coordinate arrays so
    ``jax.grad`` differentiates the source w.r.t. the fault parameters.

    :arg params: dict with keys depth (m), length (m), width (m),
        strike/dip/rake (degrees), slip (m), lat, lon (fault centroid)
    :arg lon, lat: arrays of evaluation coordinates (degrees)
    """
    d2r = DEG2RAD
    sd, cd = jnp.sin(params["dip"] * d2r), jnp.cos(params["dip"] * d2r)
    ss, cs = jnp.sin(params["strike"] * d2r), jnp.cos(params["strike"] * d2r)
    half_len = 0.5 * params["length"]

    # bottom-centre of the fault plane (ref okada.py:74-76)
    lon_bot = params["lon"] - 0.5 * (
        -params["width"] * cd * cs / jnp.cos(params["lat"] * d2r)
    ) / (R_EARTH * d2r)
    lat_bot = params["lat"] - 0.5 * (params["width"] * cd * ss) / (R_EARTH * d2r)
    z_bot = params["depth"] + 0.5 * params["width"] * sd

    # local metric coordinates relative to the bottom-centre
    xx = R_EARTH * d2r * jnp.cos(lat * d2r) * (lon - lon_bot)
    yy = R_EARTH * d2r * (lat - lat_bot)
    # rotate into the strike-dip frame
    x1 = xx * ss + yy * cs
    x2 = -(xx * cs - yy * ss)
    p = x2 * cd + z_bot * sd
    q = x2 * sd - z_bot * cd

    def uz_strike(y1, y2):
        db = y2 * sd - q * cd
        r = jnp.sqrt(y1 * y1 + y2 * y2 + q * q)
        i4 = 2.0 * POISSON * (jnp.log(r + db) - sd * jnp.log(r + y2)) / cd
        return -(db * q / (r * (r + y2)) + q * sd / (r + y2) + i4 * sd) / (
            2.0 * jnp.pi)

    def uz_dip(y1, y2):
        db = y2 * sd - q * cd
        r = jnp.sqrt(y1 * y1 + y2 * y2 + q * q)
        xr = jnp.sqrt(y1 * y1 + q * q)
        i5 = (4.0 * POISSON / cd) * jnp.arctan(
            (y2 * (xr + q * cd) + xr * (r + xr) * sd) / (y1 * (r + xr) * cd))
        return -(db * q / (r * (r + y1))
                 + sd * jnp.arctan(y1 * y2 / (q * r)) - i5 * sd * cd) / (
            2.0 * jnp.pi)

    def chinnery(f):
        return (f(x1 + half_len, p) - f(x1 + half_len, p - params["width"])
                - f(x1 - half_len, p) + f(x1 - half_len, p - params["width"]))

    u_strike = chinnery(uz_strike) * params["slip"] * jnp.cos(
        params["rake"] * d2r)
    u_dip = chinnery(uz_dip) * params["slip"] * jnp.sin(params["rake"] * d2r)
    return u_strike + u_dip


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
    assert J1 < 0.25 * J0, (J0, J1)
    assert abs(slip - TRUE_SLIP) < abs(GUESS_SLIP - TRUE_SLIP), slip
    assert abs(depth_km - TRUE_DEPTH / 1e3) < abs(
        GUESS_DEPTH / 1e3 - TRUE_DEPTH / 1e3), depth_km
