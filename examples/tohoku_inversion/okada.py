"""Okada (1985) half-space surface deformation, differentiable jnp
(port of ref ``examples/tohoku_inversion/okada.py``; same published
formulas — BSSA 75(4), 1135-1154 — written directly over jnp dof arrays
so ``jax.grad`` differentiates the source w.r.t. the fault parameters).
"""
import math

import jax  # noqa: F401
import jax.numpy as jnp

__all__ = ["okada_elevation", "okada_uz_multi", "lonlat_to_xy",
           "xy_to_lonlat", "EPICENTRE", "R_EARTH", "DEG2RAD", "POISSON"]

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




def okada_uz_multi(params_list, slips, lon, lat):
    """Summed vertical displacement of a subfault array: the shared
    geometry comes from ``params_list`` (host dicts), the per-subfault
    ``slips`` are the (differentiable) controls."""
    out = 0.0
    for k, P in enumerate(params_list):
        p = dict(P, slip=slips[k])
        out = out + okada_elevation(p, lon, lat)
    return out
