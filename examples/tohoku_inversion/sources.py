"""Tsunami source parameterisations (port of ref
``examples/tohoku_inversion/sources.py``): each source exposes

    controls()        initial control vector
    control_bounds()  (lb, ub) per control
    mapping(c)        differentiable map control -> initial elevation
                      dof array (the pyadjoint-tape analogue: jax.grad
                      flows through the source model)

``FiniteElementTsunamiSource`` (ref ``sources.py:98-168``): the control
IS the elevation field restricted to a box around the fault (masked P1
dofs, box bounds on the uplift).

``OkadaArraySource`` (ref ``sources.py:170-400`` 'okada' mode): an
nx-by-ny array of Okada (1985) subfaults sharing the fault-plane
geometry; the controls are the per-subfault slips (optionally rakes),
summed through the differentiable half-space model of ``okada.py``.
"""
import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["FiniteElementTsunamiSource", "OkadaArraySource"]


class FiniteElementTsunamiSource:
    """Control = masked elevation dofs in a [lon/lat] box around the
    fault; dofs outside are pinned to zero (ref ``sources.py:98-168``).

    :arg dof_lonlat: (n, 2) (lon, lat) of the elevation dofs
    :arg box: (lon_min, lon_max, lat_min, lat_max) source region
    :kwarg bound: uplift bound (m); controls live in [-bound, bound]
    """

    def __init__(self, dof_lonlat, box, bound=10.0, initial_guess=None):
        lon, lat = dof_lonlat[:, 0], dof_lonlat[:, 1]
        self.mask = ((lon >= box[0]) & (lon <= box[1])
                     & (lat >= box[2]) & (lat <= box[3]))
        self.idx = jnp.asarray(np.nonzero(self.mask)[0])
        self.n_dofs = len(dof_lonlat)
        self.bound = float(bound)
        self._c0 = (jnp.zeros(int(self.mask.sum()))
                    if initial_guess is None else jnp.asarray(initial_guess))

    def controls(self):
        return self._c0

    def control_bounds(self):
        n = self._c0.shape[0]
        return [(-self.bound, self.bound)] * n

    def mapping(self, c):
        out = jnp.zeros((self.n_dofs,), dtype=c.dtype)
        return out.at[self.idx].set(c)


class OkadaArraySource:
    """Array of Okada subfaults with shared plane geometry; controls are
    the subfault slips (ref ``sources.py`` 'okada' mode, subfault
    arrays of ``ArrayTsunamiSource``).

    :arg dof_lonlat: (n, 2) (lon, lat) of the elevation dofs
    :arg fault: dict with the shared parameters (depth, dip, strike,
        rake, lat, lon of the fault centroid, and the TOTAL fault
        length/width)
    :arg nx, ny: subfault array dimensions (along strike / dip)
    :kwarg slip0: initial slip guess per subfault
    :kwarg slip_bound: bounds [0, slip_bound] on each slip control
    """

    def __init__(self, dof_lonlat, fault, nx=3, ny=2, slip0=5.0,
                 slip_bound=60.0):
        from okada import okada_uz_multi

        self.nx, self.ny = int(nx), int(ny)
        n_sub = self.nx * self.ny
        self.slip_bound = float(slip_bound)
        self._c0 = jnp.full((n_sub,), float(slip0))
        lon = jnp.asarray(dof_lonlat[:, 0])
        lat = jnp.asarray(dof_lonlat[:, 1])

        # subfault centroids on the strike-dip plane: offsets along
        # strike (length) and dip (width) from the fault centroid
        L, W = float(fault["length"]), float(fault["width"])
        l_sub, w_sub = L / self.nx, W / self.ny
        s = np.deg2rad(float(fault["strike"]))
        d = np.deg2rad(float(fault["dip"]))
        # unit vectors (lon, lat) per metre along strike and dip
        earth_r = 6367.5e3
        m2deg = 180.0 / np.pi / earth_r
        coslat = np.cos(np.deg2rad(float(fault["lat"])))
        e_strike = np.array([np.sin(s) / coslat, np.cos(s)]) * m2deg
        e_dip = np.array([np.cos(s) / coslat, -np.sin(s)]) * m2deg * np.cos(d)
        offs_l = (np.arange(self.nx) - (self.nx - 1) / 2.0) * l_sub
        offs_w = (np.arange(self.ny) - (self.ny - 1) / 2.0) * w_sub
        params = []
        for i in range(self.nx):
            for j in range(self.ny):
                dlon, dlat = offs_l[i] * e_strike + offs_w[j] * e_dip
                params.append(dict(
                    depth=float(fault["depth"]) + offs_w[j] * np.sin(d),
                    length=l_sub, width=w_sub,
                    strike=float(fault["strike"]),
                    dip=float(fault["dip"]), rake=float(fault["rake"]),
                    lat=float(fault["lat"]) + dlat,
                    lon=float(fault["lon"]) + dlon,
                ))
        self._params = params

        def mapping(slips):
            return okada_uz_multi(params, slips, lon, lat)

        self._mapping = mapping

    def controls(self):
        return self._c0

    def control_bounds(self):
        return [(0.0, self.slip_bound)] * (self.nx * self.ny)

    def mapping(self, c):
        return self._mapping(c)
