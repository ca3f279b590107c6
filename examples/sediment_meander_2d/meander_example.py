# Meander morphodynamics (Yen & Lee 1995 experiment 4)
# ====================================================
#
# Port of the reference's ``examples/sediment_meander_2d`` (Clare et al.
# 2020): flow around a 180-degree channel bend with bedload transport
# and secondary-current + slope corrections; the point-bar/pool pattern
# (inner-bank deposition, outer-bank erosion) develops around the bend.
# The curved mesh is generated procedurally (the reference ships
# ``meander.msh`` of the same geometry: 1 m wide channel, centreline
# radius 4 m around (5, 2.5), straight 2.5 m arms).
import os

import numpy as np
import jax.numpy as jnp

from thetis_tpu import *
from thetis_tpu.mesh.mesh2d import Mesh2d

# --- procedurally generated meander mesh ------------------------------
W = 1.0          # channel width
R = 4.0          # centreline radius
ARM = 2.5        # straight arm length
CX, CY = 5.0, 2.5

n_t = 5                       # cells across the channel
ds = W / n_t                  # ~isotropic resolution
n_arm = int(round(ARM / ds))
n_bend = int(round(np.pi * R / ds))
if os.environ.get("THETIS_REGRESSION_TEST"):
    n_t, n_arm, n_bend = 4, 6, 32


def channel_coords(s, t):
    """(arclength s from inlet along centreline, transverse t in
    [-W/2, W/2]) -> (x, y); t > 0 points toward the OUTER bank."""
    s = np.asarray(s, float)
    t = np.asarray(t, float)
    x = np.empty_like(s)
    y = np.empty_like(s)
    s1 = ARM
    s2 = ARM + np.pi * R
    # inlet arm: goes up at x = CX - R
    m = s <= s1
    x[m] = CX - R - t[m]
    y[m] = s[m]
    # bend: angle from 180 deg to 0 deg around (CX, CY)
    m = (s > s1) & (s <= s2)
    th = np.pi - (s[m] - s1) / R
    rr = R + t[m]
    x[m] = CX + rr * np.cos(th)
    y[m] = CY + rr * np.sin(th)
    # outlet arm: goes down at x = CX + R
    m = s > s2
    x[m] = CX + R + t[m]
    y[m] = CY - (s[m] - s2)
    return x, y


ns = n_arm + n_bend + n_arm
s_1d = np.concatenate([
    np.linspace(0.0, ARM, n_arm + 1)[:-1],
    np.linspace(ARM, ARM + np.pi * R, n_bend + 1)[:-1],
    np.linspace(ARM + np.pi * R, ARM + np.pi * R + ARM, n_arm + 1),
])
t_1d = np.linspace(-W / 2, W / 2, n_t + 1)
S, T = np.meshgrid(s_1d, t_1d, indexing="ij")
X, Y = channel_coords(S.ravel(), T.ravel())
coords = np.stack([X, Y], axis=1)


def vid(i, j):
    return i * (n_t + 1) + j

i, j = np.meshgrid(np.arange(ns), np.arange(n_t), indexing="ij")
i, j = i.ravel(), j.ravel()
tri1 = np.stack([vid(i, j), vid(i + 1, j), vid(i + 1, j + 1)], axis=1)
tri2 = np.stack([vid(i, j), vid(i + 1, j + 1), vid(i, j + 1)], axis=1)
cells = np.concatenate([tri1, tri2], axis=0)

s_max = s_1d[-1]


def markers(mid):
    m = np.zeros(len(mid), dtype=np.int32)
    m[np.abs(mid[:, 1]) < 1e-6] = 0  # default land
    # inlet: y ~ 0 on the left arm; outlet: y ~ 0 on the right arm
    m[(mid[:, 1] < 1e-6) & (mid[:, 0] < CX)] = 1
    m[(mid[:, 1] < 1e-6) & (mid[:, 0] > CX)] = 2
    return m


mesh2d = Mesh2d(coords, cells, boundary_markers=markers, name="meander")

# --- bathymetry: constant along-channel slope (ref meander_setup.py) --
gradient = 0.0035
s_vertex = np.empty(mesh2d.nv)
# invert the map: recover s from the structured layout
s_vertex = S.ravel()
V = FunctionSpace(mesh2d, "CG", 1)
bathymetry_2d = Function(V, name="bathymetry_2d")
bathymetry_2d.data = jnp.asarray(-9.97072 - gradient * (s_max / 2 - s_vertex))

average_size = 1e-3
morfac = 50
end_time = 5 * 3600.0
hydro_t_end = 200.0
if os.environ.get("THETIS_REGRESSION_TEST"):
    end_time = 1800.0
    hydro_t_end = 25.0

# --- phase 1: hydrodynamic spinup (ref meander_hydro.py) ---------------
elev_init_const = float(-np.asarray(bathymetry_2d.data).max() + 0.05436)

hydro = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
o = hydro.options
o.timestep = 1.0
o.simulation_export_time = hydro_t_end
o.simulation_end_time = hydro_t_end
o.no_exports = True
o.swe_timestepper_type = "CrankNicolson"
o.swe_timestepper_options.implicitness_theta = 1.0
o.horizontal_viscosity = Constant(5e-2)
o.nikuradse_bed_roughness = Constant(3 * average_size)
o.norm_smoother = Constant(0.1)
hydro.bnd_functions["shallow_water"] = {
    1: {"flux": Constant(-0.02)},
    2: {"elev": Constant(elev_init_const)},
}
hydro.assign_initial_conditions(uv=jnp.asarray([1e-3, 1e-3]),
                                elev=Constant(elev_init_const))

if __name__ == "__main__":
    hydro.iterate()

    # --- phase 2: morphodynamics (ref meander_example.py) --------------
    so = solver2d.FlowSolver2d(mesh2d, bathymetry_2d)
    options = so.options
    sed = options.sediment_model_options
    sed.solve_suspended_sediment = False
    sed.use_bedload = True
    sed.use_exner = True
    sed.use_angle_correction = True
    sed.use_slope_mag_correction = True
    sed.use_secondary_current = True
    sed.average_sediment_size = average_size
    sed.bed_reference_height = 0.003
    sed.morphological_acceleration_factor = morfac
    options.simulation_end_time = end_time / morfac
    options.simulation_export_time = options.simulation_end_time / 5
    options.no_exports = True
    options.nikuradse_bed_roughness = Constant(3 * average_size)
    options.horizontal_viscosity = Constant(5e-2)
    options.swe_timestepper_type = "CrankNicolson"
    options.swe_timestepper_options.implicitness_theta = 1.0
    options.norm_smoother = Constant(0.1)
    options.timestep = 1.0

    flux_c = Constant(-0.02)
    elev_c = Constant(elev_init_const + 0.04414 + 9.97072
                      - (-np.asarray(bathymetry_2d.data).max()))
    # ref bnd ramp (meander_example.py:24-33), simplified to the first leg
    gradient_flux = (-0.053 + 0.02) / 6000
    gradient_elev = (10.04414 - 9.9955) / 6000

    def update_forcings(t_new):
        tm = t_new * morfac
        if tm <= 6000:
            elev_c.assign(gradient_elev * tm + elev_init_const)
            flux_c.assign(gradient_flux * tm - 0.02)

    so.bnd_functions["shallow_water"] = {
        1: {"flux": flux_c},
        2: {"elev": elev_c},
    }
    so.assign_initial_conditions(uv=hydro.fields.uv_2d.data,
                                 elev=hydro.fields.elev_2d.data)
    zb0 = np.asarray(bathymetry_2d.data).copy()
    so.iterate(update_forcings=update_forcings)

    zb = np.asarray(so.fields.bathymetry_2d.data)
    dz = zb - zb0
    assert np.isfinite(zb).all()
    assert np.abs(dz).max() > 1e-6, "bed did not evolve"
    assert np.abs(dz).max() < 0.06, "bed evolution exploded"
    # meander morphology: around the bend the outer bank scours
    # (bathymetry grows) relative to the inner bank
    in_bend = (S.ravel() > ARM) & (S.ravel() < ARM + np.pi * R)
    outer = in_bend & (T.ravel() > 0.2)
    inner = in_bend & (T.ravel() < -0.2)
    assert dz[outer].mean() > dz[inner].mean(), (
        dz[outer].mean(), dz[inner].mean())
