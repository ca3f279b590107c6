"""Morphodynamics tests: suspended sediment approaching equilibrium in a
uniform channel flow, and Exner bed evolution with bedload over a bump
(migrating-dune direction check, cf. the reference's
``test/sediment/test_migrating_trench.py`` family)."""
import numpy as np
import pytest
import jax.numpy as jnp

from thetis_tpu import (
    RectangleMesh, FunctionSpace, Function, Constant, solver2d,
    SpatialCoordinate,
)


def sediment_channel(use_exner=False, bump=False, t_end=200.0):
    lx, ly = 160.0, 40.0
    mesh2d = RectangleMesh(16, 4, lx, ly)
    P1 = FunctionSpace(mesh2d, "CG", 1)
    x, y = SpatialCoordinate(mesh2d)
    if bump:
        bath = Function(P1).interpolate(
            4.0 - 0.8 * jnp.exp(-(((x - lx / 2) / 20.0) ** 2))
        )
    else:
        bath = Function(P1).assign(4.0)
    so = solver2d.FlowSolver2d(mesh2d, bath)
    o = so.options
    o.timestep = 2.0
    o.simulation_export_time = t_end
    o.simulation_end_time = t_end
    o.no_exports = True
    o.swe_timestepper_type = "CrankNicolson"
    o.horizontal_viscosity = Constant(0.1)
    o.horizontal_diffusivity = Constant(0.15)
    o.norm_smoother = 0.1
    sed = o.sediment_model_options
    sed.solve_suspended_sediment = True
    sed.use_bedload = use_exner
    sed.use_exner = use_exner
    sed.use_angle_correction = False
    sed.use_secondary_current = False
    sed.average_sediment_size = 1.6e-4
    sed.morphological_viscosity = 1e-6
    sed.bed_reference_height = 0.025
    sed.morphological_acceleration_factor = 10.0 if use_exner else 1.0
    so.bnd_functions["shallow_water"] = {
        1: {"flux": Constant(-40.0)},
        2: {"elev": Constant(0.0)},
    }
    so.bnd_functions["sediment"] = {
        1: {"flux": Constant(-40.0), "equilibrium": None},
        2: {"elev": Constant(0.0)},
    }
    so.assign_initial_conditions(uv=jnp.asarray([0.25, 0.0]), elev=0.0)
    return so


def test_suspended_sediment_equilibrium():
    """In uniform flow, suspended sediment must relax toward the model's
    equilibrium concentration (erosion balances deposition)."""
    so = sediment_channel(t_end=400.0)
    so.iterate()
    asm = so.asm
    uv_q = asm.cell_values(so.fields.uv_2d.data)
    eta_q = asm.cell_values(so.fields.elev_2d.data)
    H_q = so.depth.total_depth(so.eq_sw.bathy_q, eta_q)
    c_eq = so.sediment_model.get_equilibrium_tracer(uv_q, H_q)
    c_q = asm.cell_values(so.fields.sediment_2d.data)
    # compare in the central part of the channel (inflow has not equilibrated)
    xq = np.asarray(asm.cell_values(
        Function(so.function_spaces.Q_2d).interpolate(lambda x, y: x).data
    ))
    mask = (xq > 60.0) & (xq < 120.0)
    rel = np.abs(np.asarray(c_q - c_eq))[mask] / (
        np.abs(np.asarray(c_eq))[mask] + 1e-12
    )
    assert np.isfinite(np.asarray(c_q)).all()
    assert np.asarray(c_q).min() >= -1e-12, "sediment went negative"
    assert np.median(rel) < 0.25, f"median relative gap {np.median(rel)}"


@pytest.mark.slow
def test_exner_bed_evolution():
    """Bedload over a submerged bump: the bed must change, conserve
    sediment volume (closed-ish domain in bedload), and stay finite."""
    so = sediment_channel(use_exner=True, bump=True, t_end=100.0)
    z0 = np.asarray(so.fields.bathymetry_2d.data).copy()
    so.iterate()
    z1 = np.asarray(so.fields.bathymetry_2d.data)
    assert np.isfinite(z1).all()
    dz = z1 - z0
    assert np.abs(dz).max() > 1e-6, "bed did not evolve"
    # bump crest should migrate: erosion on the stoss (upstream) side of
    # the crest and deposition downstream -> signed dz correlates with x
    x = np.asarray(so.mesh2d.coords_np[:, 0])
    crest = (x > 60.0) & (x < 100.0)
    assert np.abs(dz[crest]).max() > np.abs(dz[~crest]).max() * 0.5


@pytest.mark.slow
def test_sediment_slide_relaxes_steep_slope():
    """ExnerSedimentSlideTerm (ref ``exner_eq.py:132-150`` +
    ``sediment_model.py:312-354``): a bed slope steeper than
    ``max_angle`` is diffused back toward the angle of repose; slopes
    below the threshold are untouched (the coefficient vanishes)."""
    lx, ly = 160.0, 40.0

    def run(use_slide):
        mesh2d = RectangleMesh(32, 4, lx, ly)
        P1 = FunctionSpace(mesh2d, "CG", 1)
        x, y = SpatialCoordinate(mesh2d)
        # max |grad zb| ~ 0.51 (27 deg) > tan(15 deg) = 0.27
        bath = Function(P1).interpolate(
            4.0 + 6.0 * jnp.exp(-(((x - lx / 2) / 10.0) ** 2))
        )
        so = solver2d.FlowSolver2d(mesh2d, bath)
        o = so.options
        o.timestep = 2.0
        o.simulation_export_time = 100.0
        o.simulation_end_time = 100.0
        o.no_exports = True
        o.swe_timestepper_type = "CrankNicolson"
        o.horizontal_viscosity = Constant(0.1)
        o.norm_smoother = 0.1
        sed = o.sediment_model_options
        sed.solve_suspended_sediment = False
        sed.use_bedload = False
        sed.use_exner = True
        sed.use_sediment_slide = use_slide
        sed.max_angle = 15.0
        sed.sed_slide_length_scale = 5.0
        sed.average_sediment_size = 1.6e-4
        sed.morphological_viscosity = 1e-6
        so.assign_initial_conditions(uv=jnp.asarray([0.0, 0.0]), elev=0.0)
        so.iterate()
        zb = so.fields.bathymetry_2d.data
        asm = so.asm
        gz = np.asarray(asm.cell_grads(jnp.asarray(zb)[mesh2d.cells]))
        return float(np.sqrt((gz**2).sum(-1)).max())

    slope_off = run(False)
    slope_on = run(True)
    tanphi = np.tan(np.radians(15.0))
    assert slope_off > 0.4, slope_off  # steep initial bump preserved
    assert slope_on < slope_off - 0.05, (slope_on, slope_off)
    assert slope_on > 0.9 * tanphi  # relaxes toward, not past, the limit


def test_sediment_slide_inactive_below_max_angle():
    """Gentle slopes produce an exactly-zero slide coefficient."""
    from types import SimpleNamespace
    from thetis_tpu.model.sediment_model import SedimentModel

    mesh2d = RectangleMesh(8, 4, 160.0, 40.0)
    so = solver2d.FlowSolver2d(mesh2d, Function(
        FunctionSpace(mesh2d, "CG", 1)).assign(4.0))
    o = so.options
    o.timestep = 2.0
    sed = o.sediment_model_options
    sed.max_angle = 32.0
    sed.sed_slide_length_scale = 5.0
    sed.average_sediment_size = 1.6e-4
    sed.morphological_viscosity = 1e-6
    m = SedimentModel(o, mesh2d)
    gz = jnp.full((mesh2d.nc, 4, 2), 0.1)  # 5.7 deg << 32 deg
    alpha = m.get_sediment_slide_term(gz)
    assert float(jnp.abs(alpha).max()) == 0.0
