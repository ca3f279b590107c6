"""GLS turbulence closure tests: published parameter values for the
stability-function families and a shear-driven column integration
(miniature of the reference's ``test/turbulence`` suite)."""
import numpy as np
import jax.numpy as jnp
import pytest

from thetis_tpu.equations.stability_functions import (
    StabilityFunctionCanutoA,
    StabilityFunctionCanutoB,
    StabilityFunctionCheng,
)
from thetis_tpu.equations.turbulence import (
    GenericLengthScaleModel,
    PacanowskiPhilanderModel,
)


def test_stability_function_parameters():
    """cmu0 and c3_minus against published values (Umlauf & Burchard 2005;
    Warner et al. 2005): Canuto A cmu0 ~ 0.5270, Canuto B ~ 0.5540,
    Cheng ~ 0.5204; k-epsilon c3_minus(Canuto A, Ri_st=0.25) ~ -0.63."""
    sfa = StabilityFunctionCanutoA()
    assert sfa.compute_cmu0() == pytest.approx(0.527, abs=0.01)
    sfb = StabilityFunctionCanutoB()
    assert sfb.compute_cmu0() == pytest.approx(0.554, abs=0.01)
    sfc = StabilityFunctionCheng()
    assert sfc.compute_cmu0() == pytest.approx(0.520, abs=0.01)
    c3 = sfa.compute_c3_minus(1.44, 1.92, 0.25)
    assert -0.9 < c3 < -0.4
    # neutral limit: S_m * alpha_M = 1 at equilibrium
    a_shear = sfa.compute_alpha_shear_steady(1e-8)
    s_m, _ = sfa.eval_funcs(0.0, a_shear)
    assert s_m * a_shear == pytest.approx(1.0, rel=1e-6)


def test_stability_function_limiters():
    sf = StabilityFunctionCanutoA()
    # strongly unstable stratification gets limited, outputs stay finite
    s_m, s_h = sf.evaluate(
        jnp.asarray([1e-4, 1e-2]), jnp.asarray([-1e-2, 1e-4]),
        jnp.asarray([1e-3, 1e-3]), jnp.asarray([1e-6, 1e-6]),
    )
    assert bool(jnp.isfinite(s_m).all()) and bool(jnp.isfinite(s_h).all())
    assert bool((s_m > 0).all()) and bool((s_h > 0).all())


@pytest.fixture(scope="module")
def column():
    from thetis_tpu import RectangleMesh, FunctionSpace, DGAssembler
    from thetis_tpu.mesh.extruded import ExtrudedMesh
    from thetis_tpu.fem.assembly3d import Assembler3D

    mesh = RectangleMesh(2, 2, 100.0, 100.0)
    V = FunctionSpace(mesh, "DG", 1)
    asm = DGAssembler(mesh, V)
    ext = ExtrudedMesh(mesh, n_layers=20)
    a3 = Assembler3D(mesh, asm, ext)
    bathy = jnp.full((mesh.nc, 3), 50.0)
    z = ext.z_interfaces(bathy, jnp.zeros((mesh.nc, 3)))
    geom = a3.layer_geometry(z)
    return mesh, ext, a3, geom


def test_gls_column_spinup(column):
    """Constant shear, neutral stratification: TKE grows from seed,
    viscosity becomes O(kappa u* z)-ish, everything stays positive and
    finite; equilibrium cmu ~ cmu0."""
    mesh, ext, a3, geom = column
    model = GenericLengthScaleModel(a3)
    o = model.options
    shape = (mesh.nc, 3, ext.nz, 2)
    k = jnp.full(shape, o.k_min)
    # seed psi from a sensible initial length scale l0 = 0.3 m
    psi = model.psi_from_k_eps(k, o.cmu0**3 * o.k_min**1.5 / 0.3)
    m2 = jnp.full(shape, 1e-4)  # du/dz = 0.01 /s
    n2 = jnp.zeros(shape)
    Dn = geom["Delta_nodes"]
    dt = 30.0
    nu = jnp.full(shape, o.visc_min)
    import jax

    @jax.jit
    def step(k, psi):
        nu, mu, eps, l = model.eddy_coefficients(k, psi, m2, n2)
        k2, psi2 = model.step_columns(k, psi, m2, n2, nu, mu, Dn, dt)
        return k2, psi2, nu

    for i in range(120):
        k, psi, nu = step(k, psi)
    k_np = np.asarray(k)
    nu_np = np.asarray(nu)
    assert np.isfinite(k_np).all() and np.isfinite(np.asarray(psi)).all()
    assert (k_np > 0).all() and (nu_np > 0).all()
    assert k_np.max() > 100 * o.k_min, "TKE did not grow under shear"
    assert nu_np.max() > 1e-4, "eddy viscosity did not develop"
    # stratified case: the Galperin limiter must cap the length scale at
    # clim*sqrt(2k/N2)
    n2s = jnp.full(shape, 1e-4)
    _, _, eps_s, l_s = model.eddy_coefficients(k, psi, m2, n2s)
    lmax = o.galperin_clim * np.sqrt(2 * np.asarray(k).max() / 1e-4)
    assert float(l_s.max()) <= lmax * 1.01


def test_stratification_suppresses_mixing(column):
    """Stable stratification must reduce the eddy coefficients."""
    mesh, ext, a3, geom = column
    model = GenericLengthScaleModel(a3)
    o = model.options
    shape = (mesh.nc, 3, ext.nz, 2)
    k = jnp.full(shape, 1e-4)
    psi = model.psi_from_k_eps(k, jnp.full(shape, 1e-7))  # noqa
    m2 = jnp.full(shape, 1e-4)
    nu_neutral, mu_neutral, _, _ = model.eddy_coefficients(
        k, psi, m2, jnp.zeros(shape)
    )
    nu_strat, mu_strat, _, _ = model.eddy_coefficients(
        k, psi, m2, jnp.full(shape, 1e-4)
    )
    assert float(mu_strat.mean()) < float(mu_neutral.mean())


def test_pacanowski_philander():
    pp = PacanowskiPhilanderModel()
    nu0, mu0 = pp.eddy_coefficients(jnp.asarray(1e-4), jnp.asarray(0.0))
    nu1, mu1 = pp.eddy_coefficients(jnp.asarray(1e-4), jnp.asarray(1e-4))
    assert float(nu0) == pytest.approx(5e-2, rel=1e-3)
    assert float(nu1) < float(nu0)
    assert float(mu1) < float(mu0)


def test_stability_function_variants():
    """All registered stability-function families produce the published
    cmu0 values (Umlauf & Burchard 2005 Table 4) and finite limited
    evaluations (ref ``stability_functions.py:363-822``)."""
    import numpy as np
    from thetis_tpu.equations.stability_functions import STABILITY_FUNCTIONS

    published_cmu0 = {
        "Canuto A": 0.5270, "Canuto B": 0.5540, "Cheng": 0.5270,
        "Canuto A GOTM": 0.5265, "Canuto B GOTM": 0.5540,
        "Kantha-Clayson": 0.5549, "Cheng GOTM": 0.5270,
    }
    for name, cls in STABILITY_FUNCTIONS.items():
        sf = cls()
        cmu0 = float(sf.compute_cmu0())
        assert abs(cmu0 - published_cmu0[name]) < 2e-3, (name, cmu0)
        c3 = float(sf.compute_c3_minus(1.44, 1.92, 0.25))
        assert -1.5 < c3 < 0.0, (name, c3)
        sm, sh = sf.evaluate(np.asarray(1e-4), np.asarray(-1e-5),
                             np.asarray(1e-5), np.asarray(1e-6))
        assert np.isfinite(float(sm)) and np.isfinite(float(sh))
        assert float(sm) > 0 and float(sh) > 0
