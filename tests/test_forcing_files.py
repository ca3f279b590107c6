"""File-driven forcing (ref ``forcing.py:82-275, 951-1143``): TPXO-format
tidal boundary forcing and netCDF atmospheric forcing, driven by synthetic
files written in the test; plus the tidal-prediction astronomy."""
import datetime

import numpy as np
import pytest

from thetis_tpu.utils.timezone import FixedTimeZone
from thetis_tpu.utils.tides import (
    Tides, CONSTITUENT_SPEEDS, nodal_corrections,
)

UTC = FixedTimeZone(0, "UTC")


def test_constituent_speeds():
    """Angular speeds match the published Schureman values (deg/hr)."""
    assert CONSTITUENT_SPEEDS["M2"] == pytest.approx(28.9841042)
    assert CONSTITUENT_SPEEDS["K1"] == pytest.approx(15.0410686)
    # M2 period 12.4206 h
    assert 360.0 / CONSTITUENT_SPEEDS["M2"] == pytest.approx(12.4206, abs=1e-3)


def test_nodal_corrections_ranges():
    for N in np.linspace(0, 360, 13):
        for c in ("M2", "S2", "K1", "O1", "K2"):
            f, u = nodal_corrections(c, N)
            assert 0.7 < f < 1.4
            assert abs(u) < 25.0
    # S2 and P1 are solar: no nodal modulation
    assert nodal_corrections("S2", 123.0) == (1.0, 0.0)
    assert nodal_corrections("P1", 45.0) == (1.0, 0.0)


def test_tides_prediction_consistency():
    """A single M2 constituent with amplitude A and phase g produces a
    pure cosine with the M2 frequency and amplitude f*A."""
    tide = Tides(["M2"])
    tide.set_initial_time(datetime.datetime(2024, 3, 1, tzinfo=UTC))
    A, g = 1.5, 0.7
    period = 3600.0 * 360.0 / CONSTITUENT_SPEEDS["M2"]
    ts = np.linspace(0.0, period, 200)
    eta = np.array([tide.from_amplitude_phase([A], [g], t) for t in ts])
    f, _ = nodal_corrections("M2", 0)  # just range sanity
    assert abs(eta).max() == pytest.approx(tide.f[0] * A, rel=1e-3)
    # periodicity
    assert tide.from_amplitude_phase([A], [g], 0.0) == pytest.approx(
        tide.from_amplitude_phase([A], [g], period), abs=1e-6 * A)
    # complex convention: hRe = A cos(g), hIm = -A sin(g) is equivalent
    h_re, h_im = A * np.cos(g), -A * np.sin(g)
    for t in (0.0, 5000.0, 40000.0):
        assert tide.from_complex([h_re], [h_im], t) == pytest.approx(
            tide.from_amplitude_phase([A], [g], t), abs=1e-9)


def write_tpxo_file(path, lon_ax, lat_ax, names, h_re, h_im):
    from scipy.io import netcdf_file

    nc, nx, ny = h_re.shape
    with netcdf_file(str(path), "w") as f:
        f.createDimension("nc", nc)
        f.createDimension("nct", 4)
        f.createDimension("nx", nx)
        f.createDimension("ny", ny)
        con = f.createVariable("con", "c", ("nc", "nct"))
        for i, n in enumerate(names):
            con[i, :] = np.frombuffer(
                n.ljust(4).encode(), dtype="S1")
        lz = f.createVariable("lon_z", "d", ("nx",))
        lz[:] = lon_ax
        la = f.createVariable("lat_z", "d", ("ny",))
        la[:] = lat_ax
        hr = f.createVariable("hRe", "d", ("nc", "nx", "ny"))
        hr[:] = h_re
        hi = f.createVariable("hIm", "d", ("nc", "nx", "ny"))
        hi[:] = h_im


def test_tpxo_tidal_boundary_forcing(tmp_path):
    from thetis_tpu.model.forcing import TPXOTidalBoundaryForcing

    lon_ax = np.linspace(0.0, 10.0, 11)
    lat_ax = np.linspace(50.0, 60.0, 11)
    # M2: hRe varies linearly with lon; S2 constant
    LON, LAT = np.meshgrid(lon_ax, lat_ax, indexing="ij")
    h_re = np.stack([0.1 * LON, np.full_like(LON, 0.3)])
    h_im = np.stack([np.zeros_like(LON), np.full_like(LON, 0.1)])
    write_tpxo_file(tmp_path / "h_test.nc", lon_ax, lat_ax,
                    ["m2", "s2"], h_re, h_im)

    latlon = np.array([[55.0, 2.0], [55.0, 8.0]])
    init = datetime.datetime(2024, 3, 1, tzinfo=UTC)
    tbnd = TPXOTidalBoundaryForcing(
        latlon, init, data_dir=str(tmp_path), elev_file="h_test.nc")
    assert tbnd.constituents == ["M2", "S2"]
    # interpolated constituent data
    np.testing.assert_allclose(tbnd.h_re[:, 0], [0.2, 0.8], atol=1e-12)
    np.testing.assert_allclose(tbnd.h_re[:, 1], 0.3, atol=1e-12)
    # signal matches a manual synthesis
    tide = Tides(["M2", "S2"])
    tide.set_initial_time(init)
    for t in (0.0, 3600.0, 7200.0):
        eta = tbnd.set_tidal_field(t)
        ref = np.array([
            tide.from_complex(tbnd.h_re[i], tbnd.h_im[i], t)
            for i in range(2)
        ])
        np.testing.assert_allclose(eta, ref, atol=1e-12)
    # constituent subset selection
    tbnd_m2 = TPXOTidalBoundaryForcing(
        latlon, init, constituents=["M2"],
        data_dir=str(tmp_path), elev_file="h_test.nc")
    assert tbnd_m2.constituents == ["M2"]


def write_atm_file(path, tvals, lon_ax, lat_ax, u, v, p):
    from scipy.io import netcdf_file

    with netcdf_file(str(path), "w") as f:
        f.createDimension("time", len(tvals))
        f.createDimension("lon", len(lon_ax))
        f.createDimension("lat", len(lat_ax))
        tv = f.createVariable("time", "d", ("time",))
        tv[:] = tvals
        tv._attributes["units"] = b"seconds since 2024-03-01 00:00:00"
        lo = f.createVariable("lon", "d", ("lon",))
        lo[:] = lon_ax
        la = f.createVariable("lat", "d", ("lat",))
        la[:] = lat_ax
        for name, arr in (("u10", u), ("v10", v), ("msl", p)):
            vv = f.createVariable(name, "d", ("time", "lat", "lon"))
            vv[:] = arr


def test_atm_netcdf_interpolator(tmp_path):
    from thetis_tpu.model.forcing import (
        ATMNetCDFInterpolator, compute_wind_stress,
    )

    lon_ax = np.linspace(0.0, 4.0, 5)
    lat_ax = np.linspace(50.0, 54.0, 5)
    shape = (2, 5, 5)
    u = np.zeros(shape)
    u[0] = 10.0
    u[1] = 20.0
    v = np.zeros(shape)
    p = np.full(shape, 101325.0)
    write_atm_file(tmp_path / "wind_000.nc", [0.0, 3600.0],
                   lon_ax, lat_ax, u, v, p)

    target = np.array([[1.0, 51.0], [3.0, 53.0]])  # (lon, lat)
    init = datetime.datetime(2024, 3, 1, tzinfo=UTC)
    atm = ATMNetCDFInterpolator(target, str(tmp_path / "wind_*.nc"), init)
    out = atm.set_fields(1800.0)  # halfway: u = 15
    tau_x, tau_y = compute_wind_stress(15.0, 0.0)
    np.testing.assert_allclose(out["wind_stress"][:, 0], tau_x, rtol=1e-6)
    np.testing.assert_allclose(out["wind_stress"][:, 1], 0.0, atol=1e-12)
    np.testing.assert_allclose(out["atmospheric_pressure"], 101325.0)


def write_fes_file(path, lat_ax, lon_ax, names, amp_cm, pha_deg):
    from scipy.io import netcdf_file

    nc, nlat, nlon = amp_cm.shape
    with netcdf_file(str(path), "w") as f:
        f.createDimension("nc", nc)
        f.createDimension("nct", 4)
        f.createDimension("lat", nlat)
        f.createDimension("lon", nlon)
        con = f.createVariable("spectrum", "c", ("nc", "nct"))
        for i, n in enumerate(names):
            con[i, :] = np.frombuffer(n.ljust(4).encode(), dtype="S1")
        f.createVariable("lat", "d", ("lat",))[:] = lat_ax
        f.createVariable("lon", "d", ("lon",))[:] = lon_ax
        f.createVariable("Ha", "d", ("nc", "lat", "lon"))[:] = amp_cm
        f.createVariable("Hg", "d", ("nc", "lat", "lon"))[:] = pha_deg


def test_fes2004_tidal_boundary_forcing(tmp_path):
    from thetis_tpu.model.forcing import FES2004TidalBoundaryForcing

    lat_ax = np.linspace(50.0, 60.0, 11)
    lon_ax = np.linspace(0.0, 10.0, 11)
    LAT, LON = np.meshgrid(lat_ax, lon_ax, indexing="ij")
    amp = np.stack([100.0 + 10.0 * LAT / 60.0])   # cm
    pha = np.stack([30.0 + 0.0 * LAT])            # deg
    write_fes_file(tmp_path / "tide.fes2004.nc", lat_ax, lon_ax,
                   ["m2"], amp, pha)
    init = datetime.datetime(2024, 3, 1, tzinfo=UTC)
    latlon = np.array([[55.0, 5.0]])
    tbnd = FES2004TidalBoundaryForcing(
        latlon, init, data_dir=str(tmp_path))
    assert tbnd.constituents == ["M2"]
    np.testing.assert_allclose(
        tbnd.amplitudes[0, 0], (100.0 + 10.0 * 55.0 / 60.0) * 0.01,
        rtol=1e-12)
    np.testing.assert_allclose(tbnd.phases[0, 0], np.deg2rad(30.0),
                               rtol=1e-9)
    tide = Tides(["M2"])
    tide.set_initial_time(init)
    for t in (0.0, 4000.0):
        ref = tide.from_amplitude_phase(
            tbnd.amplitudes[0], tbnd.phases[0], t)
        np.testing.assert_allclose(tbnd.set_tidal_field(t)[0], ref,
                                   atol=1e-12)


def test_generic_2d_and_ocean_3d_interpolators(tmp_path):
    from scipy.io import netcdf_file
    from thetis_tpu.model.forcing import (
        GenericNetCDFInterpolator2D, Ocean3DInterpolator,
    )

    lon_ax = np.linspace(0.0, 4.0, 5)
    lat_ax = np.linspace(50.0, 54.0, 5)
    z_ax = np.array([0.0, 10.0, 50.0])
    with netcdf_file(str(tmp_path / "ocean_000.nc"), "w") as f:
        f.createDimension("time", 2)
        f.createDimension("lon", 5)
        f.createDimension("lat", 5)
        f.createDimension("depth", 3)
        tv = f.createVariable("time", "d", ("time",))
        tv[:] = [0.0, 3600.0]
        tv._attributes["units"] = b"seconds since 2024-03-01"
        f.createVariable("lon", "d", ("lon",))[:] = lon_ax
        f.createVariable("lat", "d", ("lat",))[:] = lat_ax
        f.createVariable("depth", "d", ("depth",))[:] = z_ax
        s = f.createVariable("salinity", "d", ("time", "depth", "lat", "lon"))
        # S = 30 + z/10 (constant in time and horizontally)
        s[:] = 30.0 + z_ax[None, :, None, None] / 10.0 + np.zeros((2, 3, 5, 5))
        sst = f.createVariable("sst", "d", ("time", "lat", "lon"))
        sst[:] = np.array([10.0, 20.0])[:, None, None] + np.zeros((2, 5, 5))

    init = datetime.datetime(2024, 3, 1, tzinfo=UTC)
    target = np.array([[1.0, 51.0], [3.0, 53.0]])  # (lon, lat)

    g2 = GenericNetCDFInterpolator2D(
        target, str(tmp_path / "ocean_*.nc"), init, ["sst"])
    out = g2.set_fields(1800.0)
    np.testing.assert_allclose(out["sst"], 15.0, rtol=1e-9)

    o3 = Ocean3DInterpolator(
        target, str(tmp_path / "ocean_*.nc"), init, ["salinity"])
    vals = o3.set_fields(0.0, z_nodes=np.array([-5.0, -30.0]))
    np.testing.assert_allclose(vals["salinity"], [30.5, 33.0], rtol=1e-9)
