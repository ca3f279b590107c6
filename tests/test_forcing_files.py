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


# ===================== concrete data-source adapters =====================
# (ref ``forcing.py:82-783``: ERA5, TCHazards, NCOM, LiveOcean/ROMS)

def _write_era5_file(path, tvals, lon_ax, lat_ax, u, v, p,
                     time_name="valid_time"):
    from scipy.io import netcdf_file

    with netcdf_file(str(path), "w") as f:
        f.createDimension(time_name, len(tvals))
        f.createDimension("longitude", len(lon_ax))
        f.createDimension("latitude", len(lat_ax))
        tv = f.createVariable(time_name, "d", (time_name,))
        tv[:] = tvals
        tv._attributes["units"] = b"seconds since 2024-03-01 00:00:00"
        f.createVariable("longitude", "d", ("longitude",))[:] = lon_ax
        f.createVariable("latitude", "d", ("latitude",))[:] = lat_ax
        for name, arr in (("u10", u), ("v10", v), ("msl", p)):
            vv = f.createVariable(
                name, "d", (time_name, "latitude", "longitude"))
            vv[:] = arr


def test_era5_interpolator(tmp_path):
    """ERA5 conventions: 'valid_time' axis, DESCENDING latitude,
    longitude/latitude axis names, msl in Pa (ref forcing.py:172-190)."""
    from thetis_tpu.model.forcing_adapters import ERA5Interpolator
    from thetis_tpu.model.forcing import compute_wind_stress
    from thetis_tpu.fem.functionspace import Function, FunctionSpace
    from thetis_tpu import RectangleMesh

    lon_ax = np.linspace(0.0, 4.0, 5)
    lat_ax = np.linspace(54.0, 50.0, 5)  # descending, as ERA5 ships
    shape = (2, 5, 5)
    u = np.zeros(shape); u[0] = 5.0; u[1] = 15.0
    v = np.zeros(shape)
    p = np.full(shape, 101000.0)
    _write_era5_file(tmp_path / "era5_000.nc", [0.0, 3600.0],
                     lon_ax, lat_ax, u, v, p)

    target = np.array([[1.0, 51.0], [3.0, 53.0]])  # (lon, lat)
    init = datetime.datetime(2024, 3, 1, tzinfo=UTC)
    era = ERA5Interpolator(target, str(tmp_path / "era5_*.nc"), init,
                           lon_name="longitude", lat_name="latitude")
    out = era.set_fields(1800.0)  # halfway: u = 10
    tau_x, _ = compute_wind_stress(10.0, 0.0)
    np.testing.assert_allclose(out["wind_stress"][:, 0], tau_x, rtol=1e-6)
    np.testing.assert_allclose(out["atmospheric_pressure"], 101000.0)

    # Function targets are updated in place
    mesh = RectangleMesh(2, 1, 1.0, 1.0)
    P1 = FunctionSpace(mesh, "CG", 1)
    npts = mesh.nv
    tgt = np.column_stack([np.linspace(1, 3, npts),
                           np.linspace(51, 53, npts)])
    wind = Function(P1, data=np.zeros((npts, 2)), name="wind")
    pres = Function(P1, data=np.zeros((npts,)), name="pres")
    era2 = ERA5Interpolator(tgt, str(tmp_path / "era5_*.nc"), init,
                            lon_name="longitude", lat_name="latitude",
                            wind_stress_field=wind,
                            atm_pressure_field=pres)
    era2.set_fields(0.0)
    tau0, _ = compute_wind_stress(5.0, 0.0)
    np.testing.assert_allclose(np.asarray(wind.data)[:, 0], tau0,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pres.data), 101000.0)


def test_tchazards_interpolator(tmp_path):
    """TCHazaRds files: Uw/Vw/Pr names, pressure in hPa
    (ref forcing.py:191-215)."""
    from scipy.io import netcdf_file
    from thetis_tpu.model.forcing_adapters import TCHazardsInterpolator

    lon_ax = np.linspace(0.0, 4.0, 5)
    lat_ax = np.linspace(50.0, 54.0, 5)
    with netcdf_file(str(tmp_path / "tc_000.nc"), "w") as f:
        f.createDimension("time", 2)
        f.createDimension("lon", 5)
        f.createDimension("lat", 5)
        tv = f.createVariable("time", "d", ("time",))
        tv[:] = [0.0, 3600.0]
        tv._attributes["units"] = b"seconds since 2024-03-01 00:00:00"
        f.createVariable("lon", "d", ("lon",))[:] = lon_ax
        f.createVariable("lat", "d", ("lat",))[:] = lat_ax
        for name, val in (("Uw", 8.0), ("Vw", 0.0), ("Pr", 1010.0)):
            vv = f.createVariable(name, "d", ("time", "lat", "lon"))
            vv[:] = np.full((2, 5, 5), val)

    init = datetime.datetime(2024, 3, 1, tzinfo=UTC)
    target = np.array([[2.0, 52.0]])
    tc = TCHazardsInterpolator(target, str(tmp_path / "tc_*.nc"), init)
    out = tc.set_fields(600.0)
    # hPa -> Pa
    np.testing.assert_allclose(out["atmospheric_pressure"], 101000.0)
    assert out["wind_stress"][0, 0] > 0


def _write_ncom_fixture(base):
    """Generate an NCOM-format file tree: grid side files + daily
    s3d/t3d/ssh files (ref forcing.py:526-560 file list)."""
    from scipy.io import netcdf_file

    nlat_g, nlon_g, nz = 8, 10, 4
    lat_g = np.linspace(49.0, 56.0, nlat_g)
    lon_g = np.linspace(-2.0, 7.0, nlon_g)
    LON, LAT = np.meshgrid(lon_g, lat_g)
    with netcdf_file(str(base / "model_lat.nc"), "w") as f:
        f.createDimension("Y", nlat_g); f.createDimension("X", nlon_g)
        f.createVariable("Lat", "d", ("Y", "X"))[:] = LAT
    with netcdf_file(str(base / "model_lon.nc"), "w") as f:
        f.createDimension("Y", nlat_g); f.createDimension("X", nlon_g)
        f.createVariable("Long", "d", ("Y", "X"))[:] = LON
    z_levels = np.array([-1.0, -20.0, -100.0, -500.0])
    with netcdf_file(str(base / "model_zm.nc"), "w") as f:
        f.createDimension("Z", nz)
        f.createDimension("Y", nlat_g); f.createDimension("X", nlon_g)
        zm = f.createVariable("zm", "d", ("Z", "Y", "X"))
        zm[:] = np.broadcast_to(z_levels[:, None, None],
                                (nz, nlat_g, nlon_g)).copy()

    x_ind = np.arange(nlon_g); y_ind = np.arange(nlat_g)

    def write_field(day, fieldstr, varname, value_fn):
        d = base / "2024" / fieldstr
        d.mkdir(parents=True, exist_ok=True)
        fn = d / f"{fieldstr}.glb8_2f_202403{day:02d}00.nc"
        with netcdf_file(str(fn), "w") as f:
            f.createDimension("X", nlon_g); f.createDimension("Y", nlat_g)
            f.createDimension("Z", nz)
            f.createVariable("X_Index", "d", ("X",))[:] = x_ind
            f.createVariable("Y_Index", "d", ("Y",))[:] = y_ind
            if fieldstr == "ssh":
                v = f.createVariable(varname, "d", ("Y", "X"))
                v[:] = value_fn(LAT, LON, None)
            else:
                v = f.createVariable(varname, "d", ("Z", "Y", "X"))
                Z = np.broadcast_to(z_levels[:, None, None],
                                    (nz, nlat_g, nlon_g))
                v[:] = value_fn(LAT[None], LON[None], Z)

    for day in (1, 2):
        fac = float(day)
        write_field(day, "s3d", "Salinity",
                    lambda lat, lon, z, fac=fac: 30.0 - z / 100.0 + 0 * lat)
        write_field(day, "t3d", "Temperature",
                    lambda lat, lon, z, fac=fac: 10.0 * fac + 0 * lat + 0 * z)
        write_field(day, "ssh", "Surface_Elevation",
                    lambda lat, lon, z, fac=fac: 0.1 * fac + 0 * lat)
    return base


def test_ncom_interpolator(tmp_path):
    """NCOM daily-file forcing: grid side files, X/Y_Index subsetting,
    3D salinity/temperature + 2D ssh, linear time interpolation between
    daily files (ref forcing.py:526-754)."""
    from thetis_tpu.model.forcing_adapters import NCOMInterpolator

    base = _write_ncom_fixture(tmp_path)
    init = datetime.datetime(2024, 3, 1, tzinfo=UTC)
    # 3D targets: (lat, lon, z)
    tgt3 = np.array([[52.0, 2.0, -10.0], [53.0, 3.0, -60.0]])
    tgt2 = np.array([[52.0, 2.0], [53.0, 3.0]])
    ncom = NCOMInterpolator(
        tgt3, tgt2, fields={"Salinity": None, "Temperature": None,
                            "Surface_Elevation": None},
        field_fnstr={"Salinity": "s3d", "Temperature": "t3d",
                     "Surface_Elevation": "ssh"},
        basedir=str(base),
        file_pattern="{year:04d}/{fieldstr:}/{fieldstr:}.glb8_2f_"
                     "{year:04d}{month:02d}{day:02d}00.nc",
        init_date=init)
    out = ncom.set_fields(0.0)
    # S = 30 - z/100 (the surface level is nudged to z=+1.5 exactly as
    # the reference does, forcing.py:425 — shifts the shallow point ~1e-2)
    np.testing.assert_allclose(out["Salinity"], [30.1, 30.6], atol=0.02)
    np.testing.assert_allclose(out["Surface_Elevation"], 0.1, rtol=1e-9)
    # halfway between day 1 (T=10) and day 2 (T=20)
    out_mid = ncom.set_fields(12 * 3600.0)
    np.testing.assert_allclose(out_mid["Temperature"], 15.0, rtol=1e-6)


def test_liveocean_interpolator(tmp_path):
    """LiveOcean/ROMS forcing: rho-grid coordinates, mask_rho land mask,
    s-coordinate vertical reconstruction, 'ocean_time' axis
    (ref forcing.py:620-783)."""
    from scipy.io import netcdf_file
    from thetis_tpu.model.forcing_adapters import LiveOceanInterpolator

    neta, nxi, nz = 8, 10, 5
    lat_g = np.linspace(49.0, 56.0, neta)
    lon_g = np.linspace(-2.0, 7.0, nxi)
    LON, LAT = np.meshgrid(lon_g, lat_g)
    h = np.full((neta, nxi), 200.0)
    mask = np.ones((neta, nxi))
    mask[0, 0] = 0.0  # one land point
    s_w = np.linspace(-1.0, 0.0, nz + 1)
    cs_w = s_w.copy()  # linear stretching

    for i, (tval, sal) in enumerate(((0.0, 30.0), (43200.0, 32.0))):
        with netcdf_file(str(tmp_path / f"ocean_{i:03d}.nc"), "w") as f:
            f.createDimension("ocean_time", 1)
            f.createDimension("eta_rho", neta)
            f.createDimension("xi_rho", nxi)
            f.createDimension("s_rho", nz)
            f.createDimension("s_wdim", nz + 1)
            f.createDimension("one", 1)
            tv = f.createVariable("ocean_time", "d", ("ocean_time",))
            tv[:] = [tval]
            tv._attributes["units"] = b"seconds since 2024-03-01 00:00:00"
            f.createVariable("lat_rho", "d", ("eta_rho", "xi_rho"))[:] = LAT
            f.createVariable("lon_rho", "d", ("eta_rho", "xi_rho"))[:] = LON
            f.createVariable("mask_rho", "d", ("eta_rho", "xi_rho"))[:] = mask
            f.createVariable("h", "d", ("eta_rho", "xi_rho"))[:] = h
            f.createVariable("Cs_w", "d", ("s_wdim",))[:] = cs_w
            f.createVariable("s_w", "d", ("s_wdim",))[:] = s_w
            f.createVariable("hc", "d", ("one",))[:] = [10.0]
            f.createVariable("zeta", "d",
                             ("ocean_time", "eta_rho", "xi_rho"))[:] = \
                np.zeros((1, neta, nxi))
            sv = f.createVariable(
                "salt", "d", ("ocean_time", "s_rho", "eta_rho", "xi_rho"))
            # S constant per file (time-interpolation check)
            sv[:] = np.full((1, nz, neta, nxi), sal)

    init = datetime.datetime(2024, 3, 1, tzinfo=UTC)
    tgt3 = np.array([[52.0, 2.0, -10.0], [53.0, 3.0, -100.0]])
    lo = LiveOceanInterpolator(tgt3, {"salt": None},
                               str(tmp_path / "ocean_*.nc"), init)
    out0 = lo.set_fields(0.0)
    np.testing.assert_allclose(out0["salt"], 30.0, rtol=1e-8)
    out_mid = lo.set_fields(21600.0)  # quarter day: 30 + 2*(0.5) = 31
    np.testing.assert_allclose(out_mid["salt"], 31.0, rtol=1e-6)
