"""Run every example script under THETIS_REGRESSION_TEST (the reference's
``test/examples/test_examples.py`` pattern: scripts shorten themselves when
the env flag is set)."""
import pytest as _pytest

#: long-running integration tier: run with `pytest -m slow`
pytestmark = _pytest.mark.slow

import glob
import os
import runpy

import pytest

EXAMPLES = sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), "..", "examples", "*", "*.py")
))


@pytest.mark.parametrize("script", EXAMPLES,
                         ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_runs(script, monkeypatch):
    monkeypatch.setenv("THETIS_REGRESSION_TEST", "1")
    runpy.run_path(script, run_name="__main__")


def test_columbia_plume_file_driven_forcing(tmp_path, monkeypatch):
    """The columbia_plume example's FILE-DRIVEN branches (NCOM initial
    T/S + ERA5-format wind stress, ref ``cre-plume.py``'s data chain)
    run end-to-end against generated real-format archives."""
    import sys
    import numpy as np
    import datetime
    from thetis_tpu.utils.timezone import FixedTimeZone
    sys.path.insert(0, os.path.dirname(__file__))

    # NCOM archive covering the UTM-10 shelf domain (lon ~ -125..-123,
    # lat ~ 45..47)
    from scipy.io import netcdf_file
    base = tmp_path
    ncom = base / "ncom"
    ncom.mkdir()
    nlat_g, nlon_g, nz = 8, 8, 4
    lat_g = np.linspace(44.0, 48.0, nlat_g)
    lon_g = np.linspace(-127.0, -121.0, nlon_g)
    LON, LAT = np.meshgrid(lon_g, lat_g)
    with netcdf_file(str(ncom / "model_lat.nc"), "w") as f:
        f.createDimension("Y", nlat_g); f.createDimension("X", nlon_g)
        f.createVariable("Lat", "d", ("Y", "X"))[:] = LAT
    with netcdf_file(str(ncom / "model_lon.nc"), "w") as f:
        f.createDimension("Y", nlat_g); f.createDimension("X", nlon_g)
        f.createVariable("Long", "d", ("Y", "X"))[:] = LON
    z_levels = np.array([-1.0, -50.0, -200.0, -2000.0])
    with netcdf_file(str(ncom / "model_zm.nc"), "w") as f:
        f.createDimension("Z", nz)
        f.createDimension("Y", nlat_g); f.createDimension("X", nlon_g)
        f.createVariable("zm", "d", ("Z", "Y", "X"))[:] = np.broadcast_to(
            z_levels[:, None, None], (nz, nlat_g, nlon_g)).copy()
    for day in (1, 2, 3):
        for fieldstr, var, val in (("s3d", "Salinity", 33.5),
                                   ("t3d", "Temperature", 12.0)):
            d = ncom / "2006" / fieldstr
            d.mkdir(parents=True, exist_ok=True)
            fn = d / f"{fieldstr}.glb8_2f_200605{day:02d}00.nc"
            with netcdf_file(str(fn), "w") as f:
                f.createDimension("X", nlon_g)
                f.createDimension("Y", nlat_g)
                f.createDimension("Z", nz)
                f.createVariable("X_Index", "d", ("X",))[:] = \
                    np.arange(nlon_g)
                f.createVariable("Y_Index", "d", ("Y",))[:] = \
                    np.arange(nlat_g)
                v = f.createVariable(var, "d", ("Z", "Y", "X"))
                v[:] = np.full((nz, nlat_g, nlon_g), val)

    # ERA5-format wind files over the same window
    atm = base / "atm"
    atm.mkdir()
    lon_w = np.linspace(-127.0, -121.0, 5)
    lat_w = np.linspace(48.0, 44.0, 5)  # descending, as ERA5 ships
    with netcdf_file(str(atm / "wind_000.nc"), "w") as f:
        f.createDimension("valid_time", 2)
        f.createDimension("longitude", 5)
        f.createDimension("latitude", 5)
        tv = f.createVariable("valid_time", "d", ("valid_time",))
        tv[:] = [0.0, 7 * 86400.0]
        tv._attributes["units"] = b"seconds since 2006-05-01 00:00:00"
        f.createVariable("longitude", "d", ("longitude",))[:] = lon_w
        f.createVariable("latitude", "d", ("latitude",))[:] = lat_w
        for name, val in (("u10", 8.0), ("v10", 0.0), ("msl", 101325.0)):
            vv = f.createVariable(
                name, "d", ("valid_time", "latitude", "longitude"))
            vv[:] = np.full((2, 5, 5), val)

    monkeypatch.setenv("THETIS_REGRESSION_TEST", "1")
    monkeypatch.setenv("CRE_FORCING_DIR", str(base))
    monkeypatch.setenv("CRE_INIT_DATE", "2006-05-01")
    script = os.path.join(os.path.dirname(__file__), "..", "examples",
                          "columbia_plume", "cre_plume.py")
    ns = runpy.run_path(script, run_name="__main__")
    assert ns["USE_NCOM"] and ns["USE_ATM"], "file branches not taken"
    # NCOM-provided ocean salinity (33.5) reached the initial state
    assert abs(float(np.asarray(ns["salt0"]).max()) - 33.5) < 0.6
