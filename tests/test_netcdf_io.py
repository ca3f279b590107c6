"""netCDF reading layer (ref ``interpolation.py:243-306, 424-867``):
NetCDF-3 (scipy) and NetCDF-4/HDF5 (h5py) files, CF variable lookup,
time-axis parsing, file-tree time search and time-series interpolation —
all driven by synthetic files written in the test."""
import datetime

import numpy as np
import pytest

from thetis_tpu.utils.netcdf_io import (
    NCFile, get_ncvar_name, NetCDFTimeParser, NetCDFTimeSearch,
    NetCDFTimeSeriesInterpolator, parse_time_units,
)
from thetis_tpu.utils.timezone import FixedTimeZone, datetime_to_epoch


def write_nc3(path, tvals, units, fields):
    from scipy.io import netcdf_file

    with netcdf_file(str(path), "w") as f:
        f.createDimension("time", len(tvals))
        tv = f.createVariable("time", "d", ("time",))
        tv[:] = np.asarray(tvals, dtype=float)
        tv._attributes["units"] = units.encode()
        tv._attributes["calendar"] = b"gregorian"
        for name, (vals, attrs) in fields.items():
            v = f.createVariable(name, "d", ("time",))
            v[:] = np.asarray(vals, dtype=float)
            for k, a in attrs.items():
                v._attributes[k] = a.encode() if isinstance(a, str) else a


def write_nc4(path, tvals, units, fields):
    import h5py

    with h5py.File(str(path), "w") as f:
        tv = f.create_dataset("time", data=np.asarray(tvals, dtype=float))
        tv.attrs["units"] = units
        for name, (vals, attrs) in fields.items():
            v = f.create_dataset(name, data=np.asarray(vals, dtype=float))
            for k, a in attrs.items():
                v.attrs[k] = a


def test_parse_time_units():
    s, e0 = parse_time_units("seconds since 1970-01-01 00:00:00")
    assert s == 1.0 and e0 == 0.0
    s, e0 = parse_time_units("hours since 2000-01-01")
    assert s == 3600.0
    ref = datetime_to_epoch(datetime.datetime(
        2000, 1, 1, tzinfo=FixedTimeZone(0, "UTC")))
    assert e0 == ref
    # timezone offset
    s, e1 = parse_time_units("days since 2000-01-01 00:00:00-05:00")
    assert e1 == ref + 5 * 3600.0


@pytest.mark.parametrize("writer", [write_nc3, write_nc4])
def test_ncfile_and_varname(tmp_path, writer):
    p = tmp_path / "f.nc"
    writer(p, [0.0, 1.0], "hours since 2020-01-01", {
        "elev": ([1.0, 2.0], {"standard_name": "sea_surface_elevation"}),
        "speed": ([3.0, 4.0], {"long_name": "Flow Speed"}),
    })
    with NCFile(str(p)) as d:
        assert get_ncvar_name(
            d, standard_name="sea_surface_elevation") == "elev"
        assert get_ncvar_name(d, long_name="flow speed",
                              standard_name="nope") == "speed"
        assert get_ncvar_name(d, var_name="elev",
                              standard_name="nope") == "elev"
        np.testing.assert_allclose(d.variables["elev"][:], [1.0, 2.0])
        with pytest.raises(ValueError):
            get_ncvar_name(d, standard_name="missing")


def test_time_parser_and_search(tmp_path):
    units = "seconds since 2020-01-01 00:00:00"
    base = datetime_to_epoch(datetime.datetime(
        2020, 1, 1, tzinfo=FixedTimeZone(0, "UTC")))
    write_nc3(tmp_path / "a_000.nc", [0.0, 600.0, 1200.0], units,
              {"v": ([0.0, 1.0, 2.0], {})})
    write_nc3(tmp_path / "a_001.nc", [1800.0, 2400.0], units,
              {"v": ([3.0, 4.0], {})})
    tp = NetCDFTimeParser(str(tmp_path / "a_000.nc"))
    assert tp.time_array[0] == base
    assert tp.time_step == 600.0
    # reference semantics (interpolation.py:575-586): next stamp strictly
    # after t (within tolerance); previous=True gives the stamp at/before
    assert tp.find_time_stamp(base + 600.0) == 2
    assert tp.find_time_stamp(base + 650.0, previous=True) == 1

    init = datetime.datetime(2020, 1, 1, tzinfo=FixedTimeZone(0, "UTC"))
    ts = NetCDFTimeSearch(str(tmp_path / "a_*.nc"), init_date=init)
    fn, idx, t = ts.find(1200.0, previous=True)
    assert fn.endswith("a_000.nc") and idx == 2 and t == 1200.0
    fn, idx, t = ts.find(1300.0, previous=False)
    assert fn.endswith("a_001.nc") and idx == 0 and t == 1800.0


def test_timeseries_interpolator(tmp_path):
    units = "seconds since 2020-01-01"
    write_nc3(tmp_path / "s_000.nc", [0.0, 100.0, 200.0], units,
              {"flux": ([0.0, 10.0, 20.0], {})})
    init = datetime.datetime(2020, 1, 1, tzinfo=FixedTimeZone(0, "UTC"))
    itp = NetCDFTimeSeriesInterpolator(
        str(tmp_path / "s_*.nc"), ["flux"], init, scalars=[2.0])
    np.testing.assert_allclose(itp(50.0), 10.0)   # 5.0 * 2
    np.testing.assert_allclose(itp(150.0), 30.0)  # 15.0 * 2
