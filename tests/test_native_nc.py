"""Native classic-netCDF reader (native/ncreader.cc) vs scipy's writer.

Round-trip: write CDF-1/CDF-2 files with scipy.io.netcdf_file, read them
back through the native mmap parser, compare payloads, dims, and
attributes bit-for-bit.  Skips when no toolchain is available.
"""
import numpy as np
import pytest

from seabreeze_param_tpu.io import native_nc

pytestmark = pytest.mark.skipif(not native_nc.available(),
                                reason="native toolchain unavailable")


def _write_file(path, version=1):
    from scipy.io import netcdf_file
    rng = np.random.default_rng(11)
    with netcdf_file(str(path), "w", version=version) as ds:
        ds.createDimension("time", None)           # record dim
        ds.createDimension("lat", 9)
        ds.createDimension("lon", 14)
        ds.createDimension("lev", 3)
        ds.history = "native reader roundtrip"
        t = ds.createVariable("time", "f8", ("time",))
        t.units = "hours since 1987-01-01 00:00"
        lat = ds.createVariable("lat", "f4", ("lat",))
        lat[:] = np.linspace(10.0, -10.0, 9, dtype=np.float32)
        v4 = ds.createVariable("theta", "f4", ("time", "lat", "lon"))
        v4.missing_value = np.float32(2.0e20)
        v8 = ds.createVariable("w", "f8", ("time", "lev", "lat", "lon"))
        vi = ds.createVariable("count", "i4", ("lat", "lon"))
        vs = ds.createVariable("flag", "i2", ("lon",))
        nt = 5
        theta = (280 + rng.standard_normal((nt, 9, 14))).astype(np.float32)
        w = rng.standard_normal((nt, 3, 9, 14))
        cnt = rng.integers(-5, 99, (9, 14)).astype(np.int32)
        flg = rng.integers(-3, 3, 14).astype(np.int16)
        t[:] = np.arange(nt, dtype=np.float64) * 6.0
        v4[:] = theta
        v8[:] = w
        vi[:] = cnt
        vs[:] = flg
    return dict(theta=theta, w=w, count=cnt, flag=flg,
                time=np.arange(nt, dtype=np.float64) * 6.0,
                lat=np.linspace(10.0, -10.0, 9, dtype=np.float32))


@pytest.mark.parametrize("version", [1, 2])
def test_roundtrip_matches_scipy(tmp_path, version):
    path = tmp_path / f"cdf{version}.nc"
    ref = _write_file(path, version=version)
    with native_nc.NativeNCFile(path) as f:
        assert set(ref) <= set(f.variables)
        for name, want in ref.items():
            v = f.variables[name]
            got = v[:]
            assert got.dtype == want.dtype, name
            np.testing.assert_array_equal(got, want, err_msg=name)
        th = f.variables["theta"]
        assert th.dimensions == ("time", "lat", "lon")
        assert th.is_record
        # attributes
        assert th.att("missing_value") == np.float32(2.0e20)
        assert f.variables["time"].att("units").startswith("hours since")
        # record slicing: single record, range, negative index
        np.testing.assert_array_equal(th[2], ref["theta"][2])
        np.testing.assert_array_equal(th[1:4], ref["theta"][1:4])
        np.testing.assert_array_equal(th[-1], ref["theta"][-1])
        np.testing.assert_array_equal(
            f.variables["w"][0:2], ref["w"][0:2])


def test_single_record_var_unpadded(tmp_path):
    """The spec's special case: exactly ONE record variable is written with
    unpadded records — the reader must use the element size, not vsize."""
    from scipy.io import netcdf_file
    path = tmp_path / "single.nc"
    data = np.arange(7 * 3, dtype=np.int16).reshape(7, 3)
    with netcdf_file(str(path), "w") as ds:
        ds.createDimension("t", None)
        ds.createDimension("x", 3)
        v = ds.createVariable("only", "i2", ("t", "x"))
        v[:] = data
    with native_nc.NativeNCFile(path) as f:
        np.testing.assert_array_equal(f.variables["only"][:], data)


def test_non_classic_raises(tmp_path):
    path = tmp_path / "junk.nc"
    path.write_bytes(b"\x89HDF\r\n\x1a\n" + b"0" * 64)
    with pytest.raises(IOError):
        native_nc.NativeNCFile(path)


def test_prefetch_pool(tmp_path):
    paths = []
    for i in range(3):
        p = tmp_path / f"f{i}.nc"
        _write_file(p)
        paths.append(p)
    with native_nc.PrefetchPool(2) as pool:
        pool.prefetch(*paths)
        import time
        for _ in range(100):
            if pool.pending() == 0:
                break
            time.sleep(0.02)
        assert pool.pending() == 0
    # files are still readable and intact after warming
    with native_nc.NativeNCFile(paths[0]) as f:
        assert "theta" in f.variables
