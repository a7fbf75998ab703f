"""Codec tests: round-trip, cross-validation against scipy's independent
NetCDF-3 implementation, in-place update, and append-by-rewrite."""

import numpy as np
import pytest
from scipy.io import netcdf_file

from nk_ocn_tracer_jacobian_precond_tpu.io import netcdf3


def _sample(tmp_path, version=2):
    path = str(tmp_path / "t.nc")
    rng = np.random.default_rng(0)
    z = rng.standard_normal(5)
    tlong = rng.standard_normal((4, 6))
    kmt = rng.integers(0, 5, size=(4, 6)).astype(np.int32)
    netcdf3.write(
        path,
        dims=[("nlon", 6), ("nlat", 4), ("z_t", 5)],
        variables=[
            ("z_t", ("z_t",), {"long_name": "depth", "units": "centimeters"}, z),
            ("TLONG", ("nlat", "nlon"), {"units": "degrees_east"}, tlong),
            ("KMT", ("nlat", "nlon"), {"_FillValue": np.int32(-1)}, kmt),
        ],
        version=version,
    )
    return path, z, tlong, kmt


@pytest.mark.parametrize("version", [1, 2])
def test_roundtrip(tmp_path, version):
    path, z, tlong, kmt = _sample(tmp_path, version)
    hdr = netcdf3.read_header(path)
    assert hdr.version == version
    assert [d[0] for d in hdr.dims] == ["nlon", "nlat", "z_t"]
    assert hdr.var_order == ["z_t", "TLONG", "KMT"]
    np.testing.assert_array_equal(netcdf3.read_var(path, "z_t"), z)
    np.testing.assert_array_equal(netcdf3.read_var(path, "TLONG"), tlong)
    np.testing.assert_array_equal(netcdf3.read_var(path, "KMT"), kmt)
    assert netcdf3.get_att(path, "z_t", "units") == "centimeters"
    assert netcdf3.get_att(path, "KMT", "_FillValue") == -1


def test_scipy_can_read_ours(tmp_path):
    path, z, tlong, kmt = _sample(tmp_path, version=2)
    with netcdf_file(path, "r", mmap=False) as f:
        np.testing.assert_array_equal(f.variables["z_t"][:], z)
        np.testing.assert_array_equal(f.variables["TLONG"][:], tlong)
        np.testing.assert_array_equal(f.variables["KMT"][:], kmt)
        assert f.variables["z_t"].units == b"centimeters"


def test_we_can_read_scipy(tmp_path):
    path = str(tmp_path / "s.nc")
    rng = np.random.default_rng(1)
    data = rng.standard_normal((3, 4, 5))
    with netcdf_file(path, "w") as f:
        f.createDimension("time", None)
        f.createDimension("y", 4)
        f.createDimension("x", 5)
        v = f.createVariable("UVEL", "f8", ("time", "y", "x"))
        v[:] = data
        v._FillValue = 9.96921e36
        w = f.createVariable("flat", "i4", ("x",))
        w[:] = np.arange(5, dtype=np.int32)
    hdr = netcdf3.read_header(path)
    assert hdr.vars["UVEL"].is_record
    np.testing.assert_allclose(netcdf3.read_var(path, "UVEL"), data)
    np.testing.assert_array_equal(netcdf3.read_var(path, "flat"), np.arange(5))
    assert netcdf3.get_att(path, "UVEL", "_FillValue") == pytest.approx(9.96921e36)


def test_inplace_update(tmp_path):
    path, z, tlong, kmt = _sample(tmp_path)
    new = tlong * 2 + 1
    netcdf3.write_var_inplace(path, "TLONG", new)
    np.testing.assert_array_equal(netcdf3.read_var(path, "TLONG"), new)
    # neighbors untouched
    np.testing.assert_array_equal(netcdf3.read_var(path, "z_t"), z)
    np.testing.assert_array_equal(netcdf3.read_var(path, "KMT"), kmt)


def test_inplace_update_record_var(tmp_path):
    path = str(tmp_path / "r.nc")
    a = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
    b = np.arange(2 * 4, dtype=np.float64).reshape(2, 4)
    netcdf3.write(
        path,
        dims=[("time", 0), ("y", 3), ("x", 4)],
        variables=[("A", ("time", "y", "x"), {}, a), ("B", ("time", "x"), {}, b)],
    )
    np.testing.assert_array_equal(netcdf3.read_var(path, "A"), a)
    np.testing.assert_array_equal(netcdf3.read_var(path, "B"), b)
    netcdf3.write_var_inplace(path, "A", a + 100)
    np.testing.assert_array_equal(netcdf3.read_var(path, "A"), a + 100)
    np.testing.assert_array_equal(netcdf3.read_var(path, "B"), b)


def test_append_vars(tmp_path):
    path, z, tlong, kmt = _sample(tmp_path)
    nz = np.arange(7, dtype=np.float64)
    netcdf3.append_vars(
        path,
        new_dims=[("nnz", 7)],
        new_vars=[("nzval_row_wise", ("nnz",), {}, nz),
                  ("scalar_var", (), {}, np.int32(3))],
    )
    hdr = netcdf3.read_header(path)
    assert [d[0] for d in hdr.dims] == ["nlon", "nlat", "z_t", "nnz"]
    np.testing.assert_array_equal(netcdf3.read_var(path, "nzval_row_wise"), nz)
    assert netcdf3.read_var(path, "scalar_var") == 3
    np.testing.assert_array_equal(netcdf3.read_var(path, "TLONG"), tlong)
    # scipy still reads the rewritten file
    with netcdf_file(path, "r", mmap=False) as f:
        np.testing.assert_array_equal(f.variables["nzval_row_wise"][:], nz)
