"""netCDF IO tests (h5py-backed reader/writer)."""

import numpy as np
import pytest

from glomargridding_tpu.core.labeled import Coordinates, DataArray, Dataset
from glomargridding_tpu.io import (
    load_array,
    load_covariance,
    load_dataset,
    open_dataset,
    save_covariance,
    save_dataset,
)

from conftest import REFERENCE_DATA, requires_reference_data, reference_data_path


def test_save_load_roundtrip(tmp_path, rng):
    coords = Coordinates(
        {"lat": np.arange(-80.0, 90.0, 20.0), "lon": np.arange(0.0, 360.0, 40.0)}
    )
    data = rng.random(coords.shape)
    ds = Dataset(
        {"sst": DataArray(data, coords, name="sst", attrs={"units": "K"})},
        coords,
        attrs={"title": "test"},
    )
    path = str(tmp_path / "test.nc")
    save_dataset(ds, path)
    back = open_dataset(path)
    np.testing.assert_allclose(back["sst"].values, data)
    assert back["sst"].dims == ("lat", "lon")
    np.testing.assert_allclose(back.coords["lat"], coords["lat"])
    assert back["sst"].attrs["units"] == "K"


def test_format_string_paths(tmp_path):
    save_covariance(np.eye(3), str(tmp_path / "cov_03.nc"))
    out = load_covariance(str(tmp_path / "cov_{month:02d}.nc"), month=3)
    np.testing.assert_allclose(out, np.eye(3))
    with pytest.raises(FileNotFoundError):
        load_dataset(str(tmp_path / "missing_{month:02d}.nc"), month=4)
    with pytest.raises(FileNotFoundError):
        load_dataset(str(tmp_path / "nope.nc"))


@requires_reference_data
def test_read_reference_ellipse_params():
    ds = open_dataset(reference_data_path("Atlantic_Ocean_07.nc"))
    for var in ("lx", "ly", "theta", "standard_deviation", "qc_code"):
        assert var in ds
        assert ds[var].shape == (120, 120)
    assert ds["lx"].dims == ("latitude", "longitude")
    assert len(ds.coords["latitude"]) == 120


@requires_reference_data
def test_read_reference_covariance():
    ds = open_dataset(reference_data_path("cov_no_hfix.nc"))
    cov = ds["covariance"].values
    assert cov.shape[0] == cov.shape[1]
    assert np.isfinite(cov).all()


@requires_reference_data
def test_load_array_from_reference():
    arr = load_array(
        reference_data_path("Atlantic_Ocean_07.nc"), "standard_deviation"
    )
    assert arr.shape == (120, 120)
