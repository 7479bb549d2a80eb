"""Load/save covariance matrices from/to netCDF.

Parity: reference ``interpolation_covariance.py:22-46`` plus a writer for
the precompute-and-persist workflow.
"""

import numpy as np

from ..core.labeled import Coordinates, DataArray, Dataset
from .netcdf import load_array, save_dataset


def load_covariance(
    path: str, cov_var_name: str = "covariance", **kwargs
) -> np.ndarray:
    """Load a covariance matrix from a netCDF file.

    `path` may be a literal filename or a str.format template resolved with
    kwargs, e.g. ``/path/to/covariance_{month:02d}.nc``.
    """
    return np.asarray(load_array(path, cov_var_name, **kwargs).values)


def save_covariance(
    cov: np.ndarray,
    path: str,
    cov_var_name: str = "covariance",
    **kwargs,
) -> None:
    """Persist a covariance matrix to netCDF (indices as coordinates)."""
    cov = np.asarray(cov)
    if kwargs:
        path = path.format(**kwargs)
    n, m = cov.shape
    coords = Coordinates(
        {"index_1": np.arange(n), "index_2": np.arange(m)}
    )
    arr = DataArray(cov, coords, name=cov_var_name)
    save_dataset(Dataset({cov_var_name: arr}, coords), path)
