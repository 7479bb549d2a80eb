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


def save_lowrank(psd, path: str, **kwargs) -> None:
    """Persist a factored (clipped) covariance ``LowRankPSD`` to netCDF.

    The 1-degree production artifact is the FACTORED repaired
    covariance (diag(floor) + V diag(gains) V', ~n r floats), not the
    n x n matrix — this writer/loader pair extends the reference's
    precompute-and-persist idiom (`interpolation_covariance.py:22-46`)
    to it. `path` may be a str.format template resolved with kwargs.
    """
    if kwargs:
        path = path.format(**kwargs)
    V = np.asarray(psd.vectors)
    g = np.asarray(psd.gains)
    f = np.asarray(psd.floor)
    n, r = V.shape
    coords = Coordinates({"index": np.arange(n), "mode": np.arange(r)})
    ds = Dataset(
        {
            "vectors": DataArray(V, coords, name="vectors"),
            "gains": DataArray(
                g, Coordinates({"mode": np.arange(r)}), name="gains"
            ),
            "floor": DataArray(
                f, Coordinates({"index": np.arange(n)}), name="floor"
            ),
        },
        coords,
    )
    save_dataset(ds, path)


def load_lowrank(path: str, **kwargs):
    """Load a ``LowRankPSD`` persisted by :func:`save_lowrank`."""
    import jax.numpy as jnp

    from ..ops.covariance_tools import LowRankPSD

    return LowRankPSD(
        vectors=jnp.asarray(load_array(path, "vectors", **kwargs).values),
        gains=jnp.asarray(load_array(path, "gains", **kwargs).values),
        floor=jnp.asarray(load_array(path, "floor", **kwargs).values),
    )
