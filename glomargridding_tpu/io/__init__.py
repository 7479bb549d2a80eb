"""I/O: h5py-backed netCDF4, format-string paths, config recursion."""

from ..utils.frames import get_recurse
from .covariance import (
    load_covariance,
    load_lowrank,
    save_covariance,
    save_lowrank,
)
from .netcdf import (
    load_array,
    load_dataset,
    open_dataset,
    save_dataset,
    add_empty_layers,
)

__all__ = [
    "add_empty_layers",
    "get_recurse",
    "load_array",
    "load_covariance",
    "load_lowrank",
    "load_dataset",
    "open_dataset",
    "save_covariance",
    "save_lowrank",
    "save_dataset",
]
