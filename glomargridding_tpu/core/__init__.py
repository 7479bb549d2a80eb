"""Minimal labeled-array containers (xarray-free)."""

from .labeled import Coordinates, DataArray, Dataset, select_bounds

__all__ = ["Coordinates", "DataArray", "Dataset", "select_bounds"]
