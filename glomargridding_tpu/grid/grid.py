"""Grid construction and observation->grid alignment (host side).

Capability parity with reference ``grid.py``: regular lat/lon grid build,
snapping observations to nearest grid points with row-major 1-d ``grid_idx``
(numpy "C" ravel order — the index convention every solver consumes),
scattering results back onto the grid, and grid -> pairwise-distance-matrix
construction. Frames are pandas; grids are the light ``core.labeled``
containers (xarray accepted via duck-typing).
"""

from typing import Any, Callable, Iterable

import numpy as np
import pandas as pd

from ..core.labeled import Coordinates, DataArray, select_bounds
from ..ops.distances import (
    calculate_distance_matrix,
    haversine_distance_from_frame,
)
from ..utils.arrays import find_nearest
from ..utils.frames import filter_bounds


def grid_from_resolution(
    resolution: float | list[float],
    bounds: list[tuple[float, float]],
    coord_names: list[str],
) -> DataArray:
    """Build a regular grid from per-coordinate resolutions and bounds.

    Bounds are ``(first_centre, open_upper)`` as in ``range`` — e.g. a
    global 5-degree grid: ``bounds=[(-87.5, 90), (-177.5, 180)]``.
    (Parity: reference ``grid.py:127-195``.)
    """
    if not isinstance(resolution, Iterable):
        resolution = [resolution] * len(bounds)
    if len(resolution) != len(coord_names) or len(bounds) != len(coord_names):
        raise ValueError("Input lists must have the same length")
    coords = Coordinates(
        {
            name: np.arange(lo, hi, res)
            for name, (lo, hi), res in zip(coord_names, bounds, resolution)
        }
    )
    return DataArray(coords=coords)


def map_to_grid(
    obs: pd.DataFrame,
    grid,
    obs_coords: list[str] = ["lat", "lon"],
    grid_coords: list[str] = ["latitude", "longitude"],
    sort: bool = True,
    bounds: list[tuple[float, float]] | None = None,
    add_grid_pts: bool = True,
    grid_prefix: str = "grid_",
) -> pd.DataFrame:
    """Align observations to a grid: nearest gridpoint per obs + 1-d index.

    Adds ``{grid_prefix}idx`` (row-major C-order raveled index) and,
    optionally, the snapped grid coordinates per observation; sorts by
    grid index so downstream gridbox reductions see contiguous groups.
    (Parity: reference ``grid.py:28-124``.)
    """
    if bounds is not None:
        grid = select_bounds(grid, bounds, grid_coords)
        obs = filter_bounds(obs, bounds, obs_coords)

    grid_size = grid.shape

    dim_idx: list[np.ndarray] = []
    snapped: list[np.ndarray] = []
    for grid_coord, obs_coord in zip(grid_coords, obs_coords):
        grid_pos = np.asarray(grid.coords[grid_coord])
        idx, vals = find_nearest(grid_pos, obs[obs_coord].to_numpy())
        dim_idx.append(idx)
        snapped.append(vals)

    flattened_idx = np.ravel_multi_index(dim_idx, grid_size, order="C")

    obs = obs.copy()
    obs[grid_prefix + "idx"] = flattened_idx
    if add_grid_pts:
        for vals, obs_coord in zip(snapped, obs_coords):
            obs[grid_prefix + obs_coord] = vals

    if sort:
        obs = obs.sort_values(
            grid_prefix + "idx", kind="stable"
        ).reset_index(drop=True)
    return obs


def aggregate_observations(
    lats,
    lons,
    values,
    grid,
    lat_coord: str | None = None,
    lon_coord: str | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fast raw-obs ingest for REGULAR grids: snap + per-box mean.

    One fused native pass (C extension when built, numpy otherwise) maps
    millions of raw observations to gridboxes and reduces them to one
    averaged value per occupied box — the (idx, obs) pair the kriging
    solvers consume. Returns (unique_idx, means, counts).

    For irregular grids or when per-record frames are needed (error
    covariance grouping), use ``map_to_grid`` + ``get_weights``.
    """
    from ..native import bin_mean, snap_to_grid

    names = list(grid.coords.keys())
    lat_coord = lat_coord or names[0]
    lon_coord = lon_coord or names[1]
    glat = np.asarray(grid.coords[lat_coord], dtype=float)
    glon = np.asarray(grid.coords[lon_coord], dtype=float)
    for name, axis in ((lat_coord, glat), (lon_coord, glon)):
        steps = np.diff(axis)
        if len(steps) and not np.allclose(steps, steps[0]):
            raise ValueError(
                f"grid axis '{name}' is not regular; use map_to_grid"
            )
    lat_step = float(glat[1] - glat[0]) if len(glat) > 1 else 1.0
    lon_step = float(glon[1] - glon[0]) if len(glon) > 1 else 1.0
    idx = snap_to_grid(
        np.asarray(lats, dtype=float),
        np.asarray(lons, dtype=float),
        float(glat[0]),
        lat_step,
        len(glat),
        float(glon[0]),
        lon_step,
        len(glon),
    )
    return bin_mean(idx, np.asarray(values, dtype=float), grid.size)


def assign_to_grid(
    values: np.ndarray,
    grid_idx: np.ndarray,
    grid,
    fill_value: Any = np.nan,
) -> DataArray:
    """Scatter a result vector onto the grid by 1-d C-order index.

    (Parity: reference ``grid.py:198-230``.)
    """
    values = np.asarray(values)
    out = np.full(grid.shape, fill_value=fill_value, dtype=values.dtype)
    coords_to_assign = np.unravel_index(np.asarray(grid_idx), grid.shape, "C")
    out[coords_to_assign] = values
    coords = grid.coords
    if not isinstance(coords, Coordinates):
        coords = Coordinates({k: np.asarray(v) for k, v in coords.items()})
    return DataArray(out, coords)


def cross_coords(coords, lat_coord: str, lon_coord: str) -> Coordinates:
    """Cross-product coordinate system for a distance matrix.

    Produces index_1/index_2 plus per-index lat/lon coordinate vectors
    (row-major over the grid). (Parity: reference ``grid.py:323-406``.)
    """
    if hasattr(coords, "coords") and not isinstance(coords, Coordinates):
        coords = coords.coords
    keys = list(coords.keys())
    if len(keys) != 2:
        raise ValueError(
            "Input grid must have 2 indexes - "
            "specifying latitude and longitude, in decimal degree."
        )
    if lat_coord not in keys:
        raise KeyError(
            f"Cannot find latitude coordinate {lat_coord} in the grid."
        )
    if lon_coord not in keys:
        raise KeyError(
            f"Cannot find longitude coordinate {lon_coord} in the grid."
        )
    first, second = keys
    a = np.asarray(coords[first])
    b = np.asarray(coords[second])
    # Row-major cross product in grid dimension order.
    aa = np.repeat(a, len(b))
    bb = np.tile(b, len(a))
    n = len(aa)
    per_dim = {first: aa, second: bb}
    out: dict[str, np.ndarray] = {
        "index_1": np.arange(n),
        "index_2": np.arange(n),
    }
    for i in (1, 2):
        for name in keys:
            out[f"{name}_{i}"] = per_dim[name]
    return Coordinates(out)


def grid_to_distance_matrix(
    grid,
    dist_func: Callable = haversine_distance_from_frame,
    lat_coord: str = "lat",
    lon_coord: str = "lon",
    **dist_kwargs,
) -> DataArray:
    """Pairwise distance matrix between all grid positions.

    Returns a DataArray over (index_1, index_2) with the crossed lat/lon
    kept as auxiliary coordinates. (Parity: reference ``grid.py:233-320``.)
    """
    out_coords = cross_coords(grid.coords, lat_coord, lon_coord)
    frame = pd.DataFrame(
        {
            lat_coord: np.asarray(out_coords[f"{lat_coord}_1"]),
            lon_coord: np.asarray(out_coords[f"{lon_coord}_1"]),
        }
    )
    dist = calculate_distance_matrix(
        frame,
        dist_func=dist_func,
        lat_col=lat_coord,
        lon_col=lon_coord,
        **dist_kwargs,
    )
    n = dist.shape[0]
    main = Coordinates(
        {"index_1": np.arange(n), "index_2": np.arange(n)}
    )
    arr = DataArray(np.asarray(dist), main, name="dist")
    # Keep crossed coordinates available for consumers.
    arr.attrs["crossed_coords"] = {
        k: np.asarray(v)
        for k, v in out_coords.items()
        if k not in ("index_1", "index_2")
    }
    return arr
