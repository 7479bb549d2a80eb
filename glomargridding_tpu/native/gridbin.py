"""Observation->grid binning: native C fast path + numpy fallback.

``snap_to_grid`` maps raw observation positions to row-major gridbox
indices on a REGULAR grid (the common production case; irregular grids
go through ``grid.map_to_grid``'s searchsorted path). ``bin_mean``
reduces observation values to per-gridbox means — together these are the
host-side hot loop when ingesting millions of raw observations per
month. The C extension (``gridbin.c``) releases the GIL and runs a
single fused pass; build it with ``python setup_native.py build_ext
--inplace`` (the numpy path is used automatically otherwise).
"""

import numpy as np

try:  # pragma: no cover - exercised when the extension is built
    from . import _gridbin as _ext

    _HAVE_NATIVE = True
except ImportError:
    _ext = None
    _HAVE_NATIVE = False


def native_available() -> bool:
    """True when the compiled C extension is loaded."""
    return _HAVE_NATIVE


def snap_to_grid(
    lats,
    lons,
    lat0: float,
    lat_step: float,
    n_lat: int,
    lon0: float,
    lon_step: float,
    n_lon: int,
) -> np.ndarray:
    """Nearest-gridbox C-order index per observation on a regular grid.

    Equivalent to ``find_nearest`` per axis + ``ravel_multi_index`` for a
    regular axis (round((x - x0)/step), clamped to the axis).
    """
    lats = np.ascontiguousarray(lats, dtype=np.float64)
    lons = np.ascontiguousarray(lons, dtype=np.float64)
    if _HAVE_NATIVE:
        raw = _ext.snap_to_grid(
            lats.tobytes(),
            lons.tobytes(),
            float(lat0),
            float(lat_step),
            int(n_lat),
            float(lon0),
            float(lon_step),
            int(n_lon),
        )
        return np.frombuffer(raw, dtype=np.int64)
    i = np.rint((lats - lat0) / lat_step).astype(np.int64)
    j = np.rint((lons - lon0) / lon_step).astype(np.int64)
    np.clip(i, 0, n_lat - 1, out=i)
    np.clip(j, 0, n_lon - 1, out=j)
    return i * n_lon + j


def bin_mean(idx, values, n_boxes: int):
    """(unique_idx, means, counts) per occupied gridbox.

    `idx` are C-order gridbox indices (from ``snap_to_grid``), `values`
    the observation values. Replaces a sort + groupby with one
    scatter-accumulate pass.
    """
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    values = np.ascontiguousarray(values, dtype=np.float64)
    if _HAVE_NATIVE:
        u_raw, m_raw, c_raw = _ext.bin_mean(
            idx.tobytes(), values.tobytes(), int(n_boxes)
        )
        return (
            np.frombuffer(u_raw, dtype=np.int64),
            np.frombuffer(m_raw, dtype=np.float64),
            np.frombuffer(c_raw, dtype=np.int64),
        )
    if idx.size and (idx.min() < 0 or idx.max() >= n_boxes):
        raise ValueError("gridbox index out of range")
    sums = np.bincount(idx, weights=values, minlength=n_boxes)
    counts = np.bincount(idx, minlength=n_boxes)
    occupied = np.nonzero(counts)[0]
    return (
        occupied.astype(np.int64),
        sums[occupied] / counts[occupied],
        counts[occupied].astype(np.int64),
    )
