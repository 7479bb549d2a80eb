"""Array utilities.

Capability parity with reference ``glomar_gridding/utils.py`` (cited per
function). Implementations here are original and accept either NumPy or JAX
arrays; functions used inside jitted code paths are written in terms of the
array's own namespace so they trace cleanly.
"""

from typing import Any
from warnings import warn

import numpy as np


def _xp(arr):
    """Pick numpy or jax.numpy based on the input array type."""
    if type(arr).__module__.startswith("jax"):
        import jax.numpy as jnp

        return jnp
    return np


def adjust_small_negative(mat, atol: float = 1e-8):
    """Clamp tiny negative values (|x| < atol) to zero.

    Used on squared kriging uncertainties where rounding can produce small
    negative variances. Warns if small negatives were clamped and again if
    genuinely negative values remain (parity: reference ``utils.py:132-175``).
    """
    xp = _xp(mat)
    small_negative = (mat < 0.0) & (xp.abs(mat) < atol)
    if xp is np:
        ret = mat.copy()
        if small_negative.any():
            warn("Small negative vals are detected. Setting to 0.")
            ret[small_negative] = 0.0
        if (ret < 0).any():
            warn("Negative values are detected")
        return ret.astype(mat.dtype)
    # Traced path: branch-free.
    return xp.where(small_negative, xp.zeros_like(mat), mat)


def find_nearest(array, values) -> tuple[np.ndarray, np.ndarray]:
    """Indices and values in `array` nearest to each element of `values`.

    Vectorised O((n+m) log n) replacement for the reference's per-value
    argmin list comprehension (``utils.py:178-214``); exact nearest-value
    semantics are preserved (ties resolve to the lower index for the
    regular ascending grids used throughout).

    Returns
    -------
    idx : numpy.ndarray[int]
        Index into `array` of the nearest element, per value.
    vals : numpy.ndarray
        The corresponding values of `array`.
    """
    array = np.asarray(array)
    values = np.asarray(values)
    order = np.argsort(array, kind="stable")
    sorted_arr = array[order]
    pos = np.searchsorted(sorted_arr, values)
    pos = np.clip(pos, 1, len(sorted_arr) - 1)
    left = sorted_arr[pos - 1]
    right = sorted_arr[pos]
    take_right = np.abs(values - right) < np.abs(values - left)
    nearest_sorted_pos = np.where(take_right, pos, pos - 1)
    # Handle values beyond the ends
    nearest_sorted_pos = np.clip(nearest_sorted_pos, 0, len(sorted_arr) - 1)
    idx = order[nearest_sorted_pos]
    # Tie-break parity with sequential argmin: argmin returns the FIRST
    # minimal index; for exact midpoints between two grid points argmin picks
    # the earlier element. searchsorted + '<' above picks left on ties, which
    # matches ascending grids.
    return idx.astype(np.int64), np.asarray(array)[idx]


def intersect_mtlb(a, b):
    """Matlab-style intersect: sorted common values + index vectors.

    Behaviour parity with reference ``utils.py:246-279`` (indices point
    at the FIRST occurrence of each common value), built directly on
    ``np.intersect1d(return_indices=True)``: deduplicate each input
    keeping first-occurrence indices, intersect the uniques, and map
    the intersect's positions back through those index vectors.
    """
    a = np.asarray(a)
    b = np.asarray(b)
    a1, ia = np.unique(a, return_index=True)
    b1, ib = np.unique(b, return_index=True)
    c, ca, cb = np.intersect1d(a1, b1, assume_unique=True,
                               return_indices=True)
    return c, ia[ca], ib[cb]


def uncompress_masked(
    compressed_array,
    mask,
    fill_value: Any = 0.0,
    apply_mask: bool = False,
    dtype=None,
):
    """Scatter a compressed (unmasked-only) vector back to full length.

    Parity: reference ``utils.py:550-608``. If `apply_mask` is set a
    ``numpy.ma.MaskedArray`` is returned; otherwise masked slots hold
    `fill_value`.
    """
    mask = np.asarray(mask, dtype=bool)
    compressed_array = np.asarray(compressed_array)
    not_mask = ~mask
    if int(not_mask.sum()) != len(compressed_array):
        raise ValueError("Length of compressed_array does not align with mask")
    dtype = dtype or compressed_array.dtype
    uncompressed = np.empty_like(mask, dtype=dtype)
    uncompressed[not_mask] = compressed_array
    if apply_mask:
        return np.ma.masked_where(mask, uncompressed)
    uncompressed[mask] = fill_value
    return uncompressed


def cov_2_cor(cov, rounding: int | None = None):
    """Covariance matrix -> correlation matrix.

    Validates the resulting diagonal is 1 within 1e-6 and repairs rounding
    noise exactly like the reference (``utils.py:637-671``). Keeps zeros at
    zero-covariance entries.
    """
    xp = _xp(cov)
    stdevs = xp.sqrt(xp.diag(cov))
    normalisation = xp.outer(stdevs, stdevs)
    cor = cov / normalisation
    diag = xp.diag(cor)
    if xp is np:
        if not np.all(diag == 1.0):
            bad_val = np.max(np.abs(diag - 1.0))
            if bad_val > 1e-6:
                raise ValueError(
                    "Correlation Diagonal contains values not close to 1. "
                    + f"With difference to 1: {bad_val}"
                )
            np.fill_diagonal(cor, 1.0)
        cor[cov == 0] = 0
        if rounding is not None:
            cor = np.round(cor, rounding)
        return cor
    n = cor.shape[0]
    eye = xp.eye(n, dtype=bool)
    cor = xp.where(eye, xp.ones_like(cor), cor)
    cor = xp.where(cov == 0, xp.zeros_like(cor), cor)
    if rounding is not None:
        cor = xp.round(cor, rounding)
    return cor


def cor_2_cov(cor, variances, rounding: int | None = None):
    """Correlation matrix + variances -> covariance matrix.

    Parity: reference ``utils.py:611-634``.
    """
    xp = _xp(cor)
    stdevs = xp.sqrt(variances)
    normalisation = xp.outer(stdevs, stdevs)
    cov = cor * normalisation
    if xp is np:
        cov[cor == 0] = 0
        if rounding is not None:
            cov = np.round(cov, rounding)
        return cov
    cov = xp.where(cor == 0, xp.zeros_like(cov), cov)
    if rounding is not None:
        cov = xp.round(cov, rounding)
    return cov


def get_spatial_mean(grid_obs, covx) -> float:
    """GLS spatial mean ``(1'C^{-1}1)^{-1} 1'C^{-1}z``.

    Solve-based (no explicit inverse, unlike reference ``utils.py:766-793``).
    """
    xp = _xp(covx)
    if xp is np:
        u = np.linalg.solve(covx, np.ones(len(grid_obs)))
        return float((u @ np.asarray(grid_obs)) / u.sum())
    import jax.scipy.linalg as jsl

    ones = xp.ones((covx.shape[0],), dtype=covx.dtype)
    factor = jsl.cho_factor(covx)
    u = jsl.cho_solve(factor, ones)
    return (u @ grid_obs) / xp.sum(u)


def is_iter(val: Any) -> bool:
    """True if the value is iterable (parity: reference ``utils.py:541``)."""
    try:
        iter(val)
        return True
    except TypeError:
        return False


def sizeof_fmt(num: float, suffix: str = "B") -> str:
    """Human-readable byte count (power-of-1024 units)."""
    for unit in ("", "Ki", "Mi", "Gi", "Ti", "Pi", "Ei", "Zi"):
        if abs(num) < 1024.0:
            return f"{num:3.1f}{unit}{suffix}"
        num /= 1024.0
    return f"{num:.1f}Yi{suffix}"


def mask_array(arr: np.ndarray) -> np.ma.MaskedArray:
    """Coerce a numpy array to a MaskedArray (parity: ``utils.py:674``)."""
    if isinstance(arr, np.ma.MaskedArray):
        return arr
    if isinstance(arr, np.ndarray):
        return np.ma.MaskedArray(arr)
    raise TypeError("Input is not a numpy array.")
