r"""PSD repair: eigenvalue clipping for estimated covariance matrices.

Estimated covariances (ellipse-based assembly, short training series) are
routinely not positive-definite; these tools coerce them by eigenvalue
surgery and re-synthesis, with the spectrum computed on-device
(``jnp.linalg.eigh``). Capability parity with reference
``covariance_tools.py``:

- ``eigenvalue_clip`` (recommended): trace-preserving clip, dispatching to
  ``explained_variance_clip`` (keep top EOFs to a target explained
  variance, average the rest) or ``laloux_clip`` (random-matrix-theory
  noise threshold lambda_max = (1 + sqrt(q))^2 on the correlation matrix).
- ``simple_clipping``: raise eigenvalues below a LAPACK-accuracy-aware
  threshold (5 * dtype resolution * max |lambda|) to that threshold. Not
  trace-preserving. The reference offers iterative rank-1 updates vs a
  direct synthesis (``covariance_tools.py:338-370``); on TPU both
  reassemble through the same batched matmul, so `method` only selects
  logging granularity.

The re-synthesis V diag(w) V' runs as two MXU matmuls.
"""

import logging
from typing import Any, Literal
from warnings import warn

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.arrays import cor_2_cov, cov_2_cor

logger = logging.getLogger(__name__)


def check_symmetric(a, rtol: float = 1e-5, atol: float = 1e-8) -> bool:
    """True if a matrix is symmetric within tolerance."""
    a = np.asarray(a)
    return bool(np.allclose(a, a.T, rtol=rtol, atol=atol))


def clean_small(matrix, atol: float = 1e-5):
    """Zero out entries with |x| < atol."""
    matrix = np.asarray(matrix)
    cleaned = matrix.copy()
    cleaned[np.abs(matrix) < atol] = 0.0
    return cleaned


def csum_up_to_val(
    vals,
    target: float,
    reverse: bool = True,
    niter: int = 0,
    csum: float = 0.0,
) -> tuple[float, int]:
    """Cumulative-sum index at which `target` is first exceeded.

    With `reverse` the array is walked from the end and the returned index
    is negative (indexing the unreversed array). Warns when the target is
    never exceeded or `vals` is empty.
    (Parity: reference ``covariance_tools.py:393-460``.)
    """
    vals = np.asarray(vals)
    if vals.size == 0:
        warn("`vals` is empty")
        return csum, niter
    if vals.ndim != 1:
        raise ValueError("`vals` must be a vector")

    # The returned index counts how many elements were consumed when the
    # running sum first exceeds the target (negated for a reversed walk),
    # so `vals[i:]` is exactly the exceeding tail.
    walk = vals[::-1] if reverse else vals
    csums = csum + np.cumsum(walk)
    exceed = np.nonzero(csums > target)[0]
    if csum > target:
        return csum, niter
    if exceed.size == 0:
        warn("Out of `vals`, target not exceeded.")
        i = len(walk)
        return float(csums[-1]), niter + (-i if reverse else i)
    i = int(exceed[0]) + 1
    return float(csums[i - 1]), niter + (-i if reverse else i)


@jax.jit
def _resynthesise(eigvecs, eigvals):
    """V diag(w) V' as two batched matmuls."""
    return (eigvecs * eigvals[None, :]) @ eigvecs.T


def _eigh(a):
    """Symmetric eigendecomposition with backend-aware placement.

    XLA:TPU's eigh (iterative Jacobi) is ~two orders of magnitude slower
    than host LAPACK at the few-thousand sizes covariance repair runs at
    (measured: ~97 s vs ~1 s for a 1.5k matrix, f32 or f64), so on a TPU
    backend the spectrum is computed on the host; on CPU/GPU backends it
    stays on-device.
    """
    a = np.asarray(a)
    if jax.default_backend() == "tpu":
        w, v = np.linalg.eigh(a)
        return w, v
    w, v = jnp.linalg.eigh(jnp.asarray(a))
    return np.asarray(w), v


def _eigenvalue_clip(eigvals, eigvecs, keep_i: int):
    """Replace all but the top `-keep_i` eigenvalues by their average.

    Trace-preserving: the clipped eigenvalues' total mass is redistributed
    uniformly among them. Warns if the result is still not PD.
    """
    eigvals = np.asarray(eigvals)
    total_var = float(np.sum(eigvals))
    var_explained = float(np.sum(eigvals[keep_i:]))

    logger.info("total explained variance = %s", total_var)
    logger.info("clipped explained variance = %s", var_explained)

    if total_var < var_explained:
        explained_needed = float(np.sum(eigvals[keep_i + 1 :]))
        new_threshold = explained_needed / total_var
        raise ValueError(
            "Variance explained by retained eigenvalues exceeds total "
            "variance. Resulting matrix will have negative eigenvalues. "
            f"Try using a lower threshold. A value below {new_threshold:.2f} "
            "may work with "
            "glomargridding_tpu.ops.covariance_tools.explained_variance_clip."
        )

    keep_i = keep_i if keep_i < 0 else -keep_i
    n_eigvals = len(eigvals)
    clip_i = n_eigvals + keep_i
    unexplained = total_var - var_explained
    avg_for_unexplained = unexplained / clip_i

    new_eigvals = eigvals.copy()
    new_eigvals[:keep_i] = avg_for_unexplained
    out = np.asarray(
        _resynthesise(jnp.asarray(eigvecs), jnp.asarray(new_eigvals))
    )

    if not (np.linalg.eigvalsh(out) > 0).all():
        warn(
            "Resulting matrix is not positive-definite, and may not be a "
            "valid covariance matrix."
        )
    return out


def _find_index_explained_variance(eigvals, target: float = 0.95) -> int:
    """Index (negative) of the smallest kept eigenvalue for a variance
    target."""
    total_variance = float(np.sum(eigvals))
    target_explained = target * total_variance
    csum, i2goal = csum_up_to_val(eigvals, target_explained)
    if csum <= target_explained:
        raise ValueError("Target Explained Variance not exceeded")
    return i2goal


def _find_index_aspect_ratio(
    eigvals,
    num_grid_pts: int = 180 * 360,
    num_times: int = 41 * 6,
) -> int:
    """Negative count of eigenvalues above the RMT noise ceiling.

    threshold = (1 + sqrt(q))^2, q = max(N/T, T/N) — the largest eigenvalue
    a correlation matrix of uncorrelated data can produce (Laloux 2000 /
    Bun 2017 S7.2.2).
    """
    q = num_grid_pts / num_times
    if q < 1.0:
        q = 1.0 / q
    threshold = (1.0 + np.sqrt(q)) ** 2.0
    return -int(np.sum(np.asarray(eigvals) > threshold))


def explained_variance_clip(cov, target_variance_fraction: float = 0.95):
    """Trace-preserving clip keeping EOFs up to a target explained variance.

    Eigenvalues outside the retained set (small positive and negative) are
    replaced by their common average so the total variance is conserved.
    (Parity: reference ``covariance_tools.py:633-728``.)
    """
    if not 0.0 < target_variance_fraction <= 1.0:
        raise ValueError("'target_variance_fraction' must be (0, 1.0]")
    eigvals, eigvecs = _eigh(cov)
    keep_i = _find_index_explained_variance(
        eigvals, target=target_variance_fraction
    )
    return _eigenvalue_clip(eigvals, eigvecs, keep_i)


def laloux_clip(cov, num_grid_pts: int | None = None, num_time_pts: int = 40):
    """RMT (Laloux 2000) clip on the correlation matrix.

    Standardise to correlation, clip eigenvalues below the random-matrix
    ceiling (1 + sqrt(q))^2, rescale back to covariance with the original
    variances. (Parity: reference ``covariance_tools.py:519-630``.)
    """
    cov = np.asarray(cov)
    num_grid_pts = num_grid_pts or cov.shape[0]
    variances = np.diag(cov)
    cor = cov_2_cor(cov)

    eigvals, eigvecs = _eigh(cor)
    keep_i = _find_index_aspect_ratio(
        np.asarray(eigvals),
        num_grid_pts=num_grid_pts,
        num_times=num_time_pts,
    )
    clipped_cor = _eigenvalue_clip(np.asarray(eigvals), eigvecs, keep_i)
    return cor_2_cov(clipped_cor, variances)


def eigenvalue_clip(
    cov,
    method: Literal["explained_variance", "Laloux_2000"] = (
        "explained_variance"
    ),
    **kwargs,
):
    """Denoise a damaged covariance by eigenvalue clipping (recommended).

    (Parity: reference ``covariance_tools.py:788-847``.)
    """
    match method:
        case "explained_variance":
            return explained_variance_clip(cov, **kwargs)
        case "Laloux_2000":
            return laloux_clip(cov, **kwargs)
        case _:
            raise ValueError("Unknown clipping method")


def simple_clipping(
    cov,
    threshold: float | Literal["auto", "statsmodels_default"] = "auto",
    method: Literal["iterative", "direct"] = "iterative",
) -> tuple[np.ndarray, dict[str, Any]]:
    """Raise eigenvalues below a threshold to the threshold.

    'auto' threshold = 5 * dtype resolution * max|lambda| (the LAPACK
    eigenvalue accuracy bound); 'statsmodels_default' = 1e-15 (unsuitable
    for f32 inputs, kept for comparison). Not trace-preserving. Returns
    (adjusted covariance, summary dict with threshold / smallest_eigv /
    determinant / total_variance).
    (Parity: reference ``covariance_tools.py:206-390``; the iterative
    rank-1 route and the direct route coincide here — both synthesise
    V diag(w_new) V' in one fused pass on the MXU.)
    """
    cov = np.asarray(cov)
    eigvals, eigvecs = _eigh(cov)
    eigvals_np = np.asarray(eigvals)
    max_abs = float(np.max(np.abs(eigvals_np)))

    if threshold == "auto":
        finfo = np.finfo(eigvals_np.dtype)
        threshold = float(5.0 * finfo.resolution * max_abs)
    elif threshold == "statsmodels_default":
        threshold = 1e-15
    if not isinstance(threshold, (float, int)):
        raise TypeError(
            "threshold must either be number, auto or statsmodels_default. "
            f"Got {threshold = }."
        )

    n_below = int(np.sum(eigvals_np < threshold))
    if n_below == len(eigvals_np):
        warn("Input has all negative eigenvalues")
    logger.info("Minimum eigenvalue threshold = %s", threshold)
    logger.info("Eigenvalues below threshold = %s", n_below)

    new_eigvals = np.maximum(eigvals_np, threshold)
    cov_adj = np.asarray(
        _resynthesise(eigvecs, jnp.asarray(new_eigvals))
    )

    new_eigv = np.linalg.eigvalsh(cov_adj)
    meta = {
        "threshold": threshold,
        "smallest_eigv": float(np.min(new_eigv)),
        "determinant": float(np.linalg.det(cov_adj)),
        "total_variance": float(np.sum(np.diag(cov_adj))),
    }
    return cov_adj, meta


def perturb_cov_to_positive_definite(
    cov, threshold: float | Literal["auto"] = 1e-15
):
    """Deprecated statsmodels-based clip; delegates to simple_clipping."""
    warn(
        "This function is deprecated in favour of "
        "'glomargridding_tpu.ops.covariance_tools.simple_clipping'",
        DeprecationWarning,
    )
    cov = np.asarray(cov)
    shape = cov.shape
    if len(shape) != 2 or shape[0] != shape[1] or not check_symmetric(cov):
        raise ValueError("Matrix is not square and/or symmetric.")
    eigenvalues = np.linalg.eigvalsh(cov)
    if float(np.min(eigenvalues)) >= 0.0:
        return cov
    adj, _ = simple_clipping(cov, threshold=threshold)
    return adj
