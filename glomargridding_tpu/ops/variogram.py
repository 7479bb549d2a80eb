r"""Stationary variogram models -> covariance, as fused JAX kernels.

Capability parity with reference ``variogram.py`` (Spherical, Gaussian,
Exponential, Matern in the sklearn/gstat/karspeck conventions, and
``variogram_to_covariance``), re-designed as dtype-polymorphic jitted
element-wise kernels that fuse straight into whatever consumes them (tile
builders, kriging cross-covariance assembly) rather than materialising
intermediate matrices.

Each model is a dataclass of (pytree-compatible) parameters with:

- ``fit(distance_matrix)``: variogram values at the given distances
  (NaN-at-zero of the Matern handled by filling the nugget, reference
  ``variogram.py:470-476``);
- ``covariance(distance_matrix, variance=None)``: fused
  ``variance - fit(d)`` without the intermediate variogram array.

Range-parameter conventions per model match the reference exactly
(``variogram.py:84-94,166-175,246-255,369-384``).
"""

from dataclasses import dataclass, field
from typing import Literal

import jax.numpy as jnp
import numpy as np

from ..core.labeled import DataArray
from .special import gamma_fn, kv_nan_guard

MaternModel = Literal["sklearn", "gstat", "karspeck"]


def _unwrap(x):
    """(values, rewrap) for ndarray / jnp / DataArray inputs."""
    if isinstance(x, DataArray):
        return jnp.asarray(x.values), lambda v: DataArray(
            np.asarray(v), x.coords, name="variogram", attrs=dict(x.attrs)
        )
    try:  # optional xarray support
        import xarray as xr

        if isinstance(x, xr.DataArray):
            return jnp.asarray(x.values), lambda v: xr.DataArray(
                np.asarray(v), coords=x.coords, name="variogram"
            )
    except ImportError:
        pass
    if isinstance(x, np.ndarray):
        return jnp.asarray(x), lambda v: np.asarray(v)
    return jnp.asarray(x), lambda v: v


@dataclass()
class Variogram:
    """Abstract variogram model."""

    def _kernel(self, d):
        raise NotImplementedError(
            "Not implemented for base Variogram class"
        )

    def fit(self, distance_matrix):
        """Evaluate the variogram at each entry of a distance matrix.

        Returns the same container type as the input (ndarray, jax array, or
        DataArray named "variogram").
        """
        d, rewrap = _unwrap(distance_matrix)
        return rewrap(self._kernel(d))

    def covariance(self, distance_matrix, variance=None):
        """Fused covariance = variance - variogram(d).

        `variance` defaults to ``psill + nugget`` (the sill), which yields a
        covariance that decays to zero at infinite distance.
        """
        d, rewrap = _unwrap(distance_matrix)
        if variance is None:
            variance = self.psill + self.nugget
        out = variance - self._kernel(d)
        out = rewrap(out)
        if isinstance(out, DataArray):
            out.name = "covariance"
        return out


def _resolve_ranges(range_, effective_range, eff_over_range: float):
    if range_ is None and effective_range is None:
        raise ValueError("One of range and effective_range must be specified")
    if range_ is None:
        range_ = effective_range / eff_over_range
    elif effective_range is None:
        effective_range = range_ * eff_over_range
    return range_, effective_range


@dataclass()
class SphericalVariogram(Variogram):
    """Spherical model; range == effective_range.

    gamma(d) = 0.5 psill (3 d/r - (d/r)^3) + nugget, truncated to
    nugget + psill at d >= r (reference ``variogram.py:58-138``).
    """

    psill: float = 1.0
    nugget: float = 0.0
    effective_range: float | None = None
    range: float | None = None

    def __post_init__(self):
        self.range, self.effective_range = _resolve_ranges(
            self.range, self.effective_range, 1.0
        )

    def _kernel(self, d):
        r = self.range
        out = (
            0.5 * self.psill * (3.0 * d / r - (d / r) ** 3) + self.nugget
        )
        return jnp.where(d >= r, self.nugget + self.psill, out)


@dataclass()
class GaussianVariogram(Variogram):
    """Gaussian model; range = effective_range / 2.

    gamma(d) = psill (1 - exp(-(d/r)^2)) + nugget
    (reference ``variogram.py:141-218``).
    """

    psill: float = 1.0
    nugget: float = 0.0
    effective_range: float | None = None
    range: float | None = None

    def __post_init__(self):
        self.range, self.effective_range = _resolve_ranges(
            self.range, self.effective_range, 2.0
        )

    def _kernel(self, d):
        r = self.range
        return self.psill * (1.0 - jnp.exp(-((d / r) ** 2))) + self.nugget


@dataclass()
class ExponentialVariogram(Variogram):
    """Exponential model; range = effective_range / 3.

    gamma(d) = psill (1 - exp(-d/r)) + nugget
    (reference ``variogram.py:221-289``).
    """

    psill: float = 1.0
    nugget: float = 0.0
    range: float | None = None
    effective_range: float | None = None

    def __post_init__(self):
        self.range, self.effective_range = _resolve_ranges(
            self.range, self.effective_range, 3.0
        )

    def _kernel(self, d):
        r = self.range
        return self.psill * (1.0 - jnp.exp(-(d / r))) + self.nugget


@dataclass()
class MaternVariogram(Variogram):
    r"""Matern model in three conventions.

    gamma(d) = psill (1 - L * M(d/r) * K_nu(arg(d/r))) + nugget with
    L = 1/(Gamma(nu) 2^{nu-1}) and per-convention scaling of the K_nu
    argument (reference ``variogram.py:295-476``):

    - "sklearn":  arg = sqrt(2 nu) d/r   (HadCRUT5 / sklearn GP form)
    - "gstat":    arg = d/r
    - "karspeck": arg = 2 sqrt(nu) d/r   (Karspeck et al. 2012)

    range = effective_range / 2 for 0.5 <= nu <= 10, else /3. The value at
    d = 0 (where the analytic form is 0 * inf) is the nugget.
    """

    psill: float = 1.0
    nugget: float = 0.0
    effective_range: float | None = None
    range: float | None = None
    nu: float = 0.5
    method: MaternModel = "sklearn"

    def __post_init__(self):
        factor = 2.0 if 0.5 <= self.nu <= 10 else 3.0
        self.range, self.effective_range = _resolve_ranges(
            self.range, self.effective_range, factor
        )

    @property
    def _left(self) -> float:
        return 1.0 / (gamma_fn(self.nu) * (2.0 ** (self.nu - 1.0)))

    def _arg_scale(self) -> float:
        match self.method.lower():
            case "sklearn":
                return float(np.sqrt(2.0 * self.nu))
            case "gstat":
                return 1.0
            case "karspeck":
                return float(2.0 * np.sqrt(self.nu))
            case _:
                raise ValueError("Unexpected 'method' value")

    def _kernel(self, d):
        scale = self._arg_scale()
        dor = d / self.range
        inner = scale * dor
        corr = self._left * jnp.power(inner, self.nu) * kv_nan_guard(
            self.nu, inner
        )
        out = self.psill * (1.0 - corr) + self.nugget
        # The Matern form is undefined (NaN) at zero distance: the limit of
        # the correlation is 1, so the variogram there is the nugget.
        return jnp.where(d == 0.0, jnp.full_like(out, self.nugget), out)


def variogram_to_covariance(variogram, variance):
    """covariance = variance - variogram (reference ``variogram.py:479``)."""
    d, rewrap = _unwrap(variogram)
    cov = rewrap(variance - d)
    if isinstance(cov, DataArray):
        cov.name = "covariance"
    return cov
