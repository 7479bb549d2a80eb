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

import math
from dataclasses import dataclass
from functools import partial
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from ..core.labeled import DataArray
from .special import gamma_fn, xv_kv

MaternModel = Literal["sklearn", "gstat", "karspeck"]


@partial(jax.jit, static_argnames=("kind", "nu", "method", "fused"))
def _vario_kernel(
    d,
    psill,
    nugget,
    range_,
    variance,
    kind: str,
    nu: float | None = None,
    method: str | None = None,
    fused: bool = False,
):
    """One jitted kernel for every variogram family.

    Numeric parameters are traced (no recompile across parameter values);
    `kind`/`nu`/`method` are static. With `fused` the returned value is
    ``variance - gamma(d)`` (covariance) in the same pass.
    """
    if kind == "spherical":
        out = 0.5 * psill * (3.0 * d / range_ - (d / range_) ** 3) + nugget
        out = jnp.where(d >= range_, nugget + psill, out)
    elif kind == "gaussian":
        out = psill * (1.0 - jnp.exp(-((d / range_) ** 2))) + nugget
    elif kind == "exponential":
        out = psill * (1.0 - jnp.exp(-(d / range_))) + nugget
    elif kind == "matern":
        if method == "sklearn":
            scale = math.sqrt(2.0 * nu)
        elif method == "gstat":
            scale = 1.0
        elif method == "karspeck":
            scale = 2.0 * math.sqrt(nu)
        else:
            raise ValueError("Unexpected 'method' value")
        left = 1.0 / (gamma_fn(nu) * (2.0 ** (nu - 1.0)))
        inner = scale * (d / range_)
        corr = left * xv_kv(nu, inner)
        out = psill * (1.0 - corr) + nugget
        out = jnp.where(d == 0.0, jnp.full_like(out, 1.0) * nugget, out)
    else:
        raise ValueError(f"Unknown variogram kind: {kind}")
    if fused:
        return variance - out
    return out


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

    _kind: str = "abstract"

    def _static_kwargs(self) -> dict:
        return {"kind": self._kind, "nu": None, "method": None}

    def _kernel(self, d, variance=0.0, fused: bool = False):
        """Jitted variogram (or fused covariance) values at distances."""
        if self._kind == "abstract":
            raise NotImplementedError(
                "Not implemented for base Variogram class"
            )
        return _vario_kernel(
            d,
            self.psill,
            self.nugget,
            self.range,
            variance,
            fused=fused,
            **self._static_kwargs(),
        )

    def fit(self, distance_matrix):
        """Evaluate the variogram at each entry of a distance matrix.

        Returns the same container type as the input (ndarray, jax array, or
        DataArray named "variogram"). One fused jitted kernel per model
        family — parameters are traced, so refits with new parameters reuse
        the compiled program.
        """
        d, rewrap = _unwrap(distance_matrix)
        return rewrap(self._kernel(d))

    def covariance(self, distance_matrix, variance=None):
        """Fused covariance = variance - variogram(d) in one kernel pass.

        `variance` defaults to ``psill + nugget`` (the sill), which yields a
        covariance that decays to zero at infinite distance.
        """
        d, rewrap = _unwrap(distance_matrix)
        if variance is None:
            variance = self.psill + self.nugget
        out = rewrap(self._kernel(d, variance=variance, fused=True))
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
        self._kind = "spherical"
        self.range, self.effective_range = _resolve_ranges(
            self.range, self.effective_range, 1.0
        )


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
        self._kind = "gaussian"
        self.range, self.effective_range = _resolve_ranges(
            self.range, self.effective_range, 2.0
        )


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
        self._kind = "exponential"
        self.range, self.effective_range = _resolve_ranges(
            self.range, self.effective_range, 3.0
        )


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
        self._kind = "matern"
        factor = 2.0 if 0.5 <= self.nu <= 10 else 3.0
        self.range, self.effective_range = _resolve_ranges(
            self.range, self.effective_range, factor
        )

    def _static_kwargs(self) -> dict:
        return {
            "kind": "matern",
            "nu": float(self.nu),
            "method": self.method.lower(),
        }

    @property
    def _left(self) -> float:
        return 1.0 / (gamma_fn(self.nu) * (2.0 ** (self.nu - 1.0)))


def variogram_to_covariance(variogram, variance):
    """covariance = variance - variogram (reference ``variogram.py:479``)."""
    d, rewrap = _unwrap(variogram)
    cov = rewrap(variance - d)
    if isinstance(cov, DataArray):
        cov.name = "covariance"
    return cov
