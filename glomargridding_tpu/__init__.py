"""glomargridding_tpu — TPU-native kriging framework.

A JAX/XLA/Pallas re-design of the GloMarGridding capability surface
(see SURVEY.md / ARCHITECTURE.md): spatial interpolation of sparse climate
observations to complete gridded fields via Gaussian-process regression,
with stationary (variogram) and non-stationary (Paciorek-Schervish ellipse)
covariance models, observation-error covariance assembly, PSD repair, and
stochastic ensemble generation.

Curated top-level API (parity: reference ``__init__.py:21-45``).
"""

from .grid.grid import (
    assign_to_grid,
    cross_coords,
    grid_from_resolution,
    grid_to_distance_matrix,
    map_to_grid,
)
from .ops.error_covariance import (
    correlated_components,
    dist_weight,
    get_weights,
    gridbox_error_covariance,
    uncorrelated_components,
)
from .ops.variogram import (
    ExponentialVariogram,
    GaussianVariogram,
    MaternVariogram,
    SphericalVariogram,
    variogram_to_covariance,
)

__all__ = [
    "ExponentialVariogram",
    "GaussianVariogram",
    "MaternVariogram",
    "SphericalVariogram",
    "assign_to_grid",
    "correlated_components",
    "cross_coords",
    "dist_weight",
    "get_weights",
    "grid_from_resolution",
    "grid_to_distance_matrix",
    "gridbox_error_covariance",
    "map_to_grid",
    "uncorrelated_components",
    "variogram_to_covariance",
]

__version__ = "0.5.0"
