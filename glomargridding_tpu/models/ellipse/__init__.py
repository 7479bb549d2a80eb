"""Non-stationary covariance via per-gridpoint ellipse parameters."""

from .model import EllipseModel, cov_ij_anisotropic, cov_ij_isotropic
from .estimate import EllipseBuilder, init_parameter_set
from .covariance import (
    EllipseCovarianceBuilder,
    build_ellipse_covariance,
    ellipse_covariance_block,
    ellipse_covariance_operator,
)

__all__ = [
    "EllipseBuilder",
    "EllipseCovarianceBuilder",
    "EllipseModel",
    "build_ellipse_covariance",
    "ellipse_covariance_block",
    "ellipse_covariance_operator",
    "cov_ij_anisotropic",
    "cov_ij_isotropic",
    "init_parameter_set",
]
