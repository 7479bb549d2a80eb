"""Pallas TPU kernels for the hot pairwise covariance ops."""

from .pairwise import (
    ellipse_covariance_pallas,
    ellipse_covariance_pallas_sym,
    ellipse_matvec_pallas,
    matern_covariance_pallas,
    pallas_supported,
)

__all__ = [
    "ellipse_covariance_pallas",
    "ellipse_covariance_pallas_sym",
    "ellipse_matvec_pallas",
    "matern_covariance_pallas",
    "pallas_supported",
]
