"""Kriging solver families and non-stationary ellipse models."""

from .kriging import (
    Kriging,
    OrdinaryKriging,
    SimpleKriging,
    constraint_mask,
    kriging_ordinary,
    kriging_simple,
    prep_obs_for_kriging,
    get_unmasked_obs_indices,
)
from .stochastic import (
    StochasticKriging,
    mv_normal_draw,
    precompute_states,
    scipy_mv_normal_draw,
)
from .kernel_kriging import (
    CrossValResult,
    crossval_from_covariance,
    ensemble_from_kernel,
    kriging_crossval,
    kriging_from_kernel,
    months_scan_kriging,
    pad_month_observations,
    variogram_kernel,
)
from .lowrank import (
    LowRankKrigingResult,
    lowrank_crossval,
    lowrank_ensemble_step,
    lowrank_kriging,
    lowrank_members_from_states,
    lowrank_months_scan,
)

__all__ = [
    "CrossValResult",
    "crossval_from_covariance",
    "kriging_crossval",
    "LowRankKrigingResult",
    "lowrank_crossval",
    "lowrank_ensemble_step",
    "lowrank_kriging",
    "lowrank_members_from_states",
    "lowrank_months_scan",
    "ensemble_from_kernel",
    "kriging_from_kernel",
    "months_scan_kriging",
    "pad_month_observations",
    "precompute_states",
    "variogram_kernel",
    "Kriging",
    "OrdinaryKriging",
    "SimpleKriging",
    "StochasticKriging",
    "constraint_mask",
    "get_unmasked_obs_indices",
    "kriging_ordinary",
    "kriging_simple",
    "mv_normal_draw",
    "prep_obs_for_kriging",
    "scipy_mv_normal_draw",
]
