"""Multi-chip scaling: device meshes and sharded kriging pipelines."""

from .mesh import make_mesh
from .kriging import (
    ensemble_kriging_step,
    sharded_ordinary_kriging,
)
from .kernel_kriging import sharded_kriging_from_kernel
from .linalg import (
    sharded_cholesky,
    sharded_mvn_logpdf,
    sharded_triangular_solve,
    sharded_whiten,
)
from .ellipse import (
    sharded_ellipse_covariance,
    sharded_ellipse_stream_operator,
    sharded_state_draws,
)
from .lowrank import (
    sharded_lowrank_ensemble_step,
    sharded_lowrank_kriging,
)

__all__ = [
    "ensemble_kriging_step",
    "make_mesh",
    "sharded_lowrank_ensemble_step",
    "sharded_lowrank_kriging",
    "sharded_cholesky",
    "sharded_triangular_solve",
    "sharded_ellipse_covariance",
    "sharded_ellipse_stream_operator",
    "sharded_state_draws",
    "sharded_kriging_from_kernel",
    "sharded_mvn_logpdf",
    "sharded_whiten",
    "sharded_ordinary_kriging",
]
