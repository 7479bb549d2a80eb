"""Multi-chip scaling: device meshes and sharded kriging pipelines."""

from .mesh import make_mesh
from .kriging import (
    ensemble_kriging_step,
    sharded_ordinary_kriging,
)

__all__ = [
    "ensemble_kriging_step",
    "make_mesh",
    "sharded_ordinary_kriging",
]
