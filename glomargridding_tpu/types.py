"""Shared type aliases (capability parity: reference ``types.py:19-48``)."""

from typing import Literal

# Non-stationary ellipse model taxonomy (Paciorek-Schervish 2006 /
# Karspeck et al. 2012 Matern families).
ModelType = Literal[
    "ps2006_kks2011_iso",
    "ps2006_kks2011_ani",
    "ps2006_kks2011_ani_r",
    "ps2006_kks2011_iso_pd",
    "ps2006_kks2011_ani_pd",
    "ps2006_kks2011_ani_r_pd",
]

FForm = Literal[
    "anisotropic_rotated",
    "anisotropic",
    "isotropic",
    "anisotropic_rotated_pd",
    "anisotropic_pd",
    "isotropic_pd",
]

SuperCategory = Literal[
    "1_param_matern",
    "2_param_matern",
    "3_param_matern",
    "1_param_matern_pd",
    "2_param_matern_pd",
    "3_param_matern_pd",
]

# Zonal-displacement scaling convention ("tin-can" cylindrical Earth vs
# squished/sinusoidal with mean-cos-latitude scaling).
DeltaXMethod = Literal["Met_Office", "Modified_Met_Office"]

# Execution strategy accepted by the non-stationary covariance builder. All
# three collapse onto one tiled device kernel here; the value only controls
# tile sizing for memory (kept for API parity with reference ``types.py:48``).
CovarianceMethod = Literal["batched", "low_memory", "array"]

KrigMethod = Literal["simple", "ordinary"]
