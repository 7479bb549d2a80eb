"""Shared type aliases.

The Literal VALUES below are part of the public API contract inherited
from the GloMarGridding ecosystem (reference ``types.py:19-48``): user
configs, saved parameter files (e.g. the ``fitting_model`` /
``supercategory_of_fitting_model`` variables in shipped netCDF parameter
sets), and method-selection kwargs all carry these exact strings, so
they are reproduced verbatim — everything else about how this framework
consumes them differs (they select jitted kernel variants and static
trace arguments rather than scipy/numpy code paths).

Taxonomy reading guide:

- ``ModelType`` / ``FForm`` / ``SuperCategory`` describe the
  non-stationary ellipse families: isotropic (one radius) vs anisotropic
  (Lx, Ly) vs anisotropic-rotated (Lx, Ly, theta), each in a
  degrees-space or physical-distance ("_pd", km) parameterisation. The
  three spellings exist because configs, fitted-parameter files, and
  model constructors historically use different vocabularies for the
  same six families.
- ``DeltaXMethod`` picks the zonal-displacement convention:
  "Met_Office" is the cylindrical ("tin-can") Earth; the modified form
  scales zonal displacement by the mean cos-latitude of the pair
  (sinusoidal squish toward the poles).
- ``CovarianceMethod`` selected among three execution strategies in the
  reference; here all three collapse onto one tiled device kernel and
  the value only tunes the row-block size (see
  ``models.ellipse.covariance``).
"""

from typing import Literal

# The six ellipse families, spelled three ways (config name / fform /
# supercategory). "_pd" marks the physical-distance (km) variants.
_PS_FAMILIES = ("iso", "ani", "ani_r")

ModelType = Literal[
    "ps2006_kks2011_iso", "ps2006_kks2011_ani", "ps2006_kks2011_ani_r",
    "ps2006_kks2011_iso_pd", "ps2006_kks2011_ani_pd",
    "ps2006_kks2011_ani_r_pd",
]

FForm = Literal[
    "isotropic", "anisotropic", "anisotropic_rotated",
    "isotropic_pd", "anisotropic_pd", "anisotropic_rotated_pd",
]

SuperCategory = Literal[
    "1_param_matern", "2_param_matern", "3_param_matern",
    "1_param_matern_pd", "2_param_matern_pd", "3_param_matern_pd",
]

DeltaXMethod = Literal["Met_Office", "Modified_Met_Office"]
CovarianceMethod = Literal["batched", "low_memory", "array"]
KrigMethod = Literal["simple", "ordinary"]
