"""Global numeric configuration.

TPU-first policy: float32 compute everywhere by default (the MXU/VPU native
width), with an opt-in to float64 for CPU parity testing of ill-conditioned
solves. The reference mixes f64 (kriging) and f32 (ellipse covariance); here
every kernel is dtype-polymorphic and follows the input dtype, with this
module providing the default for newly created arrays.
"""

from contextlib import contextmanager

import jax.numpy as jnp

_DEFAULT_DTYPE = jnp.float32


def default_dtype():
    """Default floating dtype for newly created device arrays."""
    return _DEFAULT_DTYPE


def set_default_dtype(dtype) -> None:
    """Set the default floating dtype (e.g. jnp.float32 or jnp.float64)."""
    global _DEFAULT_DTYPE
    _DEFAULT_DTYPE = jnp.dtype(dtype)


@contextmanager
def default_dtype_ctx(dtype):
    """Temporarily override the default floating dtype."""
    global _DEFAULT_DTYPE
    prev = _DEFAULT_DTYPE
    _DEFAULT_DTYPE = jnp.dtype(dtype)
    try:
        yield
    finally:
        _DEFAULT_DTYPE = prev
