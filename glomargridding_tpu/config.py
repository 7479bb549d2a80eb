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


def enable_compile_cache(path: str | None = None) -> str:
    """Enable JAX's persistent compilation cache for this process.

    Production gridding is a monthly-rerun workload whose big programs
    (spherical-harmonic synthesis, 65k covariance assembly, the MLE
    chunk pipeline) cost minutes of XLA compile but are byte-identical
    run to run — the persistent cache turns every rerun's compile into
    a disk read. Call once, before the first jit dispatch. `path`
    defaults to ``$GLOMAR_COMPILE_CACHE`` or
    ``~/.cache/glomargridding_tpu/xla``. Returns the path used.
    """
    import os

    import jax

    if path is None:
        path = os.environ.get(
            "GLOMAR_COMPILE_CACHE",
            os.path.join(
                os.path.expanduser("~"), ".cache", "glomargridding_tpu",
                "xla",
            ),
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache EVERY program, even sub-second ones: compile latency over
    # the remote-compile service is heavy-tailed (the same Legendre
    # scan measured 0.6 s and 59 s on different fresh processes), so
    # local persistence — not local compile speed — is what bounds a
    # cold process's wall time
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax: keep the default threshold
        pass
    return path
