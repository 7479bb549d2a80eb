"""Native (C) host-side kernels with pure-numpy fallback."""

from .gridbin import bin_mean, native_available, snap_to_grid

__all__ = ["bin_mean", "native_available", "snap_to_grid"]
