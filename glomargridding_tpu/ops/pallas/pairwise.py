r"""Pallas TPU tile kernels for pairwise covariance assembly.

Two production kernels, each computing one (TM x TN) tile of a pairwise
covariance matrix entirely in VMEM — the full chain geometry ->
correlation fuses into a single pass over the output with no intermediate
matrices in HBM:

- ``matern_covariance_pallas``: haversine central angle -> half-integer
  Matern correlation (closed forms: nu = 0.5 / 1.5 / 2.5 / 3.5 cover the
  HadSST4/HadCRUT5 configurations) -> psill-scaled covariance tile.
- ``ellipse_covariance_pallas``: the Paciorek-Schervish non-stationary
  kernel: Met-Office displacement -> sigma-bar quadratic form -> Matern
  -> PS06 prefactor, per tile (reference assembles this through C(N,2)
  pair lists, ``ellipse/covariance.py:250-403``).

Row/column parameter vectors are passed as (M, 1) / (1, N) arrays so each
grid step loads one (TM, 1) and one (1, TN) strip and broadcasts on the
VPU. Inputs are padded to tile multiples by the wrappers; general
(non-half-integer) nu falls back to the jnp path in the callers.

On non-TPU backends the kernels run in interpreter mode (tests).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import RADIUS_OF_EARTH_KM

TILE_M = 256
TILE_N = 256

_TWO_PI = 2.0 * math.pi


def pallas_supported() -> bool:
    """True when running on a real TPU backend (compiled kernels)."""
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return not pallas_supported()


def _asin_poly(x):
    """arcsin(x) for x in [0, 1] via Abramowitz-Stegun 4.4.46.

    Mosaic has no inverse-trig lowering; this 7th-order minimax form has
    |error| <= 2e-8 — below f32 resolution for the distances involved.
    """
    x = jnp.clip(x, 0.0, 1.0)
    p = jnp.asarray(-0.0012624911, x.dtype)
    for c in (
        0.0066700901,
        -0.0170881256,
        0.0308918810,
        -0.0501743046,
        0.0889789874,
        -0.2145988016,
        1.5707963050,
    ):
        p = p * x + c
    return (0.5 * math.pi) - jnp.sqrt(1.0 - x) * p


def _matern_halfint_corr(x, nu: float):
    """Closed-form Matern correlation at x = sqrt(2 nu) d / range.

    corr_{n+1/2}(x) = e^{-x} * poly_n(x); exact for half-integer orders
    and exactly 1 at x = 0 (no NaN diagonal to repair).
    """
    if nu == 0.5:
        poly = 1.0
    elif nu == 1.5:
        poly = 1.0 + x
    elif nu == 2.5:
        poly = 1.0 + x + x * x / 3.0
    elif nu == 3.5:
        poly = 1.0 + x + 2.0 * x * x / 5.0 + x * x * x / 15.0
    else:  # pragma: no cover - guarded by callers
        raise ValueError(f"nu={nu} has no half-integer closed form")
    return jnp.exp(-x) * poly


def _pad_to(arr, mult):
    m = arr.shape[0]
    pad = (-m) % mult
    if pad:
        arr = jnp.concatenate([arr, jnp.zeros((pad,), arr.dtype)])
    return arr


# ===========================================================================
# Stationary Matern covariance tile kernel
# ===========================================================================
def _matern_kernel_body(
    la_i_ref, lo_i_ref, la_j_ref, lo_j_ref, out_ref,
    *, nu, psill, inv_range, radius,
):
    la_i = la_i_ref[:]  # (TM, 1)
    lo_i = lo_i_ref[:]
    la_j = la_j_ref[:]  # (1, TN)
    lo_j = lo_j_ref[:]
    sdlat = jnp.sin((la_i - la_j) / 2.0)
    sdlon = jnp.sin((lo_i - lo_j) / 2.0)
    a = sdlat * sdlat + jnp.cos(la_i) * jnp.cos(la_j) * sdlon * sdlon
    d = (2.0 * radius) * _asin_poly(jnp.sqrt(jnp.clip(a, 0.0, 1.0)))
    x = (math.sqrt(2.0 * nu) * inv_range) * d
    out_ref[:] = psill * _matern_halfint_corr(x, nu)


@partial(
    jax.jit,
    static_argnames=("nu", "psill", "range_km", "radius"),
)
def matern_covariance_pallas(
    lats1,
    lons1,
    lats2,
    lons2,
    nu: float = 0.5,
    psill: float = 1.0,
    range_km: float = 1200.0,
    radius: float = RADIUS_OF_EARTH_KM,
):
    """(|set1| x |set2|) Matern covariance tile matrix (degrees in).

    sklearn-convention argument scaling (sqrt(2 nu) d / range); covariance
    = psill * corr (exact psill on the diagonal). Half-integer nu only.
    """
    dtype = jnp.asarray(lats1).dtype
    la1 = _pad_to(jnp.radians(jnp.asarray(lats1, dtype)), TILE_M)
    lo1 = _pad_to(jnp.radians(jnp.asarray(lons1, dtype)), TILE_M)
    la2 = _pad_to(jnp.radians(jnp.asarray(lats2, dtype)), TILE_N)
    lo2 = _pad_to(jnp.radians(jnp.asarray(lons2, dtype)), TILE_N)
    m, n = la1.shape[0], la2.shape[0]

    out = pl.pallas_call(
        partial(
            _matern_kernel_body,
            nu=nu,
            psill=psill,
            inv_range=1.0 / range_km,
            radius=radius,
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), dtype),
        grid=(m // TILE_M, n // TILE_N),
        in_specs=[
            pl.BlockSpec(
                (TILE_M, 1), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_M, 1), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TILE_N), lambda i, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TILE_N), lambda i, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (TILE_M, TILE_N),
            lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
        interpret=_interpret(),
    )(
        la1[:, None],
        lo1[:, None],
        la2[None, :],
        lo2[None, :],
    )
    return out[: len(lats1), : len(lats2)]


# ===========================================================================
# Non-stationary (Paciorek-Schervish ellipse) covariance tile kernel
# ===========================================================================
def _ellipse_kernel_body(
    la_i_ref, lo_i_ref, s00_i_ref, s01_i_ref, s11_i_ref, sd_i_ref, sg_i_ref,
    la_j_ref, lo_j_ref, s00_j_ref, s01_j_ref, s11_j_ref, sd_j_ref, sg_j_ref,
    out_ref,
    *, nu, sqrt_v2, modified, radius, max_dist,
):
    la_i = la_i_ref[:]
    lo_i = lo_i_ref[:]
    la_j = la_j_ref[:]
    lo_j = lo_j_ref[:]

    dy = la_i - la_j
    dx = lo_i - lo_j
    dx = jnp.where(dx > math.pi, dx - _TWO_PI, dx)
    dx = jnp.where(dx < -math.pi, dx + _TWO_PI, dx)
    if modified:
        dx = dx * (0.5 * (jnp.cos(la_i) + jnp.cos(la_j)))
    dy = radius * dy
    dx = radius * dx

    s00 = 0.5 * (s00_i_ref[:] + s00_j_ref[:])
    s01 = 0.5 * (s01_i_ref[:] + s01_j_ref[:])
    s11 = 0.5 * (s11_i_ref[:] + s11_j_ref[:])
    det_bar = s00 * s11 - s01 * s01

    # The closed-form correlation _matern_halfint_corr(inner) equals
    # inner^v K_v(inner) / (Gamma(v) 2^{v-1}), so c_ij reduces to
    # stdev_i stdev_j * sqrt(det ratio) * corr — no explicit gamma
    # term. One rsqrt supplies both 1/sqrt(det_bar) and 1/det_bar
    # (= rsqrt^2), replacing a pairwise ratio-sqrt and two divides —
    # the tile is VPU-transcendental-bound (docs/perf.md), so per-pair
    # slow-op count is the wall.
    r_det = jax.lax.rsqrt(det_bar)
    # per-point strip sqrts ((TM,1)/(1,TN)), not a pairwise sqrt
    amp_i = sg_i_ref[:] * jnp.sqrt(sd_i_ref[:])
    amp_j = sg_j_ref[:] * jnp.sqrt(sd_j_ref[:])
    pref = (amp_i * amp_j) * r_det

    quad = (
        dx * (dx * s11 - dy * s01) + dy * (dy * s00 - dx * s01)
    ) * (r_det * r_det)
    tau = jnp.sqrt(jnp.clip(quad, 0.0, None))
    inner = sqrt_v2 * tau
    corr = _matern_halfint_corr(inner, nu)
    val = pref * corr
    # Zero the self-pair: the builder adds the diag(stdev^2) separately.
    out = jnp.where(inner > 0.0, val, jnp.zeros_like(val))

    if max_dist > 0.0:
        sdlat = jnp.sin((la_i - la_j) / 2.0)
        sdlon = jnp.sin((lo_i - lo_j) / 2.0)
        a = sdlat * sdlat + jnp.cos(la_i) * jnp.cos(la_j) * sdlon * sdlon
        dist = (2.0 * radius) * _asin_poly(
            jnp.sqrt(jnp.clip(a, 0.0, 1.0))
        )
        out = jnp.where(dist > max_dist, jnp.zeros_like(out), out)

    out_ref[:] = out


@partial(
    jax.jit,
    static_argnames=("v", "delta_x_method", "max_dist"),
)
def ellipse_covariance_pallas(
    lats_rad,
    lons_rad,
    sig_flat,
    sqrt_dets,
    stdevs,
    v: float = 0.5,
    delta_x_method: str = "Modified_Met_Office",
    max_dist: float = 0.0,
):
    """Full N x N non-stationary covariance via the Pallas tile kernel.

    Inputs as in ``models.ellipse.covariance.build_ellipse_covariance``
    (radian coords, flattened Sigma rows (s00, s01, s11), sqrt dets,
    stdevs); half-integer v only; `max_dist` <= 0 disables the cutoff.
    Adds diag(stdev^2).
    """
    if abs(2 * v - round(2 * v)) > 1e-12 or round(2 * v) % 2 == 0:
        raise ValueError(
            "pallas ellipse kernel supports half-integer v only"
        )
    dtype = jnp.asarray(sig_flat).dtype
    n_orig = jnp.asarray(lats_rad).shape[0]
    la = _pad_to(jnp.asarray(lats_rad, dtype), TILE_M)
    lo = _pad_to(jnp.asarray(lons_rad, dtype), TILE_M)
    s00 = _pad_to(jnp.asarray(sig_flat[:, 0], dtype), TILE_M)
    s01 = _pad_to(jnp.asarray(sig_flat[:, 1], dtype), TILE_M)
    s11 = _pad_to(jnp.asarray(sig_flat[:, 2], dtype), TILE_M)
    # pad Sigma with identity so padded det_bar != 0 (outputs discarded)
    n = la.shape[0]
    if n > n_orig:
        pad_sel = jnp.arange(n) >= n_orig
        s00 = jnp.where(pad_sel, 1.0, s00)
        s11 = jnp.where(pad_sel, 1.0, s11)
    sd = _pad_to(jnp.asarray(sqrt_dets, dtype), TILE_M)
    sd = jnp.where(jnp.arange(n) >= n_orig, 1.0, sd)
    sg = _pad_to(jnp.asarray(stdevs, dtype), TILE_M)

    row_spec = pl.BlockSpec(
        (TILE_M, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    col_spec = pl.BlockSpec(
        (1, TILE_N), lambda i, j: (0, j), memory_space=pltpu.VMEM
    )

    body = partial(
        _ellipse_kernel_body,
        nu=v,
        sqrt_v2=2.0 * math.sqrt(v),
        modified=(delta_x_method == "Modified_Met_Office"),
        radius=RADIUS_OF_EARTH_KM,
        max_dist=float(max_dist),
    )

    rows = [a[:, None] for a in (la, lo, s00, s01, s11, sd, sg)]
    cols = [a[None, :] for a in (la, lo, s00, s01, s11, sd, sg)]

    out = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((n, n), dtype),
        grid=(n // TILE_M, n // TILE_N),
        in_specs=[row_spec] * 7 + [col_spec] * 7,
        out_specs=pl.BlockSpec(
            (TILE_M, TILE_N),
            lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
        interpret=_interpret(),
    )(*rows, *cols)
    out = out[:n_orig, :n_orig]
    return out + jnp.diag(jnp.asarray(stdevs, dtype) ** 2)
