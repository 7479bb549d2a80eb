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
from ..distances import asin_poly

TILE_M = 256
TILE_N = 256

_TWO_PI = 2.0 * math.pi


def pallas_supported() -> bool:
    """True when running on a real TPU backend (compiled kernels)."""
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return not pallas_supported()


# arcsin via the shared A&S 4.4.46 polynomial (ops.distances): Mosaic
# has no inverse-trig lowering, and |err| <= 2e-8 is below f32
# resolution for the central angles involved
_asin_poly = asin_poly


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
def _ellipse_tile_value(
    la_i, lo_i, s00_i, s01_i, s11_i, sd_i, sg_i,
    la_j, lo_j, s00_j, s01_j, s11_j, sd_j, sg_j,
    *, nu, sqrt_v2, modified, radius, max_dist,
):
    """One PS06 tile from (TM, 1) row strips x (1, TN) col strips.

    Shared by the assembly kernel and the fused matvec kernel. The
    closed-form correlation _matern_halfint_corr(inner) equals
    inner^v K_v(inner) / (Gamma(v) 2^{v-1}), so c_ij reduces to
    stdev_i stdev_j * sqrt(det ratio) * corr — no explicit gamma
    term. One rsqrt supplies both 1/sqrt(det_bar) and 1/det_bar
    (= rsqrt^2), replacing a pairwise ratio-sqrt and two divides —
    the tile is VPU-transcendental-bound (docs/perf.md), so per-pair
    slow-op count is the wall. Self-pairs (zero displacement) are
    zeroed: builders add diag(stdev^2) separately.
    """
    dy = la_i - la_j
    dx = lo_i - lo_j
    dx = jnp.where(dx > math.pi, dx - _TWO_PI, dx)
    dx = jnp.where(dx < -math.pi, dx + _TWO_PI, dx)
    if modified:
        dx = dx * (0.5 * (jnp.cos(la_i) + jnp.cos(la_j)))
    dy = radius * dy
    dx = radius * dx

    s00 = 0.5 * (s00_i + s00_j)
    s01 = 0.5 * (s01_i + s01_j)
    s11 = 0.5 * (s11_i + s11_j)
    det_bar = s00 * s11 - s01 * s01

    r_det = jax.lax.rsqrt(det_bar)
    # per-point strip sqrts ((TM,1)/(1,TN)), not a pairwise sqrt
    amp_i = sg_i * jnp.sqrt(sd_i)
    amp_j = sg_j * jnp.sqrt(sd_j)
    pref = (amp_i * amp_j) * r_det

    quad = (
        dx * (dx * s11 - dy * s01) + dy * (dy * s00 - dx * s01)
    ) * (r_det * r_det)
    tau = jnp.sqrt(jnp.clip(quad, 0.0, None))
    inner = sqrt_v2 * tau
    corr = _matern_halfint_corr(inner, nu)
    val = pref * corr
    out = jnp.where(inner > 0.0, val, jnp.zeros_like(val))

    if max_dist > 0.0:
        # cutoff with ZERO per-pair transcendentals, mirroring the jnp
        # tile exactly: a > sin^2(max_dist / 2R) in haversine-a space,
        # a = sin^2(dlat/2) + cos cos sin^2(dlon/2) with each
        # half-angle sine expanded through per-POINT (strip)
        # HALF-angle trig (sin((x-y)/2) = sh ch' - ch sh') — the
        # squared-difference form is f32-stable at any cutoff, unlike
        # the cancelling (1 - cos(x-y))/2 expansion; the naive
        # per-pair haversine nearly doubled the tile's transcendental
        # wall (measured on v5e)
        half = min(max_dist / (2.0 * radius), 0.5 * math.pi)
        a_thresh = math.sin(half) ** 2
        shla_i, chla_i = jnp.sin(0.5 * la_i), jnp.cos(0.5 * la_i)
        shla_j, chla_j = jnp.sin(0.5 * la_j), jnp.cos(0.5 * la_j)
        shlo_i, chlo_i = jnp.sin(0.5 * lo_i), jnp.cos(0.5 * lo_i)
        shlo_j, chlo_j = jnp.sin(0.5 * lo_j), jnp.cos(0.5 * lo_j)
        sdlat = shla_i * chla_j - chla_i * shla_j
        sdlon = shlo_i * chlo_j - chlo_i * shlo_j
        cli = 1.0 - 2.0 * shla_i * shla_i
        clj = 1.0 - 2.0 * shla_j * shla_j
        a = sdlat * sdlat + (cli * clj) * (sdlon * sdlon)
        out = jnp.where(a > a_thresh, jnp.zeros_like(out), out)
    return out


def _ellipse_kernel_body(
    la_i_ref, lo_i_ref, s00_i_ref, s01_i_ref, s11_i_ref, sd_i_ref, sg_i_ref,
    la_j_ref, lo_j_ref, s00_j_ref, s01_j_ref, s11_j_ref, sd_j_ref, sg_j_ref,
    out_ref,
    *, nu, sqrt_v2, modified, radius, max_dist,
):
    out_ref[:] = _ellipse_tile_value(
        la_i_ref[:], lo_i_ref[:], s00_i_ref[:], s01_i_ref[:],
        s11_i_ref[:], sd_i_ref[:], sg_i_ref[:],
        la_j_ref[:], lo_j_ref[:], s00_j_ref[:], s01_j_ref[:],
        s11_j_ref[:], sd_j_ref[:], sg_j_ref[:],
        nu=nu, sqrt_v2=sqrt_v2, modified=modified,
        radius=radius, max_dist=max_dist,
    )


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


# ===========================================================================
# Symmetric stored assembly: build each upper-triangle tile ONCE
# ===========================================================================
# The full stored (n, n) assembly is VPU-transcendental-bound (the tile
# write is ~8% of HBM roofline, docs/perf.md), and the matrix is
# symmetric — so the XLA path and the plain tile kernel above both do
# 2x the necessary producer work. This kernel enumerates the
# nb (nb + 1) / 2 upper-triangle block pairs through scalar-prefetched
# (I, J) index lists with grid (n_pairs, 2): step k = 0 builds tile
# T(I, J) in VMEM, stores it to persistent scratch, and writes output
# block (I, J); step k = 1 writes scratch^T to block (J, I) — every
# output block is written exactly once (diagonal pairs write the same
# block twice in consecutive steps, which Pallas keeps in VMEM and
# flushes once; the tile algebra is bitwise symmetric under i<->j, so
# the second write is the identical tile). HBM write traffic is
# unchanged (n^2 f32); the transcendental work is HALVED.
#
# Reference scope: this replaces the all-C(N,2)-pairs stored assembly
# (reference ellipse/covariance.py:250-403) at its own game — the
# reference's pair list is also triangular, but materialises index
# arrays and scatters; here the triangularity maps onto the tile grid.
#
# Tile size swept on v5e at 16k (warm, amortised): 256 -> 8.7 ms,
# 512 -> 7.0 ms, 1024 -> 6.4 ms (6.9 ms banded, vmem limit 100 MB of
# the 128 MB physical) — fewer grid cells amortise the per-cell
# DMA-issue overhead; 1024 holds the tile + transpose scratch + the
# ~10-intermediate build chain within the limit.
_SYM_TILE = 1024


def _ellipse_sym_body(
    i_list_ref,  # scalar prefetch: (n_pairs,) int32 row-block ids
    j_list_ref,  # scalar prefetch: (n_pairs,) int32 col-block ids
    p_row_ref,   # (_SYM_TILE, 8): la, lo, s00, s01, s11, sd, sg, 0
    p_col_ref,   # (8, _SYM_TILE): same, pre-transposed
    out_ref,     # (_SYM_TILE, _SYM_TILE)
    tile_scr,    # scratch (_SYM_TILE, _SYM_TILE) f32
    *, nu, sqrt_v2, modified, radius, max_dist, out_dtype, with_diag,
):
    p = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        P = p_row_ref[:]
        Q = p_col_ref[:]
        tile = _ellipse_tile_value(
            P[:, 0:1], P[:, 1:2], P[:, 2:3], P[:, 3:4], P[:, 4:5],
            P[:, 5:6], P[:, 6:7],
            Q[0:1, :], Q[1:2, :], Q[2:3, :], Q[3:4, :], Q[4:5, :],
            Q[5:6, :], Q[6:7, :],
            nu=nu, sqrt_v2=sqrt_v2, modified=modified,
            radius=radius, max_dist=max_dist,
        )
        if with_diag:
            # add diag(stdev^2) on diagonal blocks IN the kernel: a
            # separate `out + jnp.diag(...)` epilogue costs a full
            # n^2 read+write pass (~30% of the whole assembly wall,
            # measured at 16k on v5e)
            on_diag = i_list_ref[p] == j_list_ref[p]
            rid = jax.lax.broadcasted_iota(
                jnp.int32, tile.shape, 0
            )
            cid = jax.lax.broadcasted_iota(
                jnp.int32, tile.shape, 1
            )
            sg = P[:, 6:7]
            tile = jnp.where(
                on_diag & (rid == cid), tile + sg * sg, tile
            )
        tile_scr[:] = tile
        out_ref[:] = tile.astype(out_dtype)

    @pl.when(k == 1)
    def _():
        out_ref[:] = tile_scr[:].T.astype(out_dtype)


@partial(
    jax.jit,
    static_argnames=(
        "v", "delta_x_method", "max_dist", "out_dtype", "add_diag",
        "keep_pad",
    ),
)
def ellipse_covariance_pallas_sym(
    lats_rad,
    lons_rad,
    sig_flat,
    sqrt_dets,
    stdevs,
    v: float = 0.5,
    delta_x_method: str = "Modified_Met_Office",
    max_dist: float = 0.0,
    out_dtype=jnp.float32,
    add_diag: bool = True,
    keep_pad: bool = False,
):
    """Full N x N non-stationary covariance, upper-triangle tiles only.

    Same contract as ``ellipse_covariance_pallas`` (adds diag(stdev^2),
    half-integer v, `max_dist` <= 0 disables the cutoff) at ~half the
    transcendental producer work. ``out_dtype`` lets the bf16 stored
    operator write half-width blocks straight from the f32 tile;
    ``add_diag=False`` returns the zero-diagonal matrix for callers
    that keep diag(stdev^2) separate (the bf16 operator) — at bf16
    sizes the ``+ jnp.diag`` would double peak HBM. ``keep_pad=True``
    returns the full (n_pad, n_pad) tile-aligned matrix WITHOUT the
    ``[:n, :n]`` slice (padded rows/cols are exact zeros: padded
    stdevs are 0, so every padded tile value vanishes) — at 65k-bf16
    the slice would materialise a second 8.4 GB copy and OOM.
    """
    if abs(2 * v - round(2 * v)) > 1e-12 or round(2 * v) % 2 == 0:
        raise ValueError(
            "pallas ellipse kernel supports half-integer v only"
        )
    dtype = jnp.float32
    n_orig = jnp.asarray(lats_rad).shape[0]
    la = _pad_to(jnp.asarray(lats_rad, dtype), _SYM_TILE)
    lo = _pad_to(jnp.asarray(lons_rad, dtype), _SYM_TILE)
    s00 = _pad_to(jnp.asarray(sig_flat[:, 0], dtype), _SYM_TILE)
    s01 = _pad_to(jnp.asarray(sig_flat[:, 1], dtype), _SYM_TILE)
    s11 = _pad_to(jnp.asarray(sig_flat[:, 2], dtype), _SYM_TILE)
    n = la.shape[0]
    if n > n_orig:
        # pad Sigma with identity so padded det_bar != 0
        pad_sel = jnp.arange(n) >= n_orig
        s00 = jnp.where(pad_sel, 1.0, s00)
        s11 = jnp.where(pad_sel, 1.0, s11)
    sd = _pad_to(jnp.asarray(sqrt_dets, dtype), _SYM_TILE)
    sd = jnp.where(jnp.arange(n) >= n_orig, 1.0, sd)
    sg = _pad_to(jnp.asarray(stdevs, dtype), _SYM_TILE)

    P = jnp.stack(
        [la, lo, s00, s01, s11, sd, sg, jnp.zeros((n,), dtype)],
        axis=-1,
    )
    PT = P.T

    nb = n // _SYM_TILE
    # upper-triangle block-pair lists, row-major (static: nb is static)
    import numpy as _np

    iu, ju = _np.triu_indices(nb)
    i_list = jnp.asarray(iu, jnp.int32)
    j_list = jnp.asarray(ju, jnp.int32)
    n_pairs = int(iu.shape[0])

    body = partial(
        _ellipse_sym_body,
        nu=v,
        sqrt_v2=2.0 * math.sqrt(v),
        modified=(delta_x_method == "Modified_Met_Office"),
        radius=RADIUS_OF_EARTH_KM,
        max_dist=float(max_dist),
        out_dtype=out_dtype,
        with_diag=add_diag,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pairs, 2),
        in_specs=[
            pl.BlockSpec(
                (_SYM_TILE, 8),
                lambda p, k, il, jl: (il[p], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, _SYM_TILE),
                lambda p, k, il, jl: (0, jl[p]),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (_SYM_TILE, _SYM_TILE),
            lambda p, k, il, jl: (
                jnp.where(k == 0, il[p], jl[p]),
                jnp.where(k == 0, jl[p], il[p]),
            ),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((_SYM_TILE, _SYM_TILE), jnp.float32)
        ],
    )
    try:
        # 100 MB scoped VMEM (128 MB physical): the 1024^2 tile (4 MB)
        # + transpose scratch + ~10 live build intermediates + the
        # banded-cutoff trig chain need ~70-90 MB; measured to compile
        # and run banded at this limit (docs/perf.md tile-size sweep)
        cparams = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    except TypeError:  # older CompilerParams signature
        cparams = None
    out = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((n, n), out_dtype),
        grid_spec=grid_spec,
        compiler_params=cparams,
        interpret=_interpret(),
    )(i_list, j_list, P, PT)
    # diag(stdev^2) is added in-kernel on diagonal blocks (with_diag)
    if not keep_pad:
        out = out[:n_orig, :n_orig]
    return out


# ===========================================================================
# Fused symmetric assemble-and-multiply matvec (narrow x)
# ===========================================================================
# y = C_ns @ x for x with <= MV_W columns, never materialising any tile
# in HBM and building each UPPER-TRIANGLE tile ONCE: the same VMEM tile
# serves y_I += T @ x_J and y_J += T' @ x_I — HALF the transcendental
# producer work of the row-streamed jnp path (the sweep's wall,
# docs/perf.md) plus zero tile HBM traffic. The y accumulator lives
# TRANSPOSED, (MV_W, n_pad) f32, in persistent VMEM scratch (lane-packed;
# an (n, 8) layout would waste 15/16 of the lanes), so the kernel is
# bounded to n_pad <= ~280k at MV_W = 8. Wide applications (the clip's
# CholQR blocks) stay on the jnp streamed path: bounding this kernel's
# VMEM working set at large widths forces tile rebuilds that erase the
# symmetric saving (measured in round 3, docs/perf.md).
#
# Per-cell overhead engineering (measured on v5e): a first cut with 14
# separate (TILE, 1)/(1, TILE) parameter strips and 256^2 tiles spent
# ~4-6 us/cell on DMA issue — 0.9 s of pure overhead at 259k banded,
# erasing the symmetric saving. This version packs the seven per-point
# parameters into ONE (n_pad, 8) row array and ONE pre-transposed
# (8, n_pad) column array (4 input DMAs per cell instead of 16) and
# uses 512^2 tiles (4x fewer cells).
#
# Grid: (n_blocks, bwu) where cell (i, d) handles block pair
# (i, j = i + d); a prefetched per-row band limit hi[i] (from the same
# latitude-gap certificate as the banded jnp stream) skips provably-zero
# tiles beyond the haversine cutoff. Output block i is written at every
# (i, *) cell and is complete at the last one: all (k < i, d) cells —
# the transpose contributions INTO row i — precede row i's cells in the
# row-major grid order, and Pallas flushes an output block only when its
# index changes.
MV_W = 8
TILE_P = 512


def _ellipse_matvec_body(
    hi_ref,
    p_row_ref,   # (TILE_P, 8): la, lo, s00, s01, s11, sd, sg, 0
    p_col_ref,   # (8, TILE_P): same, pre-transposed
    xT_j_ref,    # (MV_W, TILE_P)
    xT_i_ref,    # (MV_W, TILE_P)
    out_ref,     # (MV_W, TILE_P)
    y_acc,       # scratch (MV_W, n_pad)
    *, nu, sqrt_v2, modified, radius, max_dist,
):
    i = pl.program_id(0)
    d = pl.program_id(1)
    nb = pl.num_programs(0)
    j = jnp.minimum(i + d, nb - 1)

    @pl.when((i == 0) & (d == 0))
    def _():
        y_acc[:] = jnp.zeros_like(y_acc)

    @pl.when(i + d <= hi_ref[i])
    def _():
        P = p_row_ref[:]
        Q = p_col_ref[:]
        tile = _ellipse_tile_value(
            P[:, 0:1], P[:, 1:2], P[:, 2:3], P[:, 3:4], P[:, 4:5],
            P[:, 5:6], P[:, 6:7],
            Q[0:1, :], Q[1:2, :], Q[2:3, :], Q[3:4, :], Q[4:5, :],
            Q[5:6, :], Q[6:7, :],
            nu=nu, sqrt_v2=sqrt_v2, modified=modified,
            radius=radius, max_dist=max_dist,
        )
        # y_I += T @ x_J, accumulated transposed: (W, TJ) x (TI, TJ)^T.
        # HIGHEST precision: the contraction is an (8, T, T) sliver —
        # negligible next to the tile build — and bf16-default passes
        # cost ~3e-4 relative against the f32-exact jnp stream.
        contrib_i = jax.lax.dot_general(
            xT_j_ref[:], tile,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        off_i = pl.multiple_of(i * TILE_P, TILE_P)
        y_acc[:, pl.ds(off_i, TILE_P)] += contrib_i

        @pl.when(d > 0)
        def _():
            # y_J += T' @ x_I: (W, TI) x (TI, TJ) — the SAME tile,
            # no rebuild (the symmetric saving)
            contrib_j = jax.lax.dot_general(
                xT_i_ref[:], tile,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            off_j = pl.multiple_of(j * TILE_P, TILE_P)
            y_acc[:, pl.ds(off_j, TILE_P)] += contrib_j

    off = pl.multiple_of(i * TILE_P, TILE_P)
    out_ref[:] = y_acc[:, pl.ds(off, TILE_P)]


@partial(
    jax.jit,
    static_argnames=("v", "delta_x_method", "max_dist", "bwu"),
)
def ellipse_matvec_pallas(
    lats_rad,
    lons_rad,
    sig_flat,
    sqrt_dets,
    stdevs,
    x,
    hi_blocks,
    v: float = 0.5,
    delta_x_method: str = "Modified_Met_Office",
    max_dist: float = 0.0,
    bwu: int | None = None,
):
    """y = C_ns @ x (no diagonal) via the fused symmetric kernel.

    Parameter arrays must already be padded to a TILE_P multiple (the
    stream operator's padded column arrays); `x` is (n_pad, w) with
    w <= MV_W (zero rows for padding). `hi_blocks` is the (n_blocks,)
    int32 per-row upper band limit at TILE_P granularity (>= i;
    n_blocks - 1 disables banding), `bwu` the static max of
    hi_blocks[i] - i + 1. Half-integer v only. Returns (n_pad, w); the
    caller slices to n and adds diag(stdev^2) @ x.
    """
    if abs(2 * v - round(2 * v)) > 1e-12 or round(2 * v) % 2 == 0:
        raise ValueError(
            "pallas ellipse matvec supports half-integer v only"
        )
    dtype = jnp.float32
    n_pad = jnp.asarray(lats_rad).shape[0]
    if n_pad % TILE_P:
        raise ValueError(f"inputs must be padded to {TILE_P} multiples")
    nb = n_pad // TILE_P
    if bwu is None:
        bwu = nb
    w = x.shape[1]
    if w > MV_W:
        raise ValueError(f"fused matvec is for <= {MV_W} columns, got {w}")
    xT = jnp.zeros((MV_W, n_pad), dtype).at[:w, :].set(
        jnp.asarray(x, dtype).T
    )

    # pack the seven per-point parameters once: (n_pad, 8) row-major
    # and its (8, n_pad) transpose for the column strips
    P = jnp.stack(
        [
            jnp.asarray(lats_rad, dtype),
            jnp.asarray(lons_rad, dtype),
            jnp.asarray(sig_flat[:, 0], dtype),
            jnp.asarray(sig_flat[:, 1], dtype),
            jnp.asarray(sig_flat[:, 2], dtype),
            jnp.asarray(sqrt_dets, dtype),
            jnp.asarray(stdevs, dtype),
            jnp.zeros((n_pad,), dtype),
        ],
        axis=-1,
    )
    PT = P.T

    body = partial(
        _ellipse_matvec_body,
        nu=v,
        sqrt_v2=2.0 * math.sqrt(v),
        modified=(delta_x_method == "Modified_Met_Office"),
        radius=RADIUS_OF_EARTH_KM,
        max_dist=float(max_dist),
    )

    def _col(i, d, hi):
        return (0, jnp.minimum(i + d, nb - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, int(bwu)),
        in_specs=[
            pl.BlockSpec(
                (TILE_P, 8), lambda i, d, hi: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, TILE_P), _col, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (MV_W, TILE_P), _col, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (MV_W, TILE_P), lambda i, d, hi: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (MV_W, TILE_P), lambda i, d, hi: (0, i),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((MV_W, n_pad), jnp.float32)],
    )
    try:
        # 40 MB scoped VMEM: the (MV_W, n_pad) accumulator is 8.3 MB at
        # 259k and the banded tile chain holds ~10 live 512^2 f32
        # intermediates — the default 16 MB scoped limit OOMs there
        # (measured); v5e has 128 MB physical VMEM.
        cparams = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=40 * 1024 * 1024,
        )
    except TypeError:  # older CompilerParams signature
        cparams = None
    yT = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((MV_W, n_pad), dtype),
        grid_spec=grid_spec,
        compiler_params=cparams,
        interpret=_interpret(),
    )(jnp.asarray(hi_blocks, jnp.int32), P, PT, xT, xT)
    return yT[:w, :].T
