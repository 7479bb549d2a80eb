"""Pallas tile kernels vs the jnp reference paths (interpret mode on
CPU; compiled on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from glomargridding_tpu.ops.distances import haversine_matrix, sigma_rot_flat
from glomargridding_tpu.ops.pallas import (
    ellipse_covariance_pallas,
    ellipse_covariance_pallas_sym,
    matern_covariance_pallas,
)
from glomargridding_tpu.ops.variogram import MaternVariogram
from glomargridding_tpu.models.ellipse.covariance import (
    build_ellipse_covariance,
)


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5, 3.5])
def test_matern_pallas_matches_variogram(rng, nu):
    lats1 = rng.uniform(-80, 80, 40)
    lons1 = rng.uniform(-180, 180, 40)
    lats2 = rng.uniform(-80, 80, 30)
    lons2 = rng.uniform(-180, 180, 30)

    ours = np.asarray(
        matern_covariance_pallas(
            jnp.asarray(lats1, jnp.float32),
            jnp.asarray(lons1, jnp.float32),
            jnp.asarray(lats2, jnp.float32),
            jnp.asarray(lons2, jnp.float32),
            nu=nu,
            psill=1.2,
            range_km=1500.0,
        )
    )
    assert ours.shape == (40, 30)

    vario = MaternVariogram(psill=1.2, nugget=0.0, range=1500.0, nu=nu)
    d = np.asarray(haversine_matrix(lats1, lons1, lats2, lons2))
    ref = np.asarray(vario.covariance(d, variance=1.2))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)


def test_matern_pallas_diagonal_exact(rng):
    lats = rng.uniform(-80, 80, 20)
    lons = rng.uniform(-180, 180, 20)
    out = np.asarray(
        matern_covariance_pallas(
            jnp.asarray(lats, jnp.float32),
            jnp.asarray(lons, jnp.float32),
            jnp.asarray(lats, jnp.float32),
            jnp.asarray(lons, jnp.float32),
            nu=1.5,
            psill=2.0,
            range_km=1000.0,
        )
    )
    np.testing.assert_allclose(np.diag(out), 2.0, rtol=1e-6)


@pytest.mark.parametrize("method", ["Modified_Met_Office", "Met_Office"])
def test_ellipse_pallas_matches_jnp(rng, method):
    n = 50
    lats = np.sort(rng.uniform(-60, 60, n)).astype(np.float32)
    lons = rng.uniform(-180, 180, n).astype(np.float32)
    Lx = rng.uniform(800, 2000, n).astype(np.float32)
    Ly = rng.uniform(400, 800, n).astype(np.float32)
    theta = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    stdev = rng.uniform(0.5, 1.5, n).astype(np.float32)

    s00, s01, _, s11 = sigma_rot_flat(
        jnp.asarray(Lx), jnp.asarray(Ly), jnp.asarray(theta)
    )
    sig_flat = jnp.stack([s00, s01, s11], axis=-1)
    sqrt_dets = jnp.sqrt(s00 * s11 - s01 * s01)
    la = jnp.radians(jnp.asarray(lats))
    lo = jnp.radians(jnp.asarray(lons))

    ref = np.asarray(
        build_ellipse_covariance(
            la, lo, sig_flat, sqrt_dets, jnp.asarray(stdev),
            v=0.5, delta_x_method=method,
        )
    )
    ours = np.asarray(
        ellipse_covariance_pallas(
            la, lo, sig_flat, sqrt_dets, jnp.asarray(stdev),
            v=0.5, delta_x_method=method,
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)


def test_ellipse_pallas_max_dist(rng):
    n = 30
    lats = np.linspace(-60, 60, n).astype(np.float32)
    lons = np.linspace(-170, 170, n).astype(np.float32)
    Lx = np.full(n, 1500.0, np.float32)
    Ly = np.full(n, 800.0, np.float32)
    theta = np.zeros(n, np.float32)
    stdev = np.ones(n, np.float32)
    s00, s01, _, s11 = sigma_rot_flat(
        jnp.asarray(Lx), jnp.asarray(Ly), jnp.asarray(theta)
    )
    sig_flat = jnp.stack([s00, s01, s11], axis=-1)
    sqrt_dets = jnp.sqrt(s00 * s11 - s01 * s01)
    la = jnp.radians(jnp.asarray(lats))
    lo = jnp.radians(jnp.asarray(lons))

    out = np.asarray(
        ellipse_covariance_pallas(
            la, lo, sig_flat, sqrt_dets, jnp.asarray(stdev),
            v=0.5, max_dist=1000.0,
        )
    )
    ref = np.asarray(
        build_ellipse_covariance(
            la, lo, sig_flat, sqrt_dets, jnp.asarray(stdev),
            v=0.5, max_dist=1000.0,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-6)
    assert (np.diag(out) == 1.0).all()


def test_ellipse_pallas_rejects_general_nu():
    with pytest.raises(ValueError, match="half-integer"):
        ellipse_covariance_pallas(
            jnp.zeros(4), jnp.zeros(4),
            jnp.ones((4, 3)), jnp.ones(4), jnp.ones(4),
            v=1.2,
        )


def _ellipse_inputs(rng, n):
    lats = np.sort(rng.uniform(-60, 60, n)).astype(np.float32)
    lons = rng.uniform(-180, 180, n).astype(np.float32)
    Lx = rng.uniform(800, 2000, n).astype(np.float32)
    Ly = rng.uniform(400, 800, n).astype(np.float32)
    theta = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    stdev = rng.uniform(0.5, 1.5, n).astype(np.float32)
    s00, s01, _, s11 = sigma_rot_flat(
        jnp.asarray(Lx), jnp.asarray(Ly), jnp.asarray(theta)
    )
    sig_flat = jnp.stack([s00, s01, s11], axis=-1)
    sqrt_dets = jnp.sqrt(s00 * s11 - s01 * s01)
    la = jnp.radians(jnp.asarray(lats))
    lo = jnp.radians(jnp.asarray(lons))
    return la, lo, sig_flat, sqrt_dets, jnp.asarray(stdev)


@pytest.mark.parametrize("max_dist", [0.0, 3000.0])
def test_ellipse_sym_matches_plain_kernel(rng, max_dist):
    """The upper-triangle-only kernel is BITWISE the plain tile kernel.

    The tile algebra is exactly symmetric under i<->j in f32 (every op
    is a commutative product/sum or an exact negation), so writing
    scratch^T into the lower triangle reproduces the full kernel
    bit-for-bit. n=70 exercises the padding path (pad 70 -> 512).
    """
    la, lo, sig, sqd, sd = _ellipse_inputs(rng, 70)
    a = np.asarray(ellipse_covariance_pallas(
        la, lo, sig, sqd, sd, v=1.5, max_dist=max_dist))
    b = np.asarray(ellipse_covariance_pallas_sym(
        la, lo, sig, sqd, sd, v=1.5, max_dist=max_dist))
    assert (a == b).all()
    assert (b == b.T).all()


def test_ellipse_sym_matches_jnp_reference(rng):
    la, lo, sig, sqd, sd = _ellipse_inputs(rng, 60)
    ref = np.asarray(build_ellipse_covariance(
        la, lo, sig, sqd, sd, v=0.5, use_pallas=False))
    ours = np.asarray(ellipse_covariance_pallas_sym(
        la, lo, sig, sqd, sd, v=0.5))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)


def test_ellipse_sym_bf16_no_diag(rng):
    """bf16 output + add_diag=False: the stored-operator contract."""
    la, lo, sig, sqd, sd = _ellipse_inputs(rng, 40)
    full = np.asarray(ellipse_covariance_pallas(
        la, lo, sig, sqd, sd, v=1.5))
    nodiag = full - np.diag(np.asarray(sd) ** 2)
    b16 = np.asarray(ellipse_covariance_pallas_sym(
        la, lo, sig, sqd, sd, v=1.5,
        out_dtype=jnp.bfloat16, add_diag=False,
    ).astype(jnp.float32))
    assert (np.diag(b16) == 0.0).all()
    scale = np.abs(nodiag).max()
    assert np.abs(b16 - nodiag).max() / scale < 8e-3  # bf16 mantissa


def test_ellipse_sym_rejects_general_nu():
    with pytest.raises(ValueError, match="half-integer"):
        ellipse_covariance_pallas_sym(
            jnp.zeros(4), jnp.zeros(4),
            jnp.ones((4, 3)), jnp.ones(4), jnp.ones(4),
            v=1.2,
        )


def test_ellipse_sym_keep_pad_f32(rng):
    """keep_pad returns the tile-aligned matrix; padding is exact
    zeros and the in-kernel diagonal covers only real points."""
    from glomargridding_tpu.ops.pallas.pairwise import _SYM_TILE

    la, lo, sig, sqd, sd = _ellipse_inputs(rng, 50)
    full = np.asarray(ellipse_covariance_pallas_sym(
        la, lo, sig, sqd, sd, v=1.5, keep_pad=True))
    assert full.shape == (_SYM_TILE, _SYM_TILE)
    ref = np.asarray(ellipse_covariance_pallas_sym(
        la, lo, sig, sqd, sd, v=1.5))
    assert (full[:50, :50] == ref).all()
    assert (full[50:, :] == 0.0).all()
    assert (full[:, 50:] == 0.0).all()


def _f64_haversine_km(lats_deg, lons_deg):
    """f64 numpy haversine oracle (km), no library code."""
    la = np.radians(lats_deg.astype(np.float64))
    lo = np.radians(lons_deg.astype(np.float64))
    dla = la[:, None] - la[None, :]
    dlo = lo[:, None] - lo[None, :]
    a = (
        np.sin(0.5 * dla) ** 2
        + np.cos(la)[:, None] * np.cos(la)[None, :]
        * np.sin(0.5 * dlo) ** 2
    )
    return 2.0 * 6371.0088 * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def test_small_cutoff_f32_boundary_precision(rng):
    """The haversine cutoff must stay f32-accurate at SMALL radii.

    The zero-transcendental cutoff once expanded (1 - cos(x - y))/2
    through per-point full-angle trig, which cancels catastrophically
    in f32: at a 10 km cutoff the boundary was misplaced by up to ~8%
    of the radius. The half-angle squared-difference form keeps the
    rounding BEFORE the square, so the error in haversine-a is
    relative (~2*sqrt(a)*eps). Pin: every pair classified differently
    from the f64 oracle lies within 0.5% of the boundary — across a
    mid-lat cluster, a dateline-straddling cluster, and a polar one.
    Exercises both the jnp tile path and the Pallas kernel.
    """
    cut_km = 10.0
    clusters = [
        (47.0, 8.0),      # mid-latitude
        (-35.0, 179.95),  # straddles the antimeridian
        (80.0, -120.0),   # high latitude (small cos-lat)
    ]
    lats, lons = [], []
    for la0, lo0 in clusters:
        # ~0.5-20 km spacings around each centre so many pairs land
        # near the 10 km boundary
        lats.append(la0 + rng.uniform(-0.09, 0.09, 24))
        lons.append(lo0 + rng.uniform(-0.13, 0.13, 24))
    lats = np.concatenate(lats).astype(np.float32)
    lons = ((np.concatenate(lons) + 180.0) % 360.0 - 180.0).astype(
        np.float32
    )
    n = lats.shape[0]

    dist = _f64_haversine_km(lats, lons)
    Lx = np.full(n, 30.0, np.float32)
    Ly = np.full(n, 20.0, np.float32)
    theta = np.zeros(n, np.float32)
    stdev = np.ones(n, np.float32)
    s00, s01, _, s11 = sigma_rot_flat(
        jnp.asarray(Lx), jnp.asarray(Ly), jnp.asarray(theta)
    )
    sig_flat = jnp.stack([s00, s01, s11], axis=-1)
    sqrt_dets = jnp.sqrt(s00 * s11 - s01 * s01)
    la = jnp.radians(jnp.asarray(lats))
    lo = jnp.radians(jnp.asarray(lons))

    off = ~np.eye(n, dtype=bool)
    for path in ("jnp", "pallas"):
        if path == "jnp":
            cov = np.asarray(
                build_ellipse_covariance(
                    la, lo, sig_flat, sqrt_dets, jnp.asarray(stdev),
                    v=0.5, max_dist=cut_km, use_pallas=False,
                )
            )
        else:
            cov = np.asarray(
                ellipse_covariance_pallas(
                    la, lo, sig_flat, sqrt_dets, jnp.asarray(stdev),
                    v=0.5, max_dist=cut_km,
                )
            )
        zeroed = (cov == 0.0) & off
        kept = (cov != 0.0) & off
        # sanity: the construction actually produces near-boundary work
        assert (dist[off] < cut_km).any() and (dist[off] > cut_km).any()
        # zeroed pairs must be beyond 99.5% of the radius; kept pairs
        # within 100.5% of it
        assert dist[zeroed].min() > cut_km * 0.995, path
        assert dist[kept].max() < cut_km * 1.005, path
