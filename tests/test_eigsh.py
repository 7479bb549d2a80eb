"""Randomized top-k eigensolver + partial-spectrum PSD repair tests.

The 16,384-point test uses an implicit operator with an analytically
known spectrum (sign-scaled orthonormal DCT conjugation), so the
device-scale clip is verified against exact ground truth without any
O(n^3) LAPACK oracle — the partial path never materialises an n x n
array at all.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glomargridding_tpu.ops.covariance_tools import (
    LowRankPSD,
    explained_variance_clip,
    explained_variance_clip_lowrank,
    laloux_clip,
    laloux_clip_lowrank,
)
from glomargridding_tpu.ops.eigsh import topk_eigh


def _damaged_kernel_cov(n, rng, damage=0.05):
    """Gaussian kernel matrix with an indefinite low-rank perturbation
    (typical of ellipse-assembled covariances: smooth decaying spectrum
    plus small negative eigenvalues)."""
    x = rng.uniform(0.0, 1.0, size=(n, 2))
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    A = np.exp(-d2 / 0.02)
    P = rng.normal(size=(n, 32)) / np.sqrt(n)
    A = A - damage * (P @ P.T)
    return 0.5 * (A + A.T)


def test_topk_matches_lapack(rng):
    """Convergence contract: the HEAD of the computed Ritz values (the
    part a clip retains, k - oversample) is LAPACK-accurate at defaults;
    with generous oversampling the whole top-k is exact."""
    n, k = 600, 50
    A = _damaged_kernel_cov(n, rng)
    w_full = np.linalg.eigh(A)[0][::-1]

    w, _ = topk_eigh(jnp.asarray(A), k, key=jax.random.key(1))
    np.testing.assert_allclose(w[:30], w_full[:30], rtol=1e-8)

    w, V = topk_eigh(
        jnp.asarray(A), k, key=jax.random.key(1), oversample=32
    )
    np.testing.assert_allclose(w, w_full[:k], rtol=1e-9)
    # Ritz vectors: A v = w v within tolerance, orthonormal
    V = np.asarray(V)
    resid = A @ V - V * w[None, :]
    assert np.linalg.norm(resid) / np.linalg.norm(A) < 1e-6
    np.testing.assert_allclose(V.T @ V, np.eye(k), atol=1e-10)


def test_topk_callable_operator(rng):
    n, k = 300, 20
    A = _damaged_kernel_cov(n, rng)
    Adev = jnp.asarray(A)
    w_dense, _ = topk_eigh(Adev, k)
    w_call, _ = topk_eigh(lambda X: Adev @ X, k, n)
    np.testing.assert_allclose(w_call, w_dense, rtol=1e-12)
    with pytest.raises(ValueError, match="n is required"):
        topk_eigh(lambda X: X, k)


def test_topk_full_width_fallback(rng):
    n = 24
    A = _damaged_kernel_cov(n, rng)
    w, V = topk_eigh(jnp.asarray(A), n)  # k + oversample >= n
    w_full, _ = np.linalg.eigh(A)
    np.testing.assert_allclose(w, w_full[::-1], rtol=1e-12)


def test_partial_clip_matches_full_dense(rng):
    """The partial (randomized top-k) explained-variance clip must
    reproduce the full-LAPACK clip to solver accuracy (VERDICT round-1
    item 1 'done' criterion, run at the largest size the 1-core CPU
    oracle affords; the 16,384 case below checks scale vs an analytic
    oracle)."""
    n = 2048
    A = _damaged_kernel_cov(n, rng)
    full = explained_variance_clip(A, 0.95, spectrum="full")
    part = explained_variance_clip(A, 0.95, spectrum="partial")
    err = np.linalg.norm(part - full) / np.linalg.norm(full)
    assert err < 1e-8
    assert np.linalg.eigvalsh(part).min() > 0  # PSD after repair


def test_laloux_partial_matches_full(rng):
    """Block-correlated data: a few eigenvalues far above the RMT
    ceiling; partial and full Laloux clips must agree."""
    n, b = 1024, 256
    rho = 0.6
    blocks = np.kron(np.eye(n // b), np.full((b, b), rho))
    cor = (1.0 - rho) * np.eye(n) + blocks
    variances = rng.uniform(0.5, 2.0, size=n)
    cov = cor * np.sqrt(np.outer(variances, variances))
    full = laloux_clip(cov, num_time_pts=40, spectrum="full")
    part = laloux_clip(cov, num_time_pts=40, spectrum="partial")
    err = np.linalg.norm(part - full) / np.linalg.norm(full)
    assert err < 1e-8


def test_lowrank_psd_container(rng):
    n = 64
    A = _damaged_kernel_cov(n, rng, damage=0.2)
    lr = explained_variance_clip_lowrank(A, target_variance_fraction=0.9)
    dense = lr.to_dense()
    # matvec/diagonal/trace agree with the dense materialisation
    X = rng.normal(size=(n, 3))
    np.testing.assert_allclose(
        np.asarray(lr.matvec(jnp.asarray(X))), dense @ X, rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(lr.matvec(jnp.asarray(X[:, 0]))),
        dense @ X[:, 0],
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(lr.diagonal()), np.diag(dense), rtol=1e-10
    )
    np.testing.assert_allclose(lr.trace(), np.trace(dense), rtol=1e-10)
    assert lr.shape == (n, n)
    # draws have the clipped covariance: projected variances match
    draws = np.asarray(lr.draw(jax.random.key(3), 20000))
    assert draws.shape == (20000, n)
    u = rng.normal(size=(n, 4))
    u /= np.linalg.norm(u, axis=0)
    sample_var = np.var(draws @ u, axis=0)
    true_var = np.einsum("nk,nm,mk->k", u, dense, u)
    np.testing.assert_allclose(sample_var, true_var, rtol=0.06)


def test_partial_clip_16k_implicit_operator():
    """65k-path 'done' check at n=16,384: clip an operator that is never
    materialised, against its analytically known spectrum.

    A = Q diag(s) Q' with Q the orthonormal DCT-II basis: matvecs are
    O(n log n) host FFTs, the true spectrum is `s` exactly, and the true
    clip is A_clip = Q diag(s_clip) Q'."""
    from scipy.fft import dct, idct

    n = 16_384
    i = np.arange(n)
    # exponentially decaying spectrum (smooth spatial kernel) + small
    # negative tail (damage): 95% of variance sits in the top ~45 modes
    s = 250.0 * np.exp(-i / 15.0)
    s[-n // 8 :] = -1e-3 * np.linspace(1.0, 2.0, n // 8)
    trace = float(s.sum())

    def matvec(X):
        Xh = np.asarray(X)
        squeeze = Xh.ndim == 1
        if squeeze:
            Xh = Xh[:, None]
        out = idct(s[:, None] * dct(Xh, axis=0, norm="ortho"), axis=0,
                   norm="ortho")
        return out[:, 0] if squeeze else out

    target = 0.95
    lr = explained_variance_clip_lowrank(
        matvec,
        n=n,
        trace=trace,
        target_variance_fraction=target,
        key=jax.random.key(5),
        k0=128,
    )
    # analytic ground truth
    csum = np.cumsum(s)
    r_true = int(np.nonzero(csum > target * trace)[0][0]) + 1
    assert lr.rank == r_true
    w_ritz = np.asarray(lr.gains) + np.asarray(lr.floor)[0]
    np.testing.assert_allclose(w_ritz, s[:r_true], rtol=1e-4)
    avg_true = (trace - s[:r_true].sum()) / (n - r_true)
    np.testing.assert_allclose(np.asarray(lr.floor)[0], avg_true, rtol=1e-4)

    # clipped-operator action matches the analytic clip on random probes
    s_clip = np.where(i < r_true, s, avg_true)
    probes = np.random.default_rng(11).normal(size=(n, 4))
    true_act = idct(
        s_clip[:, None] * dct(probes, axis=0, norm="ortho"),
        axis=0,
        norm="ortho",
    )
    got_act = np.asarray(lr.matvec(jnp.asarray(probes)))
    err = np.linalg.norm(got_act - true_act) / np.linalg.norm(true_act)
    assert err < 1e-4


def test_laloux_lowrank_callable_requires_diag():
    with pytest.raises(ValueError, match="diag are required"):
        laloux_clip_lowrank(lambda X: X, n=10)


def test_partial_clip_flat_spectrum_raises(rng):
    """A near-identity (flat-spectrum) matrix cannot be low-rank clipped:
    the adaptive loop must fail loudly, not silently truncate."""
    n = 256
    A = np.eye(n) + 1e-6 * _damaged_kernel_cov(n, rng)
    with pytest.raises(ValueError, match="max_rank"):
        explained_variance_clip_lowrank(
            A, target_variance_fraction=0.99, max_rank=64
        )
