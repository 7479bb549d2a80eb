"""Quarter-degree (0.25deg, n = 259,200) non-stationary pipeline on ONE
chip with ZERO covariance storage.

At this size even the bf16 store is impossible (259k^2 bf16 = 134 GB),
let alone the reference's dense f32 path (269 GB; its pair LOOP above
10k points would take days). Here ``store="stream"`` rebuilds
Paciorek-Schervish covariance tiles from the kernel inside every
operator application under ``lax.scan`` — O(n * block) memory — so:

  1. the randomized PSD repair (``explained_variance_clip_lowrank``)
     sees only matvecs: ~(n_iter + 2) full-kernel sweeps;
  2. the repaired covariance comes back FACTORED (LowRankPSD, n*r
     floats = 265 MB at rank 256);
  3. kriging + a 100-member two-stage ensemble run off the factors.

Measured (one v5e chip, 2026-08-17, warm compile cache): warm-up
sweep ~2 min (synthetic-field build + first sweep), matvec-only PSD
repair 17 s (trace to 1.4e-07; the fused x^v K_v streamed tiles cut
this from round 2's 75 s), kriging + 100 members 0.63 s/step warm;
member spread 0.302 vs posterior kriging uncertainty 0.302.

Run: python examples/nonstationary_quarter_degree.py
(reference anchor: ellipse/covariance.py:206-215 — dense-only, auto-
downgrades to a pair loop above 10,000 points)
"""

import os
import sys
import time

import numpy as np

try:  # prefer the installed package; fall back to a repo checkout
    import glomargridding_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from glomargridding_tpu.models import lowrank_ensemble_step
from glomargridding_tpu.models.ellipse.covariance import (
    ellipse_covariance_operator,
)
from glomargridding_tpu.ops.covariance_tools import (
    explained_variance_clip_lowrank,
)
from glomargridding_tpu.ops.distances import sigma_rot_flat

M_LAT, M_LON = 360, 720
N_OBS = 5000
N_MEMBERS = 100


def stage(name, t0):
    dt = time.perf_counter() - t0
    print(f"[{name:<44s}] {dt:7.2f}s", flush=True)
    return time.perf_counter()


def main():
    from glomargridding_tpu.config import enable_compile_cache

    enable_compile_cache()  # monthly reruns skip minutes of XLA compile
    lat = np.linspace(-89.75, 89.75, M_LAT).astype(np.float32)
    lon = np.linspace(-179.75, 179.75, M_LON).astype(np.float32)
    glat = np.repeat(lat, M_LON)
    glon = np.tile(lon, M_LAT)
    n = glat.shape[0]
    print(f"n = {n} grid cells, backend={jax.default_backend()}")

    coslat = np.cos(np.radians(glat))
    Lx = (2000.0 + 1500.0 * coslat**2).astype(np.float32)
    Ly = (1500.0 + 600.0 * coslat).astype(np.float32)
    theta = (0.3 * np.sin(np.radians(2.0 * glat))).astype(np.float32)
    stdev = (0.6 + 0.5 * coslat).astype(np.float32)

    la = jnp.radians(jnp.asarray(glat))
    lo = jnp.radians(jnp.asarray(glon))
    s00, s01, _, s11 = sigma_rot_flat(
        jnp.asarray(Lx), jnp.asarray(Ly), jnp.asarray(theta)
    )
    sig = jnp.stack([s00, s01, s11], axis=-1)
    sqd = jnp.sqrt(s00 * s11 - s01 * s01)

    t0 = time.perf_counter()
    mv, n_op, trace = ellipse_covariance_operator(
        la, lo, sig, sqd, jnp.asarray(stdev), v=1.5, store="stream"
    )
    float(mv(jnp.ones((n,), jnp.float32))[0])  # compile + one sweep
    t0 = stage("stream operator (1 warm-up sweep, 0 bytes)", t0)

    psd = explained_variance_clip_lowrank(
        mv, n=n_op, trace=trace,
        target_variance_fraction=0.90,
        key=jax.random.key(1),
        k0=1024, max_rank=4096, n_iter=3, rank_multiple=128,
    )
    true_rank = psd.rank
    psd = psd.pad_rank(256)
    float(psd.vectors[0, 0])
    t0 = stage(
        f"matvec-only PSD repair (rank {true_rank}->{psd.rank})", t0
    )
    print(
        f"    trace preserved to {abs(psd.trace() - trace) / trace:.2e}"
    )

    rng = np.random.default_rng(7)
    idx = np.sort(rng.choice(n, N_OBS, replace=False))
    truth = np.asarray(psd.draw(jax.random.key(2), 1))[0]
    y = truth[idx] + 0.3 * rng.normal(size=N_OBS).astype(np.float32)
    E = np.diag(np.full(N_OBS, 0.09, np.float32))

    res, members = lowrank_ensemble_step(
        psd, idx, y, E, jax.random.key(3), n_members=N_MEMBERS
    )
    float(members[-1, -1])
    t0 = stage(f"kriging + {N_MEMBERS} members (incl. compile)", t0)

    res, members = lowrank_ensemble_step(
        psd, idx, y, E, jax.random.key(4), n_members=N_MEMBERS
    )
    float(members[-1, -1])
    t0 = stage("kriging + members (warm)", t0)

    rmse = float(np.sqrt(np.mean((np.asarray(res.field) - truth) ** 2)))
    spread = float(
        (np.asarray(members) - np.asarray(res.field)).std(axis=0).mean()
    )
    print(
        f"    field RMSE vs truth {rmse:.3f}, member spread {spread:.3f},"
        f" mean kriging uncertainty {float(res.uncertainty.mean()):.3f}"
    )


if __name__ == "__main__":
    main()
