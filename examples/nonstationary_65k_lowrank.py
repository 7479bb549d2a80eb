"""Non-stationary 1-degree FULL-GLOBE covariance -> repair -> ensemble
with no f32 dense matrix ever materialised (n = 64,800).

A dense f32 Paciorek-Schervish covariance at this size is ~17 GB — more
than one chip's HBM, and far beyond the reference's dense-only path
(auto-downgrades to a pair LOOP above 10k points,
``ellipse/covariance.py:206-215``). Here:

  1. ``ellipse_covariance_operator(store="bf16")`` assembles the
     off-diagonal part block-by-block into a HALF-memory bf16 store
     (8.4 GB) with the exact diagonal kept f32 — matvecs are single MXU
     dispatches with f32 accumulation;
  2. ``explained_variance_clip_lowrank`` repairs PSD-ness from matvecs
     alone (randomized top-k), returning the factored LowRankPSD;
  3. the bf16 store is FREED, and kriging + a 100-member two-stage
     ensemble run straight off the factors (``models.lowrank``).

Measured (one v5e chip, 2026-08-18): operator assembly 3.2 s,
low-rank clip 1.8 s warm (trace preserved to 7e-8), kriging + 100
members 0.06 s warm (one-time compile on first run, persisted by the
compile cache; the diagonal obs error rides the m^3-free Woodbury
solve). Self-consistent to three digits: field RMSE vs model-drawn
truth 0.298 = member spread 0.297 = mean kriging uncertainty 0.296.
The reference cannot run this size at all.

Run: python examples/nonstationary_65k_lowrank.py
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

M_LAT, M_LON = 180, 360
N_OBS = 5000
N_MEMBERS = 100


def stage(name, t0):
    dt = time.perf_counter() - t0
    print(f"[{name:<38s}] {dt:7.2f}s", flush=True)
    return time.perf_counter()


def main():
    from glomargridding_tpu.config import enable_compile_cache

    enable_compile_cache()  # monthly reruns skip minutes of XLA compile
    lat = np.arange(-89.5, 90.0, 180.0 / M_LAT, dtype=np.float32)
    lon = np.arange(-179.5, 180.0, 360.0 / M_LON, dtype=np.float32)
    glat = np.repeat(lat, M_LON)
    glon = np.tile(lon, M_LAT)
    n = glat.shape[0]
    print(f"n = {n} grid cells, backend={jax.default_backend()}")

    # smooth synthetic ellipse fields (tropics stretch zonally, like
    # fitted SST parameter maps)
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
        la, lo, sig, sqd, jnp.asarray(stdev), v=1.5, store="bf16"
    )
    float(mv(jnp.ones((n,), jnp.float32))[0])  # sync the build
    t0 = stage(f"bf16 operator assembly ({n} pts, 8.4 GiB)", t0)

    psd = explained_variance_clip_lowrank(
        mv, n=n_op, trace=trace,
        target_variance_fraction=0.90,
        key=jax.random.key(1),
        k0=1024, max_rank=4096, n_iter=4, rank_multiple=128,
    )
    true_rank = psd.rank
    # pad to a fixed rank multiple: the adaptive clip returns a
    # different rank per month, and each distinct rank would recompile
    # the ensemble program; zero-gain columns are numerically inert
    psd = psd.pad_rank(256)
    float(psd.vectors[0, 0])
    t0 = stage(f"low-rank PSD repair (rank {true_rank}->{psd.rank})", t0)
    print(
        f"    trace preserved to "
        f"{abs(psd.trace() - trace) / trace:.2e}"
    )
    del mv  # frees the 8.4 GiB bf16 store before the ensemble

    rng = np.random.default_rng(7)
    idx = np.sort(rng.choice(n, N_OBS, replace=False))
    truth = np.asarray(psd.draw(jax.random.key(2), 1))[0]
    y = truth[idx] + 0.3 * rng.normal(size=N_OBS).astype(np.float32)
    # the (m,) diagonal — not np.diag: the m^2 form is a 100 MB upload
    E = np.full(N_OBS, 0.09, np.float32)

    res, members = lowrank_ensemble_step(
        psd, idx, y, E, jax.random.key(3), n_members=N_MEMBERS
    )
    float(members[-1, -1])
    t0 = stage(f"kriging + {N_MEMBERS} members (warm compile)", t0)

    # warm re-dispatch: the per-month production cost
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

    out_dir = os.environ.get("GLOMAR_SAVE_OUTPUTS")
    if out_dir:
        save_outputs(
            out_dir,
            field=np.asarray(res.field, np.float32),
            uncertainty=np.asarray(res.uncertainty, np.float32),
            member0=np.asarray(members[0], np.float32),
            truth=np.asarray(truth, np.float32),
            clip_gains=np.asarray(psd.gains, np.float32),
        )


def save_outputs(out_dir, **arrays):
    """Documentation-of-record: stored fields + rendered figure of the
    executed 65k run (the analog of the reference's executed notebook
    outputs, ``notebooks/Ellipse_to_grid.ipynb``)."""
    os.makedirs(out_dir, exist_ok=True)
    np.savez_compressed(
        os.path.join(out_dir, "nonstationary_65k_fields.npz"), **arrays
    )
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    lat = np.arange(-89.5, 90.0, 180.0 / M_LAT)
    lon = np.arange(-179.5, 180.0, 360.0 / M_LON)
    panels = [
        ("truth", "Model-drawn truth", "RdBu_r", True),
        ("field", "Kriged field (factored covariance)", "RdBu_r",
         True),
        ("uncertainty", "Kriging uncertainty", "Blues", False),
        ("member0", "Ensemble member 0", "RdBu_r", True),
    ]
    fig, axes = plt.subplots(2, 2, figsize=(11, 6), dpi=110)
    for ax, (key, title, cmap, centered) in zip(axes.ravel(), panels):
        f = arrays[key].reshape(M_LAT, M_LON)
        if centered:
            vmax = np.nanpercentile(np.abs(f), 99)
            kw = dict(vmin=-vmax, vmax=vmax)
        else:
            kw = dict(vmin=0.0)
        im = ax.pcolormesh(lon, lat, f, cmap=cmap, **kw)
        ax.set_title(title, fontsize=10, color="#333")
        ax.tick_params(labelsize=7, colors="#666")
        fig.colorbar(im, ax=ax, shrink=0.85).ax.tick_params(
            labelsize=7, colors="#666"
        )
    fig.suptitle(
        "1-degree full-globe non-stationary pipeline, n = 64,800 "
        "(executed on one TPU v5e; no dense covariance ever exists)",
        fontsize=11,
    )
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "nonstationary_65k.png"))
    print(f"outputs stored in {out_dir}")


if __name__ == "__main__":
    main()
