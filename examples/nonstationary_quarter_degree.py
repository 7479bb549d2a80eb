"""FULL half-degree-class (n = 259,200) non-stationary pipeline on ONE
chip: whole-grid MLE -> zero-storage covariance -> matvec-only PSD
repair -> factored 100-member ensemble.

Every stage that is impossible for the reference at this size runs
end-to-end here:

  1. whole-grid ellipse MLE at 259,200 points. The empirical
     correlation is LAZY (``EllipseBuilder(cor_mode="auto")``): the
     dense matrix would be 269 GB, so each fit chunk rebuilds its
     correlation rows inside the compiled program from the (T, n)
     normalised training samples — one (B, T) x (T, n) matmul. 254
     chunks of 1024 batched Nelder-Mead fits (the 2048 default would
     peak at 15.8 GB of (B, N) temps and OOM a 16 GB v5e; see
     ``compute_params``'s automatic cap). The stage checkpoints every
     few chunks (``checkpoint=``), so a preempted run resumes from
     the last saved chunk instead of refitting ~60-100 s of work;
  2. ``store="stream"``: Paciorek-Schervish covariance tiles are
     rebuilt from the fitted parameter fields inside every operator
     application under ``lax.scan`` — O(n * block) memory, 0 bytes
     stored (dense f32 would be 269 GB; even bf16 134 GB);
  3. the randomized PSD repair (``explained_variance_clip_lowrank``)
     sees only matvecs, and returns the covariance FACTORED
     (LowRankPSD, n*r floats = ~1 GB at rank 1024);
  4. kriging + a 100-member two-stage ensemble run off the factors
     through the Woodbury observation solve (diagonal obs error).

Measured (one v5e chip, warm compile cache, 2026-08-18; the remote
tunnel's run-to-run latency noise gives ranges over five runs):
training cube 6-65 s (device-resident — EllipseBuilder takes the
jax.Array, no 62 MB host round-trip; the spread is one-shot program
shipping over the tunnel), lazy correlation 0.4-5.9 s, whole-grid MLE
96-104 s fresh — or 0.6-1.5 s resumed from a completed checkpoint —
(259,104 of 259,200 fits converged; 32 grouped dispatches of
8 x 1024 fits), stream-operator warm-up 2-10 s, PSD repair 23-36 s
(rank 1152, trace to 2.4e-7; deflated warm widening + predicted rank
— was 38-42 s with joint re-iteration), kriging + 100 members 2-4 s
first dispatch / 0.08 s warm (diagonal obs-error vector -> Woodbury
route); field RMSE 0.378 = member spread 0.376 = mean kriging
uncertainty 0.379 (truth drawn from the model's own covariance).
First-ever run adds one-time XLA compiles (persisted by
``config.enable_compile_cache``).

Run: python examples/nonstationary_quarter_degree.py
(reference anchor: ellipse/covariance.py:206-215 — dense-only, auto-
downgrades to a pair loop above 10,000 points; estimate.py:151-180
materialises the dense empirical covariance)
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

from glomargridding_tpu.core.labeled import Coordinates
from glomargridding_tpu.models import lowrank_ensemble_step
from glomargridding_tpu.models.ellipse import EllipseBuilder, EllipseModel
from glomargridding_tpu.models.ellipse.covariance import (
    ellipse_covariance_operator,
)
from glomargridding_tpu.ops.covariance_tools import (
    explained_variance_clip_lowrank,
)
from glomargridding_tpu.ops.distances import sigma_rot_flat
from glomargridding_tpu.ops.sphere import SphericalHarmonicSampler

M_LAT, M_LON = 360, 720
T_TRAIN = 60
# e-folding ~1000 km (same training field as the 1-degree pipeline):
# the retained rank of the 0.90-variance clip depends on the ANGULAR
# spectrum, not the grid resolution, so this keeps the repair at rank
# ~700-900 — a 400 km-range field would demand rank >> 2048 and the
# (n, width) eigensolver blocks would not fit 16 GB at n = 259k
TRAIN_RANGE_KM = 3000.0
EARTH_KM = 6371.0
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

    # 1 -- training cube: exact stationary spherical-harmonic draws
    t0 = time.perf_counter()
    r = TRAIN_RANGE_KM / 3.0 / EARTH_KM
    sampler = SphericalHarmonicSampler(
        lambda ang: np.exp(-ang / r), 1.0, lat, lon,
        nugget=0.05, l_max=256,
    )
    # the cube STAYS on device: EllipseBuilder takes a jax.Array and
    # never round-trips the 62 MB through the host link
    cube = sampler.draw(jax.random.key(0), T_TRAIN).reshape(
        T_TRAIN, M_LAT, M_LON
    )
    float(cube[0, 0, 0])  # sync
    t0 = stage(f"training cube ({T_TRAIN} states, on device)", t0)

    # 2 -- lazy empirical correlation: no (n, n) matrix ever exists
    coords = Coordinates(
        {"time": np.arange(T_TRAIN), "latitude": lat, "longitude": lon}
    )
    builder = EllipseBuilder(cube, coords)  # auto -> lazy above 100k
    float(builder.cor[0, 0])  # sync (one on-demand row)
    t0 = stage("lazy empirical correlation (row build)", t0)

    # 3 -- whole-grid MLE: 259,200 batched fits, correlation rows
    # rebuilt per chunk from the training samples
    ellipse = EllipseModel(
        anisotropic=True, rotated=True, physical_distance=True,
        v=1.5, unit_sigma=True,
    )
    params = builder.compute_params(
        default_value=[-999.9, -999.9, -999.9, -999.9, -1, -1],
        matern_ellipse=ellipse,
        max_distance=6000.0,
        guesses=[2000.0, 2000.0, 0.0],
        bounds=[
            (300.0, 30000.0),
            (300.0, 30000.0),
            (-2.0 * np.pi, 2.0 * np.pi),
        ],
        tol=1e-3,
        chunk_size=1024,     # (B, N) fit temps: 2048 would OOM 16 GB
        max_train_cols=2048,  # ~1400 km window at this resolution
        # 8 chunks per jitted lax.scan dispatch: ~11% off the warm
        # chunk wall (driver-recorded) and 8x fewer tunnel RPCs
        dispatch_chunks=8,
        # the longest stage is RESUMABLE: a preempted run (spot VM,
        # OOM elsewhere in the job) continues from the last saved
        # chunk; a completed checkpoint reloads instantly
        checkpoint=os.environ.get(
            "GLOMAR_MLE_CHECKPOINT",
            "/tmp/glomar_quarter_deg_mle.npz",
        ),
    )
    Lx = params["Lx"].values.ravel().astype(np.float32)
    Ly = params["Ly"].values.ravel().astype(np.float32)
    theta = params["theta"].values.ravel().astype(np.float32)
    stdev = (
        params["standard_deviation"].values.ravel().astype(np.float32)
    )
    qc = params["qc_code"].values.ravel()
    good = (Lx > 0) & (qc != 9)
    n_fit = int(good.sum())
    t0 = stage(f"whole-grid MLE ({n_fit} converged fits)", t0)

    # failed fits (if any) fall back to the global median ellipse so
    # the operator keeps every grid cell
    if n_fit < n:
        for arr in (Lx, Ly, theta, stdev):
            arr[~good] = np.median(arr[good])
        print(f"    {n - n_fit} failed fits -> median-ellipse fallback")

    la = jnp.radians(jnp.asarray(glat))
    lo = jnp.radians(jnp.asarray(glon))
    s00, s01, _, s11 = sigma_rot_flat(
        jnp.asarray(Lx), jnp.asarray(Ly), jnp.asarray(theta)
    )
    sig = jnp.stack([s00, s01, s11], axis=-1)
    sqd = jnp.sqrt(s00 * s11 - s01 * s01)

    # 4 -- zero-storage streamed operator over the FITTED fields.
    # GLOMAR_MAX_DIST_KM (default 3000) engages the BANDED stream:
    # latitude-gap certificates skip provably-zero tiles beyond the
    # haversine cutoff, cutting every repair sweep's transcendental
    # work to the band fraction (~2x wide / ~3x narrow at this n —
    # docs/perf.md round-4 section). Set it empty or to 0 to disable
    # the cutoff (full-dense covariance semantics) — a literal 0 km
    # cutoff would zero every off-diagonal entry, never what a user
    # means by it.
    md_env = os.environ.get("GLOMAR_MAX_DIST_KM", "3000")
    max_dist = float(md_env) if md_env else None
    if max_dist is not None and max_dist <= 0.0:
        max_dist = None
    mv, n_op, trace = ellipse_covariance_operator(
        la, lo, sig, sqd, jnp.asarray(stdev), v=1.5, store="stream",
        max_dist=max_dist,
    )
    float(mv(jnp.ones((n,), jnp.float32))[0])  # compile + one sweep
    t0 = stage(
        f"stream operator (banded at {max_dist} km, 0 bytes)"
        if max_dist
        else "stream operator (1 warm-up sweep, 0 bytes)",
        t0,
    )

    # 5 -- matvec-only PSD repair, factored result
    psd = explained_variance_clip_lowrank(
        mv, n=n_op, trace=trace,
        target_variance_fraction=0.90,
        key=jax.random.key(1),
        # max_rank 2048: a (259200, 4096) eigensolver block is 4.4 GB
        # and the stage's ~5 live blocks would exceed HBM
        k0=1024, max_rank=2048, n_iter=3, rank_multiple=128,
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

    # 6 -- kriging + two-stage ensemble off the factors (Woodbury)
    rng = np.random.default_rng(7)
    idx = np.sort(rng.choice(n, N_OBS, replace=False))
    truth = np.asarray(psd.draw(jax.random.key(2), 1))[0]
    y = truth[idx] + 0.3 * rng.normal(size=N_OBS).astype(np.float32)
    # the (m,) DIAGONAL, not np.diag(...): uploading m^2 zeros is
    # 100 MB over the host->device link at m = 5000
    E = np.full(N_OBS, 0.09, np.float32)

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

    out_dir = os.environ.get("GLOMAR_SAVE_OUTPUTS")
    if out_dir:
        save_outputs(
            out_dir,
            field=np.asarray(res.field, np.float32),
            uncertainty=np.asarray(res.uncertainty, np.float32),
            member0=np.asarray(members[0], np.float32),
            truth=np.asarray(truth, np.float32),
            Lx=Lx,
            theta=theta,
        )


def save_outputs(out_dir, **arrays):
    """Documentation-of-record for the executed 259,200-cell run: the
    kriged fields PLUS the fitted non-stationary ellipse parameter
    fields (the stage the reference cannot reach at this n — its dense
    empirical covariance would be 269 GB, ``estimate.py:151-180``, and
    its covariance assembly refuses >10k points,
    ``ellipse/covariance.py:206-215``). Analog of the reference's
    executed ``notebooks/Ellipse_to_grid.ipynb`` outputs."""
    os.makedirs(out_dir, exist_ok=True)
    np.savez_compressed(
        os.path.join(out_dir, "nonstationary_259k_fields.npz"), **arrays
    )
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    lat = np.linspace(-89.75, 89.75, M_LAT)
    lon = np.linspace(-179.75, 179.75, M_LON)
    panels = [
        ("truth", "Model-drawn truth", "RdBu_r", "centered"),
        ("field", "Kriged field (factored covariance)", "RdBu_r",
         "centered"),
        ("member0", "Ensemble member 0", "RdBu_r", "centered"),
        ("uncertainty", "Kriging uncertainty", "Blues", "pos"),
        ("Lx", "Fitted ellipse Lx (km)", "viridis", "pos"),
        ("theta", "Fitted ellipse rotation (rad)", "twilight",
         "raw"),
    ]
    fig, axes = plt.subplots(2, 3, figsize=(15.5, 6), dpi=110)
    for ax, (key, title, cmap, scale) in zip(axes.ravel(), panels):
        f = arrays[key].reshape(M_LAT, M_LON)
        if scale == "centered":
            vmax = np.nanpercentile(np.abs(f), 99)
            kw = dict(vmin=-vmax, vmax=vmax)
        elif scale == "pos":
            kw = dict(vmin=0.0, vmax=np.nanpercentile(f, 99))
        else:
            kw = {}
        im = ax.pcolormesh(lon, lat, f, cmap=cmap, **kw)
        ax.set_title(title, fontsize=10, color="#333")
        ax.tick_params(labelsize=7, colors="#666")
        fig.colorbar(im, ax=ax, shrink=0.85).ax.tick_params(
            labelsize=7, colors="#666"
        )
    fig.suptitle(
        "0.5-degree full-globe non-stationary pipeline, n = 259,200 "
        "(executed on one TPU v5e; whole-grid MLE + zero-storage "
        "streamed covariance)",
        fontsize=11,
    )
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "nonstationary_259k.png"))
    print(f"outputs stored in {out_dir}")


if __name__ == "__main__":
    main()
