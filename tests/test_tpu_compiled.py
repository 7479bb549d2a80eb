"""COMPILED-mode Pallas kernel parity on real TPU hardware.

The CPU suite exercises the Pallas kernels in interpret mode
(``ops/pallas/pairwise.py``); these tests pin the COMPILED Mosaic
lowering against the XLA path on an actual chip, making kernel
correctness a gating pytest check instead of a bench side-effect
(VERDICT r3 weak #7). Because ``tests/conftest.py`` forces the CPU
backend for the whole process (the oracle tests need f64), each test
shells out to a fresh interpreter that keeps the ambient TPU backend.

Opt-in: set ``GLOMAR_TPU_TESTS=1`` (the TPU is exclusive — these must
not race a bench run). Run:

    GLOMAR_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -v
"""

import os
import subprocess
import sys

import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("GLOMAR_TPU_TESTS") != "1",
        reason="TPU compiled-kernel tests are opt-in "
        "(GLOMAR_TPU_TESTS=1); the chip is exclusive",
    ),
]

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_on_tpu(script: str) -> str:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # ambient default (axon TPU tunnel)
    env["PYTHONPATH"] = (
        _REPO + os.pathsep + env.get("PYTHONPATH", "")
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=560,
        env=env,
        cwd=_REPO,
    )
    out = proc.stdout + proc.stderr
    if "NO_TPU" in out:
        pytest.skip("no TPU backend available in subprocess")
    assert proc.returncode == 0, out[-3000:]
    assert "PARITY_OK" in out, out[-3000:]
    return out


_COMMON = """
import numpy as np
import jax, jax.numpy as jnp
if jax.default_backend() != "tpu":
    print("NO_TPU"); raise SystemExit(0)
from glomargridding_tpu.config import enable_compile_cache
enable_compile_cache()
from glomargridding_tpu.ops.distances import sigma_rot_flat

def params(n, seed=5):
    rng = np.random.default_rng(seed)
    glat = np.sort(rng.uniform(-75, 75, n)).astype(np.float32)
    glon = rng.uniform(-180, 180, n).astype(np.float32)
    la, lo = jnp.radians(jnp.asarray(glat)), jnp.radians(jnp.asarray(glon))
    Lx = jnp.asarray(rng.uniform(800, 1600, n), jnp.float32)
    Ly = jnp.asarray(rng.uniform(400, 900, n), jnp.float32)
    th = jnp.asarray(rng.uniform(-0.6, 0.6, n), jnp.float32)
    sd = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32)
    s00, s01, _, s11 = sigma_rot_flat(Lx, Ly, th)
    sig = jnp.stack([s00, s01, s11], axis=-1)
    sqd = jnp.sqrt(s00 * s11 - s01 * s01)
    return la, lo, sig, sqd, sd
"""


def test_compiled_ellipse_assembly_parity():
    """Compiled Pallas assembly == XLA assembly at n=2048 (rel 1e-5)."""
    _run_on_tpu(
        _COMMON
        + """
from glomargridding_tpu.models.ellipse.covariance import (
    build_ellipse_covariance,
)
la, lo, sig, sqd, sd = params(2048)
a = build_ellipse_covariance(la, lo, sig, sqd, sd, v=1.5, use_pallas=True)
b = build_ellipse_covariance(la, lo, sig, sqd, sd, v=1.5, use_pallas=False)
err = float(jnp.max(jnp.abs(a - b))) / float(jnp.max(jnp.abs(b)))
print("rel err:", err)
assert err < 1e-5, err
print("PARITY_OK")
"""
    )


def test_compiled_matern_assembly_parity():
    """Compiled Pallas stationary Matern == jnp haversine+Matern."""
    _run_on_tpu(
        _COMMON
        + """
from glomargridding_tpu.ops.pallas import matern_covariance_pallas
from glomargridding_tpu.models.kernel_kriging import variogram_kernel
from glomargridding_tpu.ops.variogram import MaternVariogram
rng = np.random.default_rng(3)
n = 1500
glat = rng.uniform(-80, 80, n).astype(np.float32)
glon = rng.uniform(-180, 180, n).astype(np.float32)
a = matern_covariance_pallas(glat, glon, glat, glon,
                             nu=1.5, psill=1.2, range_km=1500.0)
k = variogram_kernel(
    MaternVariogram(psill=1.2, range=1500.0, nu=1.5),
    distance="haversine", variance=1.2,
)
b = k(jnp.radians(jnp.asarray(glat)), jnp.radians(jnp.asarray(glon)),
      jnp.radians(jnp.asarray(glat)), jnp.radians(jnp.asarray(glon)))
err = float(jnp.max(jnp.abs(a - b))) / float(jnp.max(jnp.abs(b)))
print("rel err:", err)
assert err < 2e-5, err
print("PARITY_OK")
"""
    )


def test_compiled_fused_matvec_parity():
    """Compiled fused symmetric matvec vs an f64 HOST reference
    (dense f32 covariance pulled to host, matvec in f64), banded and
    unbanded, through the public operator. The f64 oracle isolates the
    kernel's own error — comparing against the jnp wide path would
    measure that path's DEFAULT-precision (bf16-pass) matmul noise
    (~1e-3) instead."""
    _run_on_tpu(
        _COMMON
        + """
from glomargridding_tpu.models.ellipse.covariance import (
    build_ellipse_covariance,
    ellipse_covariance_operator,
)
n = 8192
la, lo, sig, sqd, sd = params(n)
rng = np.random.default_rng(0)
X = rng.normal(size=(n, 8)).astype(np.float32)
Xd = jnp.asarray(X)
for md in (None, 3000.0):
    dense = np.asarray(build_ellipse_covariance(
        la, lo, sig, sqd, sd, v=1.5, max_dist=md, use_pallas=False,
    ), dtype=np.float64)
    want = dense @ X.astype(np.float64)
    mv, n_op, tr = ellipse_covariance_operator(
        la, lo, sig, sqd, sd, v=1.5, store="stream", max_dist=md)
    got = np.asarray(mv(Xd))           # fused Pallas path (w <= 8)
    wide = np.asarray(mv(jnp.concatenate(
        [Xd, jnp.zeros((n, 56), jnp.float32)], axis=1)))[:, :8]
    scale = np.abs(want).max()
    err = np.abs(got - want).max() / scale
    err_wide = np.abs(wide - want).max() / scale
    print("md", md, "fused err:", err, "wide err:", err_wide)
    # fused dots run at HIGHEST precision -> near-f32 accuracy; the
    # wide path's default-precision matmul is the loose one
    assert err < 5e-5, (md, err)
    assert err_wide < 5e-3, (md, err_wide)
print("PARITY_OK")
"""
    )


def test_compiled_sym_bf16_store_parity():
    """Compiled symmetric-Pallas bf16 store (assemble='pallas',
    keep_pad) vs the jnp scan build at n=4096: same matvec result to
    bf16 accuracy against an f64 host oracle, and the padded store's
    extra rows/cols must be exact zeros."""
    _run_on_tpu(
        _COMMON
        + """
from glomargridding_tpu.models.ellipse.covariance import (
    build_ellipse_covariance,
    ellipse_covariance_operator,
)
n = 4096 - 64  # force a padded (4096, 4096) store
la, lo, sig, sqd, sd = params(n)
rng = np.random.default_rng(0)
X = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
dense = np.asarray(build_ellipse_covariance(
    la, lo, sig, sqd, sd, v=1.5, use_pallas=False,
), dtype=np.float64)
want = dense @ np.asarray(X, np.float64)
scale = np.abs(want).max()
for assemble in ("pallas", "scan"):
    mv, n_op, tr = ellipse_covariance_operator(
        la, lo, sig, sqd, sd, v=1.5, store="bf16", assemble=assemble)
    assert n_op == n
    err = np.abs(np.asarray(mv(X)) - want).max() / scale
    print(assemble, "err:", err)
    assert err < 1e-2, (assemble, err)  # bf16 mantissa floor
# padded store rows/cols are exact zeros (keep_pad contract)
mv, _, _ = ellipse_covariance_operator(
    la, lo, sig, sqd, sd, v=1.5, store="bf16", assemble="pallas")
A = mv.operands[0]
assert A.shape == (4096, 4096), A.shape
pad = np.asarray(A[n:, :].astype(jnp.float32))
padc = np.asarray(A[:, n:].astype(jnp.float32))
assert (pad == 0).all() and (padc == 0).all()
print("PARITY_OK")
"""
    )
