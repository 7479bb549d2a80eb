"""Headline benchmark: 1-degree global kriging on one TPU chip.

North-star config (BASELINE.md): N ~ 65k grid cells (180 x 360), 5k
observed boxes, full observation-error covariance. Timed section = what
the baseline defines as "kriging wall-time": covariance build (C_obs and
C_cross from the Matern kernel — the dense M x M grid covariance is never
materialised), Cholesky factorisation, bordered ordinary-kriging solve,
uncertainty + constraint-mask diagonals.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}
vs_baseline is (10 s north-star target) / measured, so > 1 beats the
target.
"""

import json
import time

import numpy as np


def build_benchmark(m_lat=180, m_lon=360, n_obs=5000, n_members=100):
    import jax
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl

    dtype = jnp.float32

    lat = jnp.arange(-89.5, 90.0, 180.0 / m_lat, dtype=dtype)
    lon = jnp.arange(-179.5, 180.0, 360.0 / m_lon, dtype=dtype)
    glat = jnp.repeat(lat, m_lon)
    glon = jnp.tile(lon, m_lat)
    m = glat.shape[0]

    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        np.sort(rng.choice(m, size=n_obs, replace=False)).astype(np.int32)
    )
    y = jnp.asarray(rng.normal(size=n_obs).astype(np.float32))
    err_diag = jnp.asarray(
        (0.1 + 0.05 * rng.random(n_obs)).astype(np.float32)
    )

    # Matern nu=0.5 (exponential; the HadSST4 kriging default), sklearn
    # convention: corr = exp(-sqrt(2*0.5) d / range) = exp(-d/range).
    psill = dtype(1.2)
    rng_km = dtype(1200.0)
    earth = dtype(2.0 * 6371.0)

    def kernel_block(la1, lo1, la2, lo2):
        """Covariance tile from coordinates (radians)."""
        a = (
            jnp.sin((la1[:, None] - la2[None, :]) / 2.0) ** 2
            + jnp.cos(la1[:, None])
            * jnp.cos(la2[None, :])
            * jnp.sin((lo1[:, None] - lo2[None, :]) / 2.0) ** 2
        )
        d = earth * jnp.arcsin(jnp.sqrt(jnp.clip(a, 0.0, 1.0)))
        return psill * jnp.exp(-d / rng_km)

    la = jnp.radians(glat)
    lo = jnp.radians(glon)

    # Grid columns are processed in blocks under lax.scan: each step
    # builds its C_cross tile straight from the kernel, triangular-solves
    # it, and reduces its slice of the diagonals — the full n x M cross
    # matrix (and XLA's 20+ GB of triangular-solve temps for 64.8k RHS)
    # never exists.
    n_blocks = 16
    block = m // n_blocks
    la_b = la.reshape(n_blocks, block)
    lo_b = lo.reshape(n_blocks, block)

    @jax.jit
    def kriging_step(la_b, lo_b, idx, y, err_diag):
        la_o = la_b.reshape(-1)[idx]
        lo_o = lo_b.reshape(-1)[idx]
        K = kernel_block(la_o, lo_o, la_o, lo_o) + jnp.diag(err_diag)

        # One n x n Cholesky; per block only ONE triangular solve with B
        # RHS is needed: field and colsum ride precomputed n-vectors
        # (w = K^{-1}y, u = K^{-1}1), and diag(Cc' K^{-1} Cc) = column
        # norms of L^{-1} Cc. Halves the M-RHS triangular work vs a
        # cho_solve per block.
        L = jnp.linalg.cholesky(K)
        factor = (L, True)
        ones = jnp.ones((idx.shape[0],), la_b.dtype)
        u = jsl.cho_solve(factor, ones)
        w = jsl.cho_solve(factor, y)
        s = jnp.sum(u)
        uy = u @ y

        def per_block(_, inputs):
            la_blk, lo_blk = inputs
            Cc = kernel_block(la_o, lo_o, la_blk, lo_blk)  # (n, B)
            t = u @ Cc
            lam = (t - 1.0) / s
            field = w @ Cc - lam * uy
            U = jsl.solve_triangular(L, Cc, lower=True)
            sv = jnp.einsum("nb,nb->b", U, U)
            wc = sv - lam * t
            uncert2 = psill - (wc + lam) - lam
            cmask = sv / psill
            return None, (field, uncert2, cmask)

        _, (field, uncert2, cmask) = jax.lax.scan(
            per_block, None, (la_b, lo_b)
        )
        return (
            field.reshape(-1),
            uncert2.reshape(-1),
            cmask.reshape(-1),
        )

    # draws/sec: vmapped L@z perturbation ensemble from the obs system,
    # blocked over grid columns like the solve.
    @jax.jit
    def ensemble_step(la_b, lo_b, idx, y, err_diag, key):
        la_o = la_b.reshape(-1)[idx]
        lo_o = lo_b.reshape(-1)[idx]
        K = kernel_block(la_o, lo_o, la_o, lo_o) + jnp.diag(err_diag)
        L_obs = jnp.linalg.cholesky(K)
        z = jax.random.normal(
            key, (n_members, idx.shape[0]), la_b.dtype
        )
        sim_obs = z @ L_obs.T  # (members, n)
        # Solve once against the (n, members) RHS; each block is then a
        # pure MXU matmul S @ Cc — no M-RHS triangular solves at all.
        S = jsl.cho_solve((L_obs, True), sim_obs.T).T  # (members, n)

        def per_block(_, inputs):
            la_blk, lo_blk = inputs
            Cc = kernel_block(la_o, lo_o, la_blk, lo_blk)
            return None, S @ Cc  # (members, B)

        _, blocks = jax.lax.scan(per_block, None, (la_b, lo_b))
        # (n_blocks, members, B) -> (members, M)
        return jnp.transpose(blocks, (1, 0, 2)).reshape(n_members, -1)

    return kriging_step, ensemble_step, (la_b, lo_b, idx, y, err_diag)


def _run_once():
    import jax

    kriging_step, ensemble_step, args = build_benchmark()

    # warm-up (compile)
    out = kriging_step(*args)
    jax.block_until_ready(out)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = kriging_step(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    # The remote-device link can fault transiently; one retry protects
    # the recorded metric.
    try:
        value = _run_once()
    except Exception:
        time.sleep(20)
        value = _run_once()

    baseline_target_s = 10.0
    print(
        json.dumps(
            {
                "metric": (
                    "kriging wall-time, 64.8k grid / 5k obs "
                    "(cov build + Cholesky + solve + uncertainty)"
                ),
                "value": round(value, 4),
                "unit": "s",
                "vs_baseline": round(baseline_target_s / value, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
