r"""Sharded non-stationary (ellipse) covariance assembly.

A 1-degree non-stationary covariance is ~17 GB in f32 — beyond one v5e.
Row-blocks of the Paciorek-Schervish matrix are embarrassingly parallel:
every device holds the full (small) parameter vectors and assembles ONLY
its slice of rows, so the matrix exists only as a row-sharded array.
Composed with ``parallel.linalg.sharded_cholesky`` and row-sharded
``L @ z`` draws this gives the full non-stationary ensemble pipeline at
pod scale (stationary kernels should prefer the exact spectral sampler
in ``ops.sphere``, which needs no matrix at all).
"""

import jax
from jax import shard_map
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.ellipse.covariance import ellipse_covariance_block
from ..ops.distances import sigma_rot_flat
from ..types import DeltaXMethod


def sharded_ellipse_covariance(
    mesh,
    Lx,
    Ly,
    theta,
    stdev,
    lats_deg,
    lons_deg,
    v: float,
    delta_x_method: DeltaXMethod = "Modified_Met_Office",
    max_dist: float | None = None,
    axis: str = "grid",
):
    """Row-sharded N x N Paciorek-Schervish covariance over the mesh.

    Inputs are the per-point (already compressed/unmasked) parameter and
    coordinate vectors, N divisible by the mesh axis size. Returns the
    covariance (diag(stdev^2) included) sharded as P(axis, None).
    """
    n = len(lats_deg)
    n_dev = mesh.shape[axis]
    if n % n_dev != 0:
        raise ValueError(f"N={n} must be divisible by axis size {n_dev}")

    la = jnp.radians(jnp.asarray(lats_deg))
    lo = jnp.radians(jnp.asarray(lons_deg))
    s00, s01, _, s11 = sigma_rot_flat(
        jnp.asarray(Lx), jnp.asarray(Ly), jnp.asarray(theta)
    )
    sig_flat = jnp.stack([s00, s01, s11], axis=-1)
    sqrt_dets = jnp.sqrt(s00 * s11 - s01 * s01)
    sg = jnp.asarray(stdev, sig_flat.dtype)

    def local(la_rows, lo_rows, sig_rows, sd_rows, sg_rows,
              la_all, lo_all, sig_all, sd_all, sg_all):
        block = ellipse_covariance_block(
            la_rows, lo_rows, sig_rows, sd_rows, sg_rows,
            la_all, lo_all, sig_all, sd_all, sg_all,
            v=v,
            delta_x_method=delta_x_method,
            max_dist=0.0 if max_dist is None else float(max_dist),
            use_max_dist=max_dist is not None,
        )
        # local diagonal slice: global row index = local offset + shard
        me = jax.lax.axis_index(axis)
        rows_per_dev = la_rows.shape[0]
        row_ids = me * rows_per_dev + jnp.arange(rows_per_dev)
        block = block + (
            (jnp.arange(la_all.shape[0])[None, :] == row_ids[:, None])
            * (sg_rows**2)[:, None]
        )
        return block

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(axis), P(axis), P(axis), P(axis), P(axis),
            P(), P(), P(), P(), P(),
        ),
        out_specs=P(axis, None),
    )
    shard_rows = NamedSharding(mesh, P(axis))
    args_rows = [
        jax.device_put(a, shard_rows)
        for a in (la, lo, sig_flat, sqrt_dets, sg)
    ]
    return jax.jit(mapped)(*args_rows, la, lo, sig_flat, sqrt_dets, sg)


def sharded_state_draws(mesh, key, L, n_members: int, axis: str = "grid"):
    """(n_members, N) draws of N(0, L L') with L row-sharded.

    z is replicated; each device computes its row slice of L @ z — one
    local MXU matmul, no collectives. Output is sharded P(None, axis).
    """
    n = L.shape[0]

    def local(L_rows, z):
        return (L_rows @ z).T  # (members, rows)

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(None, axis),
    )
    z = jax.random.normal(key, (n, n_members), L.dtype)
    return jax.jit(mapped)(L, z)
