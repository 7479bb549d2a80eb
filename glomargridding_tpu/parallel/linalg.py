r"""Distributed dense linear algebra over a device mesh.

XLA has no sharded Cholesky: factorising a sharded SPD matrix all-gathers
it onto every device, so a dense factor is limited by ONE chip's HBM
(~30k f32 states on a 16 GB v5e). This module implements a right-looking
blocked Cholesky inside ``shard_map``: the matrix lives as row-blocks
sharded over the mesh axis and never exists whole on any device.

Per block-column j:

1. the current row-block j is broadcast (a one-hot ``psum`` — only the
   owner contributes);
2. every device factorises the tiny diagonal tile (replicated compute)
   and triangular-solves ITS OWN row tiles of the panel column;
3. the panel column is broadcast the same way and every device applies
   the trailing rank-nb update to its rows (one local matmul on the MXU).

Total communication is 2 n^2 elements spread over B steps — the same
volume as one all-gather of the matrix, but the peak per-device memory
is n^2 / n_devices + O(n * nb). With stationary kernels prefer
``ops.sphere`` (no factor at all); this is the path for NON-stationary
covariances too big for one chip.
"""

import jax
from jax import shard_map
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax.sharding import NamedSharding, PartitionSpec as P


def sharded_cholesky(mesh, A, n_blocks: int | None = None, axis: str = "grid"):
    """Lower Cholesky factor of a row-sharded SPD matrix.

    `A` is (n, n) with rows shardable over the mesh `axis` (n divisible
    by n_blocks, n_blocks divisible by the axis size). Returns L (lower
    triangular, same sharding). The strict upper triangle of the result
    is zeroed.
    """
    n = A.shape[0]
    n_dev = mesh.shape[axis]
    if n_blocks is None:
        n_blocks = max(n_dev, min(32, n // 128 if n >= 128 else n_dev))
        n_blocks = max(n_dev, (n_blocks // n_dev) * n_dev)
    if n % n_blocks != 0 or n_blocks % n_dev != 0:
        raise ValueError(
            f"n={n} must divide into n_blocks={n_blocks} divisible by the "
            f"axis size {n_dev}"
        )
    nb = n // n_blocks
    blocks_per_dev = n_blocks // n_dev

    def local_chol(a_local):
        # a_local: (blocks_per_dev, nb, n) — this device's row blocks
        me = jax.lax.axis_index(axis)

        def owner_of(j):
            return j // blocks_per_dev

        a = a_local

        for j in range(n_blocks):
            own_j = owner_of(j) == me
            j_local = j % blocks_per_dev
            # broadcast current row-block j (one-hot psum)
            contrib = jnp.where(own_j, a[j_local], jnp.zeros_like(a[0]))
            row_j = jax.lax.psum(contrib, axis)  # (nb, n)

            d = row_j[:, j * nb : (j + 1) * nb]
            L_jj = jnp.linalg.cholesky(d)

            # finalise row j on its owner: columns < j keep previous L,
            # diagonal tile becomes L_jj, right of diagonal zeroed.
            row_final = jnp.concatenate(
                [
                    row_j[:, : j * nb],
                    L_jj,
                    jnp.zeros((nb, n - (j + 1) * nb), a.dtype),
                ],
                axis=1,
            )
            a = a.at[j_local].set(
                jnp.where(own_j, row_final, a[j_local])
            )

            if j == n_blocks - 1:
                continue

            # each device solves its own panel tiles L_ij (i > j):
            # L_ij = A_ij L_jj^{-T}
            my_block_ids = me * blocks_per_dev + jnp.arange(blocks_per_dev)
            tiles = a[:, :, j * nb : (j + 1) * nb]  # (bpd, nb, nb)
            solved = jax.vmap(
                lambda t: jsl.solve_triangular(
                    L_jj, t.T, lower=True
                ).T
            )(tiles)
            is_below = (my_block_ids > j)[:, None, None]
            new_tiles = jnp.where(is_below, solved, tiles)
            a = a.at[:, :, j * nb : (j + 1) * nb].set(new_tiles)

            # broadcast the full panel column (B*nb, nb): each device
            # contributes its below-j tiles
            panel_contrib = jnp.where(
                is_below, new_tiles, jnp.zeros_like(new_tiles)
            ).reshape(blocks_per_dev * nb, nb)
            # order by global block id: scatter into (n, nb)
            panel_full = jnp.zeros((n, nb), a.dtype)
            start = (me * blocks_per_dev * nb).astype(jnp.int32)
            panel_full = jax.lax.dynamic_update_slice(
                panel_full,
                panel_contrib,
                (start, jnp.asarray(0, start.dtype)),
            )
            panel_full = jax.lax.psum(panel_full, axis)  # (n, nb)

            # trailing update on my rows i > j:
            # A_i,(j+1:) -= L_ij @ panel[(j+1):, :].T
            trail = panel_full[(j + 1) * nb :, :]  # (n - (j+1)nb, nb)
            update = jnp.einsum(
                "bik,mk->bim", new_tiles, trail
            )  # (bpd, nb, n-(j+1)nb)
            masked_update = jnp.where(
                is_below, update, jnp.zeros_like(update)
            )
            a = a.at[:, :, (j + 1) * nb :].add(-masked_update)

        return a

    sharding = NamedSharding(mesh, P(axis, None))
    A_blocks = jax.device_put(
        jnp.asarray(A).reshape(n_blocks, nb, n), NamedSharding(mesh, P(axis))
    )
    mapped = shard_map(
        local_chol, mesh=mesh, in_specs=P(axis), out_specs=P(axis)
    )
    L_blocks = jax.jit(mapped)(A_blocks)
    L = L_blocks.reshape(n, n)
    # strict upper triangle already zeroed per-row at finalisation
    return jax.device_put(L, sharding)
