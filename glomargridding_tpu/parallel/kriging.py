r"""Sharded kriging pipelines over a device mesh.

The scaling pattern (SURVEY.md §2.3): the observation system K = C_obs + E
is small (n ~ thousands) and replicated; everything sized by the output
grid M (C_cross columns, field, uncertainty, simulated states) is sharded
over the ``grid`` mesh axis; ensemble members are sharded over ``ens``.
One Cholesky of K is computed once (replicated); each device then solves
its own column block of :math:`V = K^{-1} C_{cross}` and reduces its own
slice of the uncertainty diagonal — there is NO cross-device traffic in
the solve beyond the initial broadcast, which is the ideal layout for ICI.

State draws ``z @ L.T`` keep members on ``ens`` and grid on ``grid`` so
the matmul contracts locally and XLA inserts the reduce-scatter it needs.
"""

from functools import partial

import jax
from jax import shard_map
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.kriging import _ordinary_core


def _shardings(mesh):
    return {
        "repl": NamedSharding(mesh, P()),
        "grid_vec": NamedSharding(mesh, P("grid")),
        "cross": NamedSharding(mesh, P(None, "grid")),
        "cov_rows": NamedSharding(mesh, P("grid", None)),
        "members": NamedSharding(mesh, P("ens", "grid")),
        "ens_vec": NamedSharding(mesh, P("ens")),
    }


def sharded_ordinary_kriging(mesh, covariance, idx, obs, error_cov=None):
    """Ordinary kriging with the output grid sharded over the mesh.

    `covariance` is the dense M x M grid covariance (rows sharded),
    `idx`/`obs` the observed gridboxes and values. Returns
    (field, uncertainty^2, constraint_mask) each sharded over ``grid``.
    """
    sh = _shardings(mesh)
    cov = jax.device_put(jnp.asarray(covariance), sh["cov_rows"])
    idx = jax.device_put(jnp.asarray(idx), sh["repl"])
    y = jax.device_put(jnp.asarray(obs, cov.dtype), sh["repl"])
    E = (
        None
        if error_cov is None
        else jax.device_put(jnp.asarray(error_cov, cov.dtype), sh["repl"])
    )

    @partial(
        jax.jit,
        out_shardings=(sh["grid_vec"], sh["grid_vec"], sh["grid_vec"]),
    )
    def step(cov, idx, y, E):
        K = cov[idx[:, None], idx[None, :]]
        if E is not None:
            K = K + E
        C_cross = cov[idx, :]
        C_diag = jnp.diagonal(cov)
        field, uncert2, cmask, *_ = _ordinary_core(K, C_cross, C_diag, y)
        return field, uncert2, cmask

    return step(cov, idx, y, E)


def ensemble_kriging_step(
    mesh,
    key,
    covariance,
    error_cov,
    idx,
    obs,
    n_members: int,
    n_blocks: int | None = None,
):
    """Full stochastic-kriging ensemble step, sharded over (grid, ens).

    The M x M grid covariance stays ROW-SHARDED end to end: it is
    factorised by the distributed blocked Cholesky
    (``parallel.linalg.make_sharded_cholesky`` — no device ever holds the
    full matrix or the full factor, peak per-device memory ~ M^2/n_dev),
    and state draws apply the sharded factor locally (each device
    computes its row slice of L @ z, members sharded over ``ens``). Only
    the small observation system K = C_obs + E is replicated. Returns
    (members (n_members, M), field (M,), uncert2 (M,)). Both `covariance`
    and `error_cov` must be symmetric positive-definite (their Cholesky
    factors drive the draws).

    This is the framework's "training step" analog — the full production
    computation for one month of a HadCRUT-style ensemble.
    """
    from .linalg import make_sharded_cholesky, resolve_blocks_padded

    if n_members % mesh.shape["ens"] != 0:
        raise ValueError(
            f"n_members={n_members} must be divisible by the ens axis "
            f"size {mesh.shape['ens']}"
        )
    sh = _shardings(mesh)
    m_true = covariance.shape[0]
    n_grid = mesh.shape["grid"]
    # Arbitrary grid sizes (ocean-masked grids): pad the covariance to
    # the block grid with an IDENTITY tail — SPD is preserved, the
    # factor's tail rows are e_i, and every output is sliced back to
    # m_true below.
    n_blocks, m = resolve_blocks_padded(m_true, n_grid, n_blocks)
    cov_arr = jnp.asarray(covariance)
    if m != m_true:
        pad = m - m_true
        cov_arr = jnp.pad(cov_arr, ((0, pad), (0, pad)))
        tail = jnp.arange(m_true, m)
        cov_arr = cov_arr.at[tail, tail].set(1.0)
    nb = m // n_blocks

    cov_blocks = jax.device_put(
        cov_arr.reshape(n_blocks, nb, m),
        NamedSharding(mesh, P("grid")),
    )
    E = jax.device_put(jnp.asarray(error_cov, cov_blocks.dtype), sh["repl"])
    idx = jax.device_put(jnp.asarray(idx), sh["repl"])
    y = jax.device_put(jnp.asarray(obs, cov_blocks.dtype), sh["repl"])

    chol = make_sharded_cholesky(mesh, m, n_blocks, axis="grid")

    # sharded draws: rows of L stay local; z is replicated over grid and
    # sharded over ens, so each device's matmul is its (rows, m) x
    # (m, members_local) slice — no collectives in the draw at all.
    def _local_draws(L_rows, z):
        return L_rows.reshape(-1, m) @ z  # (rows_local, members_local)

    draws = shard_map(
        _local_draws,
        mesh=mesh,
        in_specs=(P("grid"), P(None, "ens")),
        out_specs=P("grid", "ens"),
    )

    @partial(
        jax.jit,
        static_argnames=("n_members",),
        out_shardings=(sh["members"], sh["grid_vec"], sh["grid_vec"]),
    )
    def step(cov_blocks, E, idx, y, key, n_members):
        n = idx.shape[0]
        cov = cov_blocks.reshape(m, m)
        K = cov[idx[:, None], idx[None, :]] + E
        C_cross = cov[idx, :]
        C_diag = jnp.diagonal(cov)
        field, uncert2, _, V, _, _ = _ordinary_core(K, C_cross, C_diag, y)

        # distributed factor of the full grid covariance (row-sharded)
        L_blocks = chol(cov_blocks)
        LE = jnp.linalg.cholesky(E)
        k_state, k_obs = jax.random.split(key)
        z = jax.random.normal(k_state, (m, n_members), cov.dtype)
        states = draws(L_blocks, z).T  # (members, M)
        zo = jax.random.normal(k_obs, (n_members, n), cov.dtype)
        obs_noise = zo @ LE.T
        sim_obs = states[:, idx] + obs_noise  # (members, n)
        sim_grid = sim_obs @ V  # (members, M)
        members = field[None, :] + (sim_grid - states)
        return members, field, uncert2

    members, field, uncert2 = step(cov_blocks, E, idx, y, key, n_members)
    if m != m_true:  # drop the identity-pad tail
        members = members[:, :m_true]
        field = field[:m_true]
        uncert2 = uncert2[:m_true]
    return members, field, uncert2
