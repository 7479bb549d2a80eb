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
):
    """Full stochastic-kriging ensemble step, sharded over (grid, ens).

    One replicated factorisation of K = C_obs + E; per-member perturbation
    draws and their simple-kriged fields are batched over the ``ens`` axis
    while every grid-sized array stays sharded over ``grid``. Returns
    (members (n_members, M), field (M,), uncert2 (M,)). Both `covariance`
    and `error_cov` must be symmetric positive-definite (their Cholesky
    factors drive the draws).

    This is the framework's "training step" analog — the full production
    computation for one month of a HadCRUT-style ensemble.
    """
    sh = _shardings(mesh)
    cov = jax.device_put(jnp.asarray(covariance), sh["cov_rows"])
    E = jax.device_put(jnp.asarray(error_cov, cov.dtype), sh["repl"])
    idx = jax.device_put(jnp.asarray(idx), sh["repl"])
    y = jax.device_put(jnp.asarray(obs, cov.dtype), sh["repl"])

    @partial(
        jax.jit,
        static_argnames=("n_members",),
        out_shardings=(sh["members"], sh["grid_vec"], sh["grid_vec"]),
    )
    def step(cov, E, idx, y, key, n_members):
        m = cov.shape[0]
        n = idx.shape[0]
        K = cov[idx[:, None], idx[None, :]] + E
        C_cross = cov[idx, :]
        C_diag = jnp.diagonal(cov)
        field, uncert2, _, V, _, _ = _ordinary_core(K, C_cross, C_diag, y)

        # state draws: factor the full grid covariance once
        L = jnp.linalg.cholesky(cov)
        LE = jnp.linalg.cholesky(E)
        k_state, k_obs = jax.random.split(key)
        z = jax.random.normal(k_state, (n_members, m), cov.dtype)
        states = z @ L.T  # (members, M) — contracts over grid locally
        zo = jax.random.normal(k_obs, (n_members, n), cov.dtype)
        obs_noise = zo @ LE.T
        sim_obs = states[:, idx] + obs_noise  # (members, n)
        sim_grid = sim_obs @ V  # (members, M)
        members = field[None, :] + (sim_grid - states)
        return members, field, uncert2

    return step(cov, E, idx, y, key, n_members)
