r"""Pod-scale non-stationary ensembles on a FACTORED covariance.

``models.lowrank`` runs the clipped-covariance kriging + two-stage
ensemble on one chip up to ~65k grid cells. Beyond that (sub-half-degree
grids, n ~ 10^6) even the factors outgrow one HBM: V is (n, r) and the
member stack is (n_members, n). This module shards them over the
``(grid x ens)`` mesh (``parallel.mesh.make_mesh``):

- ``V`` and the diagonal floor ``f`` are ROW-sharded over ``grid`` —
  every n-sized contraction in the solve (``V @ (g * (V_o' w))``, the
  diagnostic Gram form, the state draws) is local to a device's rows;
- members are sharded over ``(ens, grid)``;
- only the m x m observation system (and the (r,) spectrum) is
  replicated — the same small-replicated / large-sharded split as
  ``parallel.kriging``.

The implementation re-jits the SAME traceable core as the local path
(``models.lowrank._lowrank_solve_impl``) with in/out shardings and lets
the SPMD partitioner place the collectives: the only cross-device
traffic is the m-row gather ``V[idx]`` and the psum of the (r, b)
bottleneck products — O(m r + r b) per application, never O(n).

New capability axis (reference has no distributed backend, SURVEY.md
§2.3/§5.8); numerics pinned against the single-device path in
``tests/test_parallel.py``.
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.lowrank import (
    LowRankKrigingResult,
    _is_diagonal,
    _lowrank_solve_impl,
)
from ..ops.covariance_tools import LowRankPSD


_SOLVE_JIT_BY_MESH: dict = {}


def _sharded_solve_fn(mesh):
    """One jitted sharded solve per mesh, cached.

    A fresh ``jax.jit`` wrapper owns a fresh trace cache, so building
    one inside every call would retrace (and maybe recompile) the
    solve on each monthly invocation — defeating the compile-cache
    discipline ``LowRankPSD.pad_rank`` exists for. ``Mesh`` is
    hashable, so the wrapper is memoised per mesh.
    """
    fn = _SOLVE_JIT_BY_MESH.get(mesh)
    if fn is None:
        vec = NamedSharding(mesh, P("grid"))
        mem = NamedSharding(mesh, P("ens", "grid"))
        fn = jax.jit(
            _lowrank_solve_impl,
            static_argnames=("n_members", "diagnostics", "e_diag"),
            out_shardings=(vec, vec, vec, mem),
        )
        _SOLVE_JIT_BY_MESH[mesh] = fn
    return fn


def _put(mesh, psd, idx, obs, error_cov):
    row = NamedSharding(mesh, P("grid", None))
    vec = NamedSharding(mesh, P("grid"))
    repl = NamedSharding(mesh, P())
    V = jax.device_put(psd.vectors, row)
    g = jax.device_put(psd.gains, repl)
    f = jax.device_put(psd.floor, vec)
    idx = jax.device_put(jnp.asarray(idx), repl)
    y = jax.device_put(jnp.asarray(obs, V.dtype), repl)
    E = jax.device_put(jnp.asarray(error_cov, V.dtype), repl)
    return V, g, f, idx, y, E


def sharded_lowrank_kriging(
    mesh, psd: LowRankPSD, idx, obs, error_cov
) -> LowRankKrigingResult:
    """Ordinary kriging off row-sharded factors; outputs grid-sharded.

    Exact (same algebra as ``models.lowrank.lowrank_kriging``); the
    grid dimension n must be divisible by the ``grid`` axis size.
    """
    V, g, f, idx, y, E = _put(mesh, psd, idx, obs, error_cov)
    fn = _sharded_solve_fn(mesh)
    field, uncert2, cmask, _ = fn(
        V, g, f, E, idx, y, jax.random.key(0), 0,
        e_diag=_is_diagonal(error_cov),
    )
    return LowRankKrigingResult(
        field, jnp.sqrt(jnp.clip(uncert2, 0.0)), cmask
    )


def sharded_lowrank_ensemble_step(
    mesh,
    psd: LowRankPSD,
    idx,
    obs,
    error_cov,
    key,
    n_members: int = 100,
):
    """Two-stage perturbation ensemble off row-sharded factors.

    Same scheme as ``models.lowrank.lowrank_ensemble_step`` (exact
    factored N(0, C) states, simple-kriged simulated obs, member =
    field + grid_sim - state) in ONE sharded dispatch. Returns
    (result, members) with the field/diagnostics sharded over ``grid``
    and members over ``(ens, grid)``. Keyed draws are
    sharding-invariant, so results match the single-device path
    bit-for-bit up to reduction order.
    """
    V, g, f, idx, y, E = _put(mesh, psd, idx, obs, error_cov)
    fn = _sharded_solve_fn(mesh)
    field, uncert2, cmask, members = fn(
        V, g, f, E, idx, y, key, int(n_members),
        e_diag=_is_diagonal(error_cov),
    )
    res = LowRankKrigingResult(
        field, jnp.sqrt(jnp.clip(uncert2, 0.0)), cmask
    )
    return res, members
