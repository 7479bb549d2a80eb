r"""Maximum-likelihood variogram parameter estimation.

The reference consumes variogram parameters chosen elsewhere (HadSST4 /
HadCRUT5 pipelines estimate them offline); it cannot fit them — its
covariance stack is not differentiable. Here the full marginal Gaussian
likelihood of the observations,

.. math::
    -\log p(y) = \tfrac12\, y^\top K_\theta^{-1} y
               + \tfrac12 \log\det K_\theta + \tfrac{n}{2}\log 2\pi,
    \qquad K_\theta = \mathrm{cov}_\theta(D) + \sigma_n^2 I,

is a jitted, differentiable function of (psill, range, nugget), so the
parameters are fitted by bounded L-BFGS (gradients through the Cholesky
and through Matern K_nu included) or Nelder-Mead. One solver call per
iteration on the MXU; whole fit in well under a second at n ~ 1000.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .optim import lbfgs_minimize, nelder_mead
from .variogram import _vario_kernel


class VariogramFit(NamedTuple):
    """Fitted variogram parameters + fit diagnostics."""

    psill: float
    range: float
    nugget: float
    nll: float
    nit: int
    success: bool


@partial(jax.jit, static_argnames=("kind", "nu", "method"))
def gp_negative_log_likelihood(
    params, dists, y, kind: str, nu=None, method=None
):
    """Marginal Gaussian NLL of observations under a variogram model.

    `params` = (psill, range, nugget); `dists` the pairwise distance
    matrix of the observation positions; `y` the (mean-removed)
    observations. Fully differentiable.
    """
    psill, range_, nugget = params[0], params[1], params[2]
    # covariance: variance - variogram, sill as the variance; add the
    # nugget to the diagonal as independent noise
    cov = _vario_kernel(
        dists,
        psill,
        jnp.zeros_like(nugget),
        range_,
        psill,
        kind=kind,
        nu=nu,
        method=method,
        fused=True,
    )
    n = y.shape[0]
    K = cov + (nugget + 1e-6 * psill) * jnp.eye(n, dtype=cov.dtype)
    L = jnp.linalg.cholesky(K)
    alpha = jax.scipy.linalg.cho_solve((L, True), y)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return 0.5 * (y @ alpha) + 0.5 * logdet + 0.5 * n * jnp.log(
        2.0 * jnp.pi
    )


def fit_variogram_mle(
    dists,
    y,
    kind: str = "matern",
    nu: float = 1.5,
    method: str = "sklearn",
    guesses=(1.0, 1000.0, 0.01),
    bounds=((1e-3, 1e3), (1.0, 5e4), (1e-6, 1e2)),
    optimizer: str = "L-BFGS-B",
    tol: float = 1e-6,
) -> VariogramFit:
    """Fit (psill, range, nugget) by maximising the marginal likelihood.

    `dists` is the pairwise distance matrix between observed positions
    (e.g. from ``ops.distances.haversine_matrix``), `y` the mean-removed
    observations. Parameters are optimised in log-space (they are
    positive scale parameters spanning decades).
    """
    dists = jnp.asarray(dists)
    y = jnp.asarray(y, dists.dtype)
    lo = jnp.log(jnp.asarray([b[0] for b in bounds], dists.dtype))
    hi = jnp.log(jnp.asarray([b[1] for b in bounds], dists.dtype))
    x0 = jnp.log(jnp.asarray(guesses, dists.dtype))

    def fun(log_params):
        return gp_negative_log_likelihood(
            jnp.exp(log_params), dists, y, kind=kind, nu=nu, method=method
        )

    if optimizer in ("L-BFGS-B", "L-BFGS", "lbfgs"):
        res = lbfgs_minimize(fun, x0, bounds=(lo, hi), tol=tol)
    elif optimizer == "Nelder-Mead":
        res = nelder_mead(fun, x0, bounds=(lo, hi), xatol=tol, fatol=tol)
    else:
        raise ValueError(
            "optimizer must be 'L-BFGS-B' or 'Nelder-Mead'"
        )
    psill, range_, nugget = [float(v) for v in np.exp(np.asarray(res.x))]
    return VariogramFit(
        psill=psill,
        range=range_,
        nugget=nugget,
        nll=float(res.fun),
        nit=int(res.nit),
        success=bool(res.success),
    )
