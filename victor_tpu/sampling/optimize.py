"""Best-fit (MAP) and Laplace/Fisher error estimation.

The reference ecosystem gets point estimates from external minimizers
(cobaya's `minimize` sampler wrapping scipy/py-bobyqa over the same
likelihood; victor itself ships none). Here the posterior is differentiable
end-to-end on device (gradients cost ~1.2x a forward pass — BASELINE.md), so
the TPU-native equivalent is direct: vmapped multi-start Adam in the
unbounded reparameterisation, a damped-Newton polish with the exact
`jax.hessian`, and a Laplace covariance from the Hessian at the optimum.

The objective is the *physical-space* posterior density ln L(theta) +
ln pi(theta) (no reparameterisation Jacobian), so the reported point is the
conventional MAP / best fit, and for uniform priors exactly the maximum-
likelihood point; the sigmoid/log maps only keep iterates inside the prior
support (sampling/priors.py:210-240).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logging import get_logger
from .priors import ParamSpace

log = get_logger('optimize')

_FIT_CACHE: dict = {}


@dataclasses.dataclass
class MAPResult:
    space: ParamSpace
    theta: np.ndarray              # (ndim,) best-fit point, physical space
    lnpost: float                  # ln L + ln prior at the optimum
    lnlike: float
    chi2: float
    cov: np.ndarray                # (ndim, ndim) Laplace covariance
    grad_norm: float               # |d lnpost / d theta| at the optimum
    n_starts: int
    n_converged: int               # starts that ended at a finite objective

    @property
    def params(self) -> Dict[str, float]:
        return {p.name: float(self.theta[i])
                for i, p in enumerate(self.space.sampled)}

    @property
    def std(self) -> Dict[str, float]:
        sd = np.sqrt(np.clip(np.diag(self.cov), 0.0, np.inf))
        return {p.name: float(sd[i]) for i, p in enumerate(self.space.sampled)}

    @property
    def correlation(self) -> np.ndarray:
        sd = np.sqrt(np.clip(np.diag(self.cov), 1e-300, np.inf))
        return self.cov / np.outer(sd, sd)

    def summary(self) -> Dict[str, Dict[str, float]]:
        sd = self.std
        return {name: {'value': val, 'std': sd[name]}
                for name, val in self.params.items()}


def _make_objectives(bundle, space: ParamSpace, opts_kw, fit_kw):
    """(neg-lnpost over unbounded y, (lnlike, chi2) over physical theta)."""
    from ..io.tables import CCFModelBundle  # noqa: F401  (typing only)
    from ..likelihood.core import log_likelihood
    from ..likelihood.multiquantile import JointBundle, joint_log_likelihood

    if isinstance(bundle, JointBundle):
        tables_arg = bundle

        def loglike(tbl, params):
            return joint_log_likelihood(tbl, params, opts_kw, fit_kw)
    else:
        opts = bundle.theory_opts.replace(**(opts_kw or {}))
        fit = bundle.fit_opts.replace(**(fit_kw or {}))
        spec = bundle.spec
        tables_arg = bundle.tables

        def loglike(tbl, params):
            return log_likelihood(tbl, spec, opts, fit, params)

    def lnpost_theta(tbl, theta):
        params = space.full_params(theta)
        lnl, _ = loglike(tbl, params)
        total = lnl + space.log_prior(theta)
        return jnp.where(jnp.isfinite(total), total, -jnp.inf)

    def neg_lnpost_y(tbl, y):
        return -lnpost_theta(tbl, space.to_bounded(y))

    def like_stats(tbl, theta):
        return loglike(tbl, space.full_params(theta))

    return tables_arg, lnpost_theta, neg_lnpost_y, like_stats


def find_map(bundle, params_block: Dict,
             n_starts: int = 32, adam_steps: int = 250,
             newton_steps: int = 8, learning_rate: float = 0.05,
             seed: int = 0, opts_kw: Optional[Dict] = None,
             fit_kw: Optional[Dict] = None) -> MAPResult:
    """Multi-start MAP + Laplace covariance.

    Stage 1: `n_starts` points drawn from the params block's ref/prior
    distributions descend in parallel (one vmapped Adam scan, a single
    device dispatch). Stage 2: the best endpoint is polished with damped
    Newton using the exact posterior Hessian. Stage 3: the Laplace
    covariance inv(-H) at the optimum, in physical parameter space.

    Accepts a single-dataset CCFModelBundle or a multi-quantile JointBundle,
    like run_mcmc / run_hmc_mcmc.
    """
    import optax

    space = ParamSpace(params_block)
    tables_arg, lnpost_theta, neg_y, like_stats = _make_objectives(
        bundle, space, opts_kw, fit_kw)

    from ..likelihood.multiquantile import JointBundle
    if isinstance(bundle, JointBundle):
        cache_id = ('joint', tuple((b.spec, b.theory_opts) for b in bundle.bundles),
                    bundle.fit_opts, bundle.fixed_covmat, bundle.ndata)
    else:
        cache_id = (bundle.spec, bundle.theory_opts, bundle.fit_opts)
    cache_key = (cache_id, tuple(sorted((p.name, p.dist, p.lo, p.hi)
                                        for p in space.sampled)),
                 tuple(sorted(space.fixed.items())),
                 repr(sorted((opts_kw or {}).items())),
                 repr(sorted((fit_kw or {}).items())),
                 n_starts, adam_steps, learning_rate)
    fns = _FIT_CACHE.setdefault(cache_key, {})

    if 'adam' not in fns:
        opt = optax.adam(learning_rate)

        def adam_run(tbl, y0):
            def one(y_init):
                def step(carry, _):
                    y, st = carry
                    val, g = jax.value_and_grad(lambda yy: neg_y(tbl, yy))(y)
                    g = jnp.where(jnp.isfinite(g), g, 0.0)
                    upd, st = opt.update(g, st, y)
                    return (optax.apply_updates(y, upd), st), val
                (yf, _), _ = jax.lax.scan(step, (y_init, opt.init(y_init)),
                                          None, length=adam_steps)
                return yf, neg_y(tbl, yf)
            return jax.vmap(one)(y0)

        fns['adam'] = jax.jit(adam_run)

        def newton_step(tbl, y):
            g = jax.grad(lambda yy: neg_y(tbl, yy))(y)
            H = jax.hessian(lambda yy: neg_y(tbl, yy))(y)
            # Levenberg damping keeps the step well-posed when H is not PD
            lam = 1e-6 * jnp.maximum(jnp.trace(H) / y.shape[0], 1.0)
            dy = jnp.linalg.solve(H + lam * jnp.eye(y.shape[0]), g)
            y_new = y - dy
            better = neg_y(tbl, y_new) < neg_y(tbl, y)
            ok = jnp.isfinite(y_new).all() & better
            return jnp.where(ok, y_new, y)

        fns['newton'] = jax.jit(newton_step)
        fns['laplace'] = jax.jit(lambda tbl, th: (
            jax.hessian(lambda t: -lnpost_theta(tbl, t))(th),
            jax.grad(lambda t: lnpost_theta(tbl, t))(th)))
        fns['stats'] = jax.jit(like_stats)

    key = jax.random.PRNGKey(seed)
    theta0 = space.sample_ref(key, n_starts)
    y0 = space.to_unbounded(theta0)

    ys, vals = fns['adam'](tables_arg, y0)
    vals = np.asarray(vals)
    finite = np.isfinite(vals)
    if not finite.any():
        raise RuntimeError('find_map: every start diverged; check the priors '
                           'and ref distributions in the params block')
    best = int(np.nanargmin(np.where(finite, vals, np.inf)))
    y = ys[best]
    for _ in range(newton_steps):
        y = fns['newton'](tables_arg, y)

    theta = space.to_bounded(y)
    H, g = fns['laplace'](tables_arg, theta)
    H = np.asarray(H, dtype=np.float64)
    try:
        cov = np.linalg.inv(H)
    except np.linalg.LinAlgError:
        cov = np.full_like(H, np.nan)
    lnl, chi2 = fns['stats'](tables_arg, theta)
    lnpost = float(np.asarray(lnl) + np.asarray(space.log_prior(theta)))

    result = MAPResult(
        space=space, theta=np.asarray(theta, dtype=np.float64),
        lnpost=lnpost, lnlike=float(lnl), chi2=float(chi2),
        cov=cov, grad_norm=float(np.linalg.norm(np.asarray(g))),
        n_starts=n_starts, n_converged=int(finite.sum()))
    log.info('MAP: chi2=%.4f lnpost=%.4f |grad|=%.2e (%d/%d starts finite)',
             result.chi2, result.lnpost, result.grad_norm,
             result.n_converged, n_starts)
    return result
