"""Parameter-space specification parsed from cobaya-style `params:` blocks.

The reference delegates priors/reference-distributions/proposals/derived
parameters to cobaya (config/boss_cobaya_config.yaml:50-97,
victor/likelihoods/CCFLikelihood.yaml:8-40). Here the same YAML vocabulary is
parsed into a `ParamSpace` whose `log_prior` and `sample_ref` are pure JAX
functions, so priors evaluate on-device inside the vmapped posterior.

Supported per-parameter forms:
  name:                      -> sampled, spec from an outer default (or error)
  name: 1.9                  -> fixed value
  name: {prior: {dist: uniform, min, max}, ref: {...}, proposal, latex}
  name: {prior: {dist: norm, loc, scale}, ...}
  name: {value: "lambda a, b: ..."}   -> derived from other params
  name: {derived: True}      -> derived output (filled by the likelihood)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import InputError


@dataclasses.dataclass(frozen=True)
class SampledParam:
    name: str
    dist: str                 # 'uniform' | 'norm'
    lo: float                 # min (uniform) / loc (norm)
    hi: float                 # max (uniform) / scale (norm)
    ref_dist: str = 'prior'
    ref_loc: float = 0.0
    ref_scale: float = 1.0
    proposal: Optional[float] = None
    latex: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class DerivedParam:
    name: str
    fn: Callable              # params dict -> value
    argnames: Tuple[str, ...]
    latex: Optional[str] = None


def _parse_lambda(expr: str) -> Tuple[Callable, Tuple[str, ...]]:
    """Compile a cobaya-style 'lambda a, b: ...' derived-parameter string.

    Evaluated with jnp as the only free module so the result traces under jit.
    """
    expr = expr.strip()
    if not expr.startswith('lambda'):
        raise InputError(f"Derived parameter value must be a lambda string, got {expr!r}")
    header = expr[len('lambda'):expr.index(':')]
    argnames = tuple(a.strip() for a in header.split(',') if a.strip())
    fn = eval(expr, {'np': jnp, 'jnp': jnp, 'math': math})  # noqa: S307 (trusted config)
    return fn, argnames


class ParamSpace:
    """Sampled + fixed + derived parameters with JAX prior/ref functions."""

    def __init__(self, params_block: Dict):
        self.sampled: List[SampledParam] = []
        self.fixed: Dict[str, float] = {}
        self.derived: List[DerivedParam] = []
        for name, spec in (params_block or {}).items():
            if spec is None:
                raise InputError(
                    f"Parameter '{name}' has no specification; give a prior, a "
                    "fixed value, or a derived lambda")
            if isinstance(spec, (int, float)):
                self.fixed[name] = float(spec)
                continue
            if not isinstance(spec, dict):
                raise InputError(f"Bad specification for parameter '{name}': {spec!r}")
            if spec.get('derived') is True:
                continue  # output-only derived (e.g. chi2), produced by the runner
            if 'value' in spec:
                val = spec['value']
                if isinstance(val, str):
                    fn, args = _parse_lambda(val)
                    self.derived.append(DerivedParam(name, fn, args, spec.get('latex')))
                else:
                    self.fixed[name] = float(val)
                continue
            prior = spec.get('prior')
            if prior is None:
                raise InputError(f"Parameter '{name}' needs a prior, value, or derived flag")
            dist = prior.get('dist', 'uniform')
            if dist == 'uniform':
                lo, hi = float(prior['min']), float(prior['max'])
            elif dist == 'norm':
                lo, hi = float(prior['loc']), float(prior['scale'])
            else:
                raise InputError(f"Unsupported prior dist '{dist}' for '{name}'")
            ref = spec.get('ref') or {}
            if isinstance(ref, (int, float)):
                ref = {'dist': 'norm', 'loc': float(ref), 'scale': 0.0}
            self.sampled.append(SampledParam(
                name=name, dist=dist, lo=lo, hi=hi,
                ref_dist=ref.get('dist', 'prior'),
                ref_loc=float(ref.get('loc', 0.0)),
                ref_scale=float(ref.get('scale', 1.0)),
                proposal=spec.get('proposal'),
                latex=spec.get('latex'),
            ))

    # ------------------------------------------------------------------
    @property
    def names(self) -> List[str]:
        return [p.name for p in self.sampled]

    @property
    def ndim(self) -> int:
        return len(self.sampled)

    def bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        lo = np.array([p.lo if p.dist == 'uniform' else -np.inf for p in self.sampled])
        hi = np.array([p.hi if p.dist == 'uniform' else np.inf for p in self.sampled])
        return lo, hi

    # ------------------------------------------------------------------
    def log_prior(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Log prior density at theta (..., ndim); -inf outside support."""
        lp = jnp.zeros(theta.shape[:-1])
        for i, p in enumerate(self.sampled):
            x = theta[..., i]
            if p.dist == 'uniform':
                inside = (x >= p.lo) & (x <= p.hi)
                lp = jnp.where(inside, lp - math.log(p.hi - p.lo), -jnp.inf)
            else:  # norm
                lp = lp - 0.5 * ((x - p.lo) / p.hi) ** 2 \
                     - math.log(p.hi) - 0.5 * math.log(2 * math.pi)
        return lp

    def sample_ref(self, key: jax.Array, n: int) -> jnp.ndarray:
        """Draw n starting points from the ref distributions (prior fallback),
        clipped into the prior support."""
        keys = jax.random.split(key, self.ndim)
        cols = []
        for i, p in enumerate(self.sampled):
            if p.ref_dist == 'norm':
                col = p.ref_loc + p.ref_scale * jax.random.normal(keys[i], (n,))
            elif p.dist == 'uniform':
                col = jax.random.uniform(keys[i], (n,), minval=p.lo, maxval=p.hi)
            else:
                col = p.lo + p.hi * jax.random.normal(keys[i], (n,))
            if p.dist == 'uniform':
                width = p.hi - p.lo
                col = jnp.clip(col, p.lo + 1e-6 * width, p.hi - 1e-6 * width)
            cols.append(col)
        return jnp.stack(cols, axis=-1)

    # ------------------------------------------------------------------
    # unbounded reparameterisation (for gradient-based samplers): uniform
    # priors map through a scaled logit, norm priors through identity
    # ------------------------------------------------------------------
    def to_unbounded(self, theta: jnp.ndarray) -> jnp.ndarray:
        cols = []
        for i, p in enumerate(self.sampled):
            x = theta[..., i]
            if p.dist == 'uniform':
                u = jnp.clip((x - p.lo) / (p.hi - p.lo), 1e-12, 1 - 1e-12)
                cols.append(jnp.log(u) - jnp.log1p(-u))
            else:
                cols.append(x)
        return jnp.stack(cols, axis=-1)

    def to_bounded(self, y: jnp.ndarray) -> jnp.ndarray:
        cols = []
        for i, p in enumerate(self.sampled):
            v = y[..., i]
            if p.dist == 'uniform':
                cols.append(p.lo + (p.hi - p.lo) * jax.nn.sigmoid(v))
            else:
                cols.append(v)
        return jnp.stack(cols, axis=-1)

    def log_jacobian(self, y: jnp.ndarray) -> jnp.ndarray:
        """log |d theta / d y| summed over parameters."""
        lj = jnp.zeros(y.shape[:-1])
        for i, p in enumerate(self.sampled):
            if p.dist == 'uniform':
                v = y[..., i]
                lj = lj + math.log(p.hi - p.lo) + jax.nn.log_sigmoid(v) \
                    + jax.nn.log_sigmoid(-v)
        return lj

    # ------------------------------------------------------------------
    def full_params(self, theta: jnp.ndarray) -> Dict:
        """theta (..., ndim) -> params dict incl. fixed and derived values."""
        params = {k: jnp.asarray(v) for k, v in self.fixed.items()}
        for i, p in enumerate(self.sampled):
            params[p.name] = theta[..., i]
        for d in self.derived:
            params[d.name] = d.fn(*[params[a] for a in d.argnames])
        return params

    def derived_values(self, theta: jnp.ndarray) -> Dict:
        params = self.full_params(theta)
        return {d.name: params[d.name] for d in self.derived}
