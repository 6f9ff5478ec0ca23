"""Shared resolution of a likelihood target for the estimation layer.

find_map / profile_scan / run_smc all accept the same three target kinds:
a single-dataset CCFModelBundle, a multi-quantile JointBundle, or a bare
callable params-dict -> (lnlike, aux). This helper is the single place that
dispatches them (previously three near-identical copies, which had already
diverged: the SMC JointBundle branch lost opts_kw/fit_kw from its jit-cache
key, silently reusing functions compiled with the FIRST call's overrides).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp


def resolve_target(bundle, opts_kw: Optional[Dict], fit_kw: Optional[Dict]
                   ) -> Tuple[object, callable, tuple]:
    """Returns (tables_arg, loglike(tbl, params) -> (lnl, aux), cache_id).

    `tables_arg` is the pytree to pass as the jit argument; `cache_id` is a
    hashable key covering everything the loglike closure captures (statics,
    option overrides) so jitted functions can be cached per target.
    """
    from ..likelihood.core import log_likelihood
    from ..likelihood.multiquantile import JointBundle, joint_log_likelihood

    kw_id = (repr(sorted((opts_kw or {}).items())),
             repr(sorted((fit_kw or {}).items())))

    if callable(bundle) and not hasattr(bundle, 'tables') \
            and not isinstance(bundle, JointBundle):
        user_fn = bundle

        def loglike(tbl, params):
            return user_fn(params)
        return jnp.zeros(()), loglike, ('callable', id(bundle))

    if isinstance(bundle, JointBundle):
        def loglike(tbl, params):
            return joint_log_likelihood(tbl, params, opts_kw, fit_kw)
        cache_id = ('joint',
                    tuple((b.spec, b.theory_opts) for b in bundle.bundles),
                    bundle.fit_opts, bundle.fixed_covmat, bundle.ndata,
                    kw_id)
        return bundle, loglike, cache_id

    opts = bundle.theory_opts.replace(**(opts_kw or {}))
    fit = bundle.fit_opts.replace(**(fit_kw or {}))
    spec = bundle.spec

    def loglike(tbl, params):
        return log_likelihood(tbl, spec, opts, fit, params)
    return bundle.tables, loglike, (spec, opts, fit)
