"""Synthetic-data machinery: mock draws from the fitted generative model.

Shared by the calibration campaign (tools/coverage_test.py) and the
parametric-bootstrap debiasing in `optimize.parametric_bootstrap`: one
implementation of "draw a data vector from N(t(theta), C(beta)) and graft
it into a bundle" so every consumer generates mocks identically. The
reference package has no analogue (mock validation there is manual).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np


def shift_datavector(bundle, delta):
    """Bundle with the data vector shifted by `delta` (n_ell_s * n_s,) at
    EVERY beta grid point: a constant shift moves only the constant PCHIP
    coefficient (interpolation is linear in the table values).

    A JointBundle is shifted per quantile: `delta` (jb.ndata,) is split at
    the stacked-vector block boundaries and each sub-bundle shifted with
    its own slice."""
    import jax.numpy as jnp

    from ..likelihood.multiquantile import JointBundle
    if isinstance(bundle, JointBundle):
        out, off = [], 0
        for b in bundle.bundles:
            D = b.spec.n_s * len(b.spec.poles_s)
            out.append(shift_datavector(b, delta[off:off + D]))
            off += D
        return dataclasses.replace(bundle, bundles=tuple(out))
    t = bundle.tables
    if bundle.spec.fixed_data:
        d2 = t.data_mult_fixed + delta.reshape(t.data_mult_fixed.shape)
        t2 = dataclasses.replace(t, data_mult_fixed=jnp.asarray(d2))
    else:
        c = t.data_mult_pchip_c
        d2 = c.at[:, 0].add(jnp.asarray(
            delta.reshape(c.shape[2:])[None]))
        t2 = dataclasses.replace(t, data_mult_pchip_c=d2)
    return dataclasses.replace(bundle, tables=t2)


def mock_setup(bundle, fiducial: Dict) -> Tuple[np.ndarray, np.ndarray,
                                                np.ndarray]:
    """Mock-generation ingredients (tvec, dvec, L) at a parameter point.

    tvec = theory vector at the fiducial, dvec = stored data vector at the
    fiducial beta, L = Cholesky factor of the covariance there. A mock is
    tvec + L @ xi; graft it with shift_datavector(bundle, mock - dvec)."""
    import jax.numpy as jnp

    from ..likelihood.core import (interpolated_covariance,
                                   multipole_datavector)
    from ..likelihood.multiquantile import (JointBundle, joint_covariance,
                                            joint_datavector,
                                            joint_theory_vector)
    from ..models.ccf_theory import theory_vector

    params = {k: jnp.asarray(v) for k, v in fiducial.items()}
    if isinstance(bundle, JointBundle):
        # joint generative model: stacked theory/data vectors and the FULL
        # cross-covariance (quantile noise is correlated through the
        # off-diagonal blocks — the thing the joint machinery exists for)
        tvec = np.asarray(joint_theory_vector(bundle, params),
                          dtype=np.float64)
        dvec = np.asarray(joint_datavector(bundle, params), dtype=np.float64)
        cov = np.asarray(joint_covariance(bundle, params['beta']),
                         dtype=np.float64)
        return tvec, dvec, np.linalg.cholesky(cov)
    tvec = np.asarray(theory_vector(bundle.tables, bundle.spec,
                                    bundle.theory_opts, params),
                      dtype=np.float64)
    dvec = np.asarray(multipole_datavector(bundle.tables, bundle.spec,
                                           jnp.asarray(fiducial['beta'])),
                      dtype=np.float64)
    cov = np.asarray(interpolated_covariance(bundle.tables, bundle.spec,
                                             jnp.asarray(fiducial['beta'])),
                     dtype=np.float64)
    return tvec, dvec, np.linalg.cholesky(cov)
