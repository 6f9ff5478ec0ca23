"""Batched + mesh-sharded likelihood evaluation parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from victor_tpu.io import build_tables
from victor_tpu.likelihood.batched import (make_loglike, make_batched_loglike,
                                           make_sharded_loglike)
from victor_tpu.parallel import make_mesh

NAMES = ['fsigma8', 'beta', 'sigma_v', 'epsilon']


@pytest.fixture(scope='module')
def bundle(boss_config):
    return build_tables(boss_config['model'], boss_config['data'])


@pytest.fixture(scope='module')
def theta_batch(ref_fixtures):
    gp = np.asarray(ref_fixtures['grid_params'])[:16]
    return jnp.asarray(gp)


def test_batched_matches_scalar(bundle, theta_batch, ref_fixtures):
    scalar = make_loglike(bundle, NAMES)
    batched = make_batched_loglike(bundle, NAMES)
    lnl_b, chi2_b = batched(theta_batch)
    for i in range(theta_batch.shape[0]):
        lnl_s, chi2_s = scalar(theta_batch[i])
        np.testing.assert_allclose(float(lnl_b[i]), float(lnl_s), rtol=1e-12)
        np.testing.assert_allclose(float(chi2_b[i]), float(chi2_s), rtol=1e-12)
    # and against the reference goldens
    np.testing.assert_allclose(np.asarray(chi2_b),
                               np.asarray(ref_fixtures['grid_chi2'])[:16], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(lnl_b),
                               np.asarray(ref_fixtures['grid_lnl'])[:16], rtol=1e-8)


def test_sharded_matches_batched(bundle, theta_batch):
    assert len(jax.devices()) == 8
    mesh = make_mesh(('walkers',))
    sharded = make_sharded_loglike(bundle, NAMES, mesh, axis='walkers')
    batched = make_batched_loglike(bundle, NAMES)
    lnl_s, chi2_s = sharded(theta_batch)
    lnl_b, chi2_b = batched(theta_batch)
    np.testing.assert_allclose(np.asarray(lnl_s), np.asarray(lnl_b), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(chi2_s), np.asarray(chi2_b), rtol=1e-12)


def test_base_params_override(bundle):
    scalar = make_loglike(bundle, ['fsigma8', 'beta'],
                          base_params={'sigma_v': 380.0, 'epsilon': 1.0})
    lnl, chi2 = scalar(jnp.asarray([0.47, 0.37]))
    assert abs(float(chi2) - 65.01) < 0.01


def test_missing_beta_raises_input_error(bundle):
    """The reference raises 'Need to supply a valid value of beta' when the
    data/covariance are beta-dependent (victor/ccf_fit.py:389); a silent
    0.0 default would extrapolate far off the grid and return
    garbage-but-finite likelihoods."""
    from victor_tpu.errors import InputError
    from victor_tpu.likelihood.core import log_likelihood
    params = {'fsigma8': jnp.asarray(0.47), 'sigma_v': jnp.asarray(380.0),
              'epsilon': jnp.asarray(1.0)}
    with pytest.raises(InputError, match='beta'):
        log_likelihood(bundle.tables, bundle.spec, bundle.theory_opts,
                       bundle.fit_opts, params)


def test_cov_interp_gradient_finite_outside_grid():
    """Covariance interpolation clamps beta outside the grid; the clamp
    must also have a clean (zero) gradient — the 0/0 at low == n-1 used
    to poison reverse-mode with NaN while the primal stayed finite."""
    from victor_tpu.likelihood.core import _interp_matrix_stack
    grid = jnp.asarray([0.3, 0.4, 0.5])
    stack = jnp.stack([i * jnp.eye(2) for i in (1.0, 2.0, 3.0)])

    def f(b):
        return _interp_matrix_stack(grid, stack, b).sum()

    for beta, expect in [(0.55, 6.0), (0.25, 2.0), (0.5, 6.0), (0.45, None)]:
        val, g = jax.value_and_grad(f)(jnp.asarray(beta))
        assert np.isfinite(float(val)) and np.isfinite(float(g)), beta
        if expect is not None:
            np.testing.assert_allclose(float(val), expect, rtol=1e-12)
        if beta in (0.55, 0.25):
            assert float(g) == 0.0          # clamped outside the grid
