"""The 'factored' beta-covariance mode (config.TheoryOptions.beta_covariance).

A mathematically exact refactoring of the reference's beta-interpolated
covariance likelihood (victor/ccf_fit.py:195-260,398-413): chi^2 contracts
the residual against every grid precision once and scalar-interpolates the
quadratic forms (valid because the interpolation is linear in the matrix),
and -0.5 log det of the blended covariance comes from a build-time
generalized-eigenvalue pencil factorization (io/tables.py:_pencil_precompute)
instead of a per-eval dense slogdet. These tests pin fp-roundoff-level
agreement with the dense 'exact' path in f64 across every interpolation
branch (interior blend, exact grid point, both clamps), for values AND
gradients, on both the single-dataset and joint multiquantile paths.
"""

import copy

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from victor_tpu.io import build_tables
from victor_tpu.io.tables import _pencil_precompute
from victor_tpu.likelihood import core as lk
from victor_tpu.likelihood.batched import make_batched_loglike
from victor_tpu.likelihood.multiquantile import (build_joint_tables,
                                                 joint_log_likelihood)

PARAMS = {'fsigma8': 0.47, 'beta': 0.37, 'sigma_v': 380.0, 'epsilon': 1.0}


def jp(d):
    return {k: jnp.asarray(v) for k, v in d.items()}


@pytest.fixture(scope='module')
def bundle(boss_config):
    return build_tables(boss_config['model'], boss_config['data'])


def _beta_cases(grid):
    """One beta per interpolation branch: interior blends, an exact grid
    point, both edge grid points, and both out-of-grid clamps."""
    return [0.37, float(grid[0]), float(grid[-1]), float(grid[7]),
            float(0.5 * (grid[2] + grid[3])), float(grid[0]) - 0.02,
            float(grid[-1]) + 0.02]


class TestPencilPrecompute:
    def test_blended_logdet_matches_dense(self, bundle):
        """det((1-t) C_b + t C_end) via the pencil vs a dense slogdet of the
        actually-blended matrix, every grid index, f64."""
        cov = np.asarray(bundle.tables.cov)
        logdets, lams = _pencil_precompute(cov)
        rng = np.random.default_rng(0)
        for b in [0, 5, len(cov) - 2, len(cov) - 1]:
            t = float(rng.uniform())
            dense = np.linalg.slogdet((1 - t) * cov[b] + t * cov[-1])[1]
            pencil = logdets[b] + np.sum(np.log((1 - t) + t * lams[b]))
            np.testing.assert_allclose(pencil, dense, rtol=1e-11)

    def test_non_pd_stack_returns_none(self):
        """A non-PD slice must disable the factorization loudly (the
        factored mode then falls back to the dense exact path)."""
        import logging
        rng = np.random.default_rng(1)
        a = rng.normal(size=(4, 5, 5))
        stack = np.einsum('nij,nkj->nik', a, a)
        stack[2] = -np.eye(5)               # negative definite slice
        # the victor_tpu root logger has propagate=False, so capture with an
        # explicit handler rather than caplog's root-based capture
        records = []

        class _Grab(logging.Handler):
            def emit(self, record):
                records.append(record)

        h = _Grab(level=logging.WARNING)
        logging.getLogger('victor_tpu.tables').addHandler(h)
        try:
            logdets, lams = _pencil_precompute(stack)
        finally:
            logging.getLogger('victor_tpu.tables').removeHandler(h)
        assert logdets is None and lams is None
        assert any('pencil factorization unavailable' in r.getMessage()
                   for r in records)


class TestSingleDataset:
    def test_values_match_exact_every_branch(self, bundle):
        grid = np.asarray(bundle.tables.beta_cov)
        ex = bundle.theory_opts.replace(beta_covariance='exact')
        fa = bundle.theory_opts.replace(beta_covariance='factored')
        for beta in _beta_cases(grid):
            p = jp({**PARAMS, 'beta': beta})
            le, ce = lk.log_likelihood(bundle.tables, bundle.spec, ex,
                                       bundle.fit_opts, p)
            lf, cf = lk.log_likelihood(bundle.tables, bundle.spec, fa,
                                       bundle.fit_opts, p)
            np.testing.assert_allclose(float(lf), float(le), rtol=1e-12)
            np.testing.assert_allclose(float(cf), float(ce), rtol=1e-12)

    def test_gradients_match_exact(self, bundle):
        def make(opts):
            def f(th):
                p = {'fsigma8': th[0], 'beta': th[1], 'sigma_v': th[2],
                     'epsilon': th[3]}
                return lk.log_likelihood(bundle.tables, bundle.spec, opts,
                                         bundle.fit_opts, p)[0]
            return jax.grad(f)
        th = jnp.asarray([0.47, 0.372, 380.0, 1.003])
        ge = make(bundle.theory_opts.replace(beta_covariance='exact'))(th)
        gf = make(bundle.theory_opts.replace(beta_covariance='factored'))(th)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(ge),
                                   rtol=1e-9)

    def test_likelihood_interp_mode(self, bundle):
        """beta_interpolation='likelihood' evaluates at grid betas, where the
        pencil path takes the exact-grid-point override."""
        fit = bundle.fit_opts.replace(beta_interpolation='likelihood')
        ex = bundle.theory_opts.replace(beta_covariance='exact')
        fa = bundle.theory_opts.replace(beta_covariance='factored')
        p = jp(PARAMS)
        le, _ = lk.log_likelihood(bundle.tables, bundle.spec, ex, fit, p)
        lf, _ = lk.log_likelihood(bundle.tables, bundle.spec, fa, fit, p)
        np.testing.assert_allclose(float(lf), float(le), rtol=1e-12)

    def test_auto_resolves_factored_on_gradient_free_path(self, bundle):
        """make_batched_loglike(gradient_free=True) must route through the
        factored path and agree with an explicitly exact batch."""
        names = ('fsigma8', 'beta', 'sigma_v', 'epsilon')
        theta = jnp.asarray([[0.47, 0.37, 380.0, 1.0],
                             [0.50, 0.33, 350.0, 0.99],
                             [0.44, 0.41, 410.0, 1.01]])
        fast = make_batched_loglike(bundle, names)
        exact = make_batched_loglike(
            bundle, names, opts_kw={'streaming_eval': 'exact',
                                    'dispersion_final': 'exact',
                                    'beta_covariance': 'exact'})
        lf, cf = fast(theta)
        le, ce = exact(theta)
        # streaming_eval also resolves fast on this path, so the comparison
        # tolerance is the validated fast-mode bound, not fp roundoff
        np.testing.assert_allclose(np.asarray(cf), np.asarray(ce),
                                   rtol=1e-3)
        # pin the factored covariance alone at roundoff: exact streaming,
        # factored covariance vs everything exact
        only_cov = make_batched_loglike(
            bundle, names, opts_kw={'streaming_eval': 'exact',
                                    'dispersion_final': 'exact',
                                    'beta_covariance': 'factored'})
        lo, co = only_cov(theta)
        le2, ce2 = exact(theta)
        np.testing.assert_allclose(np.asarray(lo), np.asarray(le2),
                                   rtol=1e-11)
        np.testing.assert_allclose(np.asarray(co), np.asarray(ce2),
                                   rtol=1e-11)

    def test_factored_without_pencil_falls_back(self, bundle):
        """factored requested but no pencil tables (e.g. degenerate build):
        the dense exact path runs instead of crashing."""
        import dataclasses
        t = dataclasses.replace(bundle.tables, cov_logdet=None,
                                cov_pencil=None)
        fa = bundle.theory_opts.replace(beta_covariance='factored')
        lf, cf = lk.log_likelihood(t, bundle.spec, fa, bundle.fit_opts,
                                   jp(PARAMS))
        le, ce = lk.log_likelihood(bundle.tables, bundle.spec,
                                   bundle.theory_opts, bundle.fit_opts,
                                   jp(PARAMS))
        np.testing.assert_allclose(float(lf), float(le), rtol=1e-12)


class TestJoint:
    @pytest.fixture(scope='class')
    def joint_beta_cfg(self, boss_config, bundle, tmp_path_factory):
        """2-quantile joint config with a beta-VARYING correlated joint
        covariance kron(R, C(beta)), rho=0.4 (same construction as the
        calibration campaign's bundle)."""
        tmp = tmp_path_factory.mktemp('jointfac')
        covs = np.asarray(bundle.tables.cov)
        beta = np.asarray(bundle.tables.beta_cov)
        rho = 0.4
        R = np.array([[1.0, rho], [rho, 1.0]])
        joint = np.einsum('pq,bij->bpiqj', R, covs).reshape(
            len(beta), 2 * covs.shape[1], 2 * covs.shape[2])
        fn = tmp / 'joint_cov.hdf5'
        with h5py.File(fn, 'w') as f:
            f.create_dataset('covmat', data=joint)
            f.create_dataset('beta', data=beta)
        q = {'model': copy.deepcopy(boss_config['model']),
             'data': {'redshift_space_ccf':
                      copy.deepcopy(boss_config['data']['redshift_space_ccf']),
                      'dir': boss_config['data']['dir']}}
        return {
            'quantiles': [copy.deepcopy(q), copy.deepcopy(q)],
            'covariance_matrix': {'data_file': str(fn), 'cov_key': 'covmat',
                                  'fixed_beta': False, 'beta_key': 'beta'},
            'likelihood': {'form': 'sellentin', 'nmocks': 1000, 'nparams': 5},
        }

    def test_joint_factored_matches_exact(self, joint_beta_cfg):
        jb = build_joint_tables(joint_beta_cfg)
        assert jb.cov_logdet is not None and jb.cov_pencil is not None
        grid = np.asarray(jb.beta_cov)
        for beta in _beta_cases(grid):
            p = jp({**PARAMS, 'beta': beta,
                    'sigma_v__q0': 380.0, 'sigma_v__q1': 395.0})
            le, ce = joint_log_likelihood(
                jb, p, opts_kw={'beta_covariance': 'exact'})
            lf, cf = joint_log_likelihood(
                jb, p, opts_kw={'beta_covariance': 'factored'})
            np.testing.assert_allclose(float(lf), float(le), rtol=1e-12)
            np.testing.assert_allclose(float(cf), float(ce), rtol=1e-12)

    def test_joint_gradients_match(self, joint_beta_cfg):
        jb = build_joint_tables(joint_beta_cfg)

        def make(mode):
            def f(th):
                p = {'fsigma8': th[0], 'beta': th[1], 'sigma_v': th[2],
                     'epsilon': th[3]}
                return joint_log_likelihood(
                    jb, p, opts_kw={'beta_covariance': mode})[0]
            return jax.grad(f)
        th = jnp.asarray([0.47, 0.372, 380.0, 1.003])
        ge = make('exact')(th)
        gf = make('factored')(th)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(ge), rtol=1e-8)
