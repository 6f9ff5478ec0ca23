"""Goodness-of-fit machinery (sampling/gof.py): tail-probability statistics
and their end-to-end calibration through the likelihood pipeline."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

from victor_tpu.sampling.gof import (chi2_tail_probability,  # noqa: E402
                                     posterior_predictive_pvalue)


class TestTailProbability:
    def test_hotelling_converges_to_chi2(self):
        """The finite-mock Hotelling-F null must approach the chi2 tail as
        nmocks -> infinity."""
        from scipy import stats
        ndof, chi2 = 56, 70.0
        p_chi2 = float(stats.chi2.sf(chi2, ndof))
        p_m = chi2_tail_probability(chi2, ndof, form='sellentin',
                                    nmocks=10_000_000)
        np.testing.assert_allclose(p_m, p_chi2, rtol=1e-3)

    def test_hotelling_heavier_tail(self):
        """At finite nmocks the estimated-covariance null has a heavier tail
        than chi2 (the plain chi2 PTE is optimistic): for an above-average
        statistic the Hotelling tail probability must be LARGER."""
        ndof = 56
        for chi2 in (70.0, 90.0, 120.0):
            p_f = chi2_tail_probability(chi2, ndof, form='sellentin',
                                        nmocks=1000)
            p_g = chi2_tail_probability(chi2, ndof, form='gaussian')
            assert p_f > p_g, (chi2, p_f, p_g)

    def test_form_is_case_insensitive(self):
        """'Sellentin' must get the Hotelling correction exactly like
        'sellentin' — likelihood/core lowercases at its point of use, and a
        silent chi2-tail fallback is the optimistic error this module
        exists to correct."""
        from victor_tpu.sampling.gof import chi2_tail_probability
        a = chi2_tail_probability(70.0, 56, form='sellentin', nmocks=1000)
        b = chi2_tail_probability(70.0, 56, form='Sellentin', nmocks=1000)
        c = chi2_tail_probability(70.0, 56, form='gaussian')
        assert a == b
        assert a != c

    def test_form_is_case_insensitive(self):
        """'Sellentin' must get the Hotelling correction exactly like
        'sellentin' — likelihood/core lowercases at its point of use, and a
        silent chi2-tail fallback is the optimistic error this module
        exists to correct."""
        from victor_tpu.sampling.gof import chi2_tail_probability
        a = chi2_tail_probability(70.0, 56, form='sellentin', nmocks=1000)
        b = chi2_tail_probability(70.0, 56, form='Sellentin', nmocks=1000)
        c = chi2_tail_probability(70.0, 56, form='gaussian')
        assert a == b
        assert a != c

    def test_gaussian_and_fallbacks(self):
        """gaussian form and nmocks <= ndof+1 both use the chi2 tail; arrays
        pass through elementwise."""
        from scipy import stats
        c = np.array([40.0, 60.0, 80.0])
        np.testing.assert_allclose(
            chi2_tail_probability(c, 60, form='gaussian'),
            stats.chi2.sf(c, 60))
        np.testing.assert_allclose(
            chi2_tail_probability(c, 60, form='sellentin', nmocks=30),
            stats.chi2.sf(c, 60))

    def test_ppp_is_mean_tail(self):
        draws = np.array([50.0, 60.0, 70.0])
        got = posterior_predictive_pvalue(draws, 60, 'gaussian')
        want = float(np.mean(chi2_tail_probability(draws, 60, 'gaussian')))
        np.testing.assert_allclose(got, want, rtol=1e-12)


class TestEndToEndCalibration:
    def test_pte_uniform_on_self_generated_mocks(self, boss_config):
        """Data drawn from the model's own sampling distribution (y = t + L xi
        at a fiducial point, gaussian form) must give U(0,1) tail
        probabilities through the FULL pipeline — this pins the mutual
        consistency of theory_vector, multipole_datavector,
        interpolated_covariance, and log_likelihood's chi2 in one statistic
        (a mismatch anywhere shifts every PTE)."""
        import copy

        import jax
        import jax.numpy as jnp
        from scipy import stats

        from coverage_test import _mock_setup, shift_datavector
        from victor_tpu.io import build_tables
        from victor_tpu.likelihood import core as lk

        cfg = copy.deepcopy(boss_config)
        cfg['data']['likelihood'] = {'form': 'gaussian'}
        bundle = build_tables(cfg['model'], cfg['data'])
        fiducial = {'fsigma8': 0.47, 'beta': 0.37, 'sigma_v': 380.0,
                    'epsilon': 1.0}
        tvec, dvec, L = _mock_setup(bundle, fiducial)
        params = {k: jnp.asarray(v) for k, v in fiducial.items()}

        chi2_fn = jax.jit(lambda tbl: lk.log_likelihood(
            tbl, bundle.spec, bundle.theory_opts, bundle.fit_opts, params)[1])

        rng = np.random.default_rng(3)
        n_mocks = 60
        chi2s = np.empty(n_mocks)
        for k in range(n_mocks):
            y = tvec + L @ rng.standard_normal(len(tvec))
            b2 = shift_datavector(bundle, y - dvec)
            chi2s[k] = float(chi2_fn(b2.tables))

        ptes = chi2_tail_probability(chi2s, len(tvec), form='gaussian')
        # exact chi2(ndata) statistics -> uniform PTEs
        ks = stats.kstest(ptes, 'uniform')
        assert ks.pvalue > 0.01, (ks, ptes[:10])
        assert 0.35 < ptes.mean() < 0.65
        # and the posterior-predictive average is just their mean
        np.testing.assert_allclose(
            posterior_predictive_pvalue(chi2s, len(tvec), 'gaussian'),
            ptes.mean(), rtol=1e-12)
