"""Multi-quantile joint fit: stacked vectors + cross-covariance."""

import copy

import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from victor_tpu.io import build_tables
from victor_tpu.likelihood import core as lk
from victor_tpu.likelihood.multiquantile import (build_joint_tables,
                                                 joint_chi_squared,
                                                 joint_log_likelihood,
                                                 make_batched_joint_loglike)

PARAMS = {'fsigma8': 0.47, 'beta': 0.37, 'sigma_v': 380.0, 'epsilon': 1.0}


def jp(d):
    return {k: jnp.asarray(v) for k, v in d.items()}


@pytest.fixture(scope='module')
def single_bundle(boss_config):
    return build_tables(boss_config['model'], boss_config['data'])


@pytest.fixture(scope='module')
def joint_cfg(boss_config, tmp_path_factory, single_bundle):
    """Two 'quantiles' (both the BOSS dataset) with a block-diagonal joint
    covariance equal to the per-dataset covariance at beta=0.37."""
    tmp = tmp_path_factory.mktemp('joint')
    cov1 = np.asarray(lk.interpolated_covariance(
        single_bundle.tables, single_bundle.spec, jnp.asarray(0.37)))
    D = cov1.shape[0]
    joint_cov = np.zeros((2 * D, 2 * D))
    joint_cov[:D, :D] = cov1
    joint_cov[D:, D:] = cov1
    cov_fn = tmp / 'joint_cov.hdf5'
    with h5py.File(cov_fn, 'w') as f:
        f.create_dataset('covmat', data=joint_cov)

    q = {'model': copy.deepcopy(boss_config['model']),
         'data': {'redshift_space_ccf':
                  copy.deepcopy(boss_config['data']['redshift_space_ccf']),
                  'dir': boss_config['data']['dir']}}
    return {
        'quantiles': [copy.deepcopy(q), copy.deepcopy(q)],
        'covariance_matrix': {'data_file': str(cov_fn), 'cov_key': 'covmat',
                              'fixed_beta': True},
        'likelihood': {'form': 'sellentin', 'nmocks': 1000, 'nparams': 4},
    }


class TestJointValidation:
    def test_quantile_without_data_block_raises(self, joint_cfg):
        """A data-less quantile used to inflate D from the model r grid and
        die later inside jit with an opaque NoneType error."""
        from victor_tpu.errors import InputError
        cfg = copy.deepcopy(joint_cfg)
        del cfg['quantiles'][1]['data']
        with pytest.raises(InputError, match='data'):
            build_joint_tables(cfg)


class TestJointFit:
    def test_covless_bundle_through_single_likelihood_raises(self, joint_cfg):
        """Quantile bundles legitimately carry no covariance (the JOINT one
        applies); pushing such a bundle through the single-dataset
        likelihood must raise the named InputError, not die in the einsum
        with an opaque NoneType trace error."""
        from victor_tpu.errors import InputError
        jb = build_joint_tables(joint_cfg)
        b = jb.bundles[0]
        with pytest.raises(InputError, match='covariance_matrix'):
            lk.log_likelihood(b.tables, b.spec, b.theory_opts, jb.fit_opts,
                              jp(PARAMS))

    def test_bad_quantile_index_raises(self, joint_cfg):
        """A __q override whose index matches no quantile used to be
        silently dropped — a dead sampled coordinate the likelihood is
        exactly flat in."""
        from victor_tpu.errors import InputError
        jb = build_joint_tables(joint_cfg)
        with pytest.raises(InputError, match='__q'):
            joint_chi_squared(jb, jp({**PARAMS, 'sigma_v__q2': 300.0}))
        with pytest.raises(InputError, match='__q'):
            joint_chi_squared(jb, jp({**PARAMS, 'sigma_v__qx': 300.0}))


    def test_blockdiag_equals_sum(self, joint_cfg, single_bundle):
        jb = build_joint_tables(joint_cfg)
        assert jb.ndata == 120
        chi2_joint, _ = joint_chi_squared(jb, jp(PARAMS))
        # individual chi2 with the same fixed covariance
        from victor_tpu.models.ccf_theory import theory_vector
        tv1 = lk.multipole_datavector(single_bundle.tables, single_bundle.spec,
                                      jnp.asarray(0.37))
        th1 = theory_vector(single_bundle.tables, single_bundle.spec,
                            single_bundle.theory_opts, jp(PARAMS))
        icov1 = np.linalg.inv(np.asarray(lk.interpolated_covariance(
            single_bundle.tables, single_bundle.spec, jnp.asarray(0.37))))
        d = np.asarray(th1 - tv1)
        chi2_single = d @ icov1 @ d
        np.testing.assert_allclose(float(chi2_joint), 2 * chi2_single, rtol=1e-9)

    def test_quantile_override(self, joint_cfg):
        jb = build_joint_tables(joint_cfg)
        base, _ = joint_chi_squared(jb, jp(PARAMS))
        over, _ = joint_chi_squared(jb, jp({**PARAMS, 'sigma_v__q1': 300.0}))
        # differs from base, and equals the symmetric counterpart
        assert abs(float(over) - float(base)) > 1e-3
        sym, _ = joint_chi_squared(jb, jp({**PARAMS, 'sigma_v__q0': 300.0}))
        np.testing.assert_allclose(float(over), float(sym), rtol=1e-10)

    def test_joint_loglike_and_batching(self, joint_cfg):
        jb = build_joint_tables(joint_cfg)
        lnl, chi2 = joint_log_likelihood(jb, jp(PARAMS))
        assert np.isfinite(float(lnl))
        # exactness pin vs the direct (exact) call: resolve 'auto' to exact
        batched = make_batched_joint_loglike(
            jb, ['fsigma8', 'beta'],
            base_params={'sigma_v': 380.0, 'epsilon': 1.0},
            gradient_free=False)
        theta = jnp.asarray([[0.47, 0.37], [0.5, 0.4]])
        lnl_b, chi2_b = batched(theta)
        np.testing.assert_allclose(float(lnl_b[0]), float(lnl), rtol=1e-10)
        assert lnl_b.shape == (2,)
        # the default (gradient-free) maker resolves fast: bit-identical to
        # explicit fast, close to (but not equal to) exact
        fast_d = make_batched_joint_loglike(
            jb, ['fsigma8', 'beta'],
            base_params={'sigma_v': 380.0, 'epsilon': 1.0})
        fast_e = make_batched_joint_loglike(
            jb, ['fsigma8', 'beta'],
            base_params={'sigma_v': 380.0, 'epsilon': 1.0},
            opts_kw={'streaming_eval': 'fast', 'dispersion_final': 'fast'})
        lnl_d = np.asarray(fast_d(theta)[0])
        np.testing.assert_array_equal(lnl_d, np.asarray(fast_e(theta)[0]))
        assert not np.array_equal(lnl_d, np.asarray(lnl_b))
        np.testing.assert_allclose(lnl_d, np.asarray(lnl_b), rtol=1e-3)

    def test_three_quantile_equicorrelated_analytic(self, joint_cfg,
                                                    tmp_path_factory,
                                                    single_bundle):
        """N=3 quantiles with an equicorrelated kron((1-rho)I + rho 11^T, C)
        covariance: identical per-quantile residuals give the closed form
        chi2 = 3 chi2_single / (1 + 2 rho) — pins the cross-covariance
        algebra beyond the 2-quantile case."""
        rho = 0.4
        tmp = tmp_path_factory.mktemp('joint3')
        cov1 = np.asarray(lk.interpolated_covariance(
            single_bundle.tables, single_bundle.spec, jnp.asarray(0.37)))
        R = np.full((3, 3), rho)
        np.fill_diagonal(R, 1.0)
        fn = tmp / 'joint3_cov.hdf5'
        with h5py.File(fn, 'w') as f:
            f.create_dataset('covmat', data=np.kron(R, cov1))
        cfg = copy.deepcopy(joint_cfg)
        cfg['quantiles'].append(copy.deepcopy(cfg['quantiles'][0]))
        cfg['covariance_matrix'] = {'data_file': str(fn),
                                    'cov_key': 'covmat', 'fixed_beta': True}
        jb = build_joint_tables(cfg)
        assert jb.ndata == 180
        chi2_joint, _ = joint_chi_squared(jb, jp(PARAMS))
        base_jb = build_joint_tables(joint_cfg)        # block-diag 2-quantile
        chi2_single = float(joint_chi_squared(base_jb, jp(PARAMS))[0]) / 2.0
        np.testing.assert_allclose(float(chi2_joint),
                                   3.0 * chi2_single / (1.0 + 2.0 * rho),
                                   rtol=1e-9)

    def test_beta_varying_joint_cov(self, boss_config, joint_cfg,
                                    tmp_path_factory, single_bundle):
        tmp = tmp_path_factory.mktemp('jointb')
        covs = np.asarray(single_bundle.tables.cov)      # (31, 60, 60)
        beta = np.asarray(single_bundle.tables.beta_cov)
        D = covs.shape[1]
        joint = np.zeros((len(beta), 2 * D, 2 * D))
        joint[:, :D, :D] = covs
        joint[:, D:, D:] = covs
        fn = tmp / 'joint_cov_b.hdf5'
        with h5py.File(fn, 'w') as f:
            f.create_dataset('covmat', data=joint)
            f.create_dataset('beta', data=beta)
        cfg = copy.deepcopy(joint_cfg)
        cfg['covariance_matrix'] = {'data_file': str(fn), 'cov_key': 'covmat',
                                    'fixed_beta': False, 'beta_key': 'beta'}
        jb = build_joint_tables(cfg)
        lnl, chi2 = joint_log_likelihood(jb, jp(PARAMS))
        # chi2 must equal the single-dataset value doubled (block diag at
        # the interpolated beta)
        _, chi2_single = lk.log_likelihood(
            single_bundle.tables, single_bundle.spec,
            single_bundle.theory_opts, single_bundle.fit_opts, jp(PARAMS))
        np.testing.assert_allclose(float(chi2), 2 * float(chi2_single), rtol=1e-8)
        assert np.isfinite(float(lnl))


class TestJointSampling:
    def test_run_mcmc_on_joint_bundle(self, joint_cfg):
        """The sampling runner accepts a JointBundle directly."""
        from victor_tpu.sampling import run_mcmc
        jb = build_joint_tables(joint_cfg)
        block = {
            'fsigma8': {'prior': {'dist': 'uniform', 'min': 0.05, 'max': 1.5},
                        'ref': {'dist': 'norm', 'loc': 0.47, 'scale': 0.02}},
            'beta': {'prior': {'dist': 'uniform', 'min': 0.2, 'max': 0.6},
                     'ref': {'dist': 'norm', 'loc': 0.4, 'scale': 0.02}},
            'sigma_v': 380.0, 'epsilon': 1.0,
        }
        res = run_mcmc(jb, block, n_walkers=8, max_steps=4, check_every=2,
                       rhat_stop=0.0, seed=3)
        assert res.chain.shape == (4, 8, 2)
        assert np.all(np.isfinite(res.log_prob))

    @pytest.mark.slow
    def test_run_hmc_on_joint_bundle(self, joint_cfg):
        """Gradient-based HMC routes JointBundle through the joint
        likelihood (the whole stacked-quantile pipeline is differentiable)."""
        from victor_tpu.sampling import run_hmc_mcmc
        jb = build_joint_tables(joint_cfg)
        block = {
            'fsigma8': {'prior': {'dist': 'uniform', 'min': 0.05, 'max': 1.5},
                        'ref': {'dist': 'norm', 'loc': 0.47, 'scale': 0.02}},
            'beta': 0.37, 'sigma_v': 380.0, 'epsilon': 1.0,
        }
        res = run_hmc_mcmc(jb, block, n_chains=2, n_warmup=4, n_samples=4,
                           n_leapfrog=2, seed=0)
        assert res.chain.shape == (4, 2, 1)
        assert np.all(np.isfinite(res.log_prob))
        lo, hi = res.space.bounds()
        assert np.all(res.chain >= lo) and np.all(res.chain <= hi)

    @pytest.mark.slow
    def test_find_map_on_joint_bundle(self, joint_cfg, single_bundle):
        """MAP on the duplicated-dataset joint bundle: same optimum as the
        single dataset (block-diagonal duplicate doubles chi2 but moves
        nothing), so fsigma8* stays in the single-fit posterior bulk."""
        from victor_tpu.sampling.optimize import find_map
        jb = build_joint_tables(joint_cfg)
        block = {
            'fsigma8': {'prior': {'dist': 'uniform', 'min': 0.05, 'max': 1.5},
                        'ref': {'dist': 'norm', 'loc': 0.47, 'scale': 0.05}},
            'beta': 0.37, 'sigma_v': 380.0, 'epsilon': 1.0,
        }
        res = find_map(jb, block, n_starts=4, adam_steps=80, newton_steps=6,
                       seed=1)
        assert res.grad_norm < 1e-4
        assert 0.4 < res.params['fsigma8'] < 0.75
        # duplicated data halves the conditional variance: sigma scales
        # ~1/sqrt(2). (Not exact: the single path lerps precision matrices
        # separately — the reference quirk — while the joint covariance here
        # is the lerped C at beta=0.37, so the optima differ at the few-1e-3
        # level; compare at physics precision.)
        single = find_map(single_bundle, block, n_starts=4, adam_steps=80,
                          newton_steps=6, seed=1)
        np.testing.assert_allclose(res.params['fsigma8'],
                                   single.params['fsigma8'], atol=0.01)
        np.testing.assert_allclose(res.std['fsigma8'],
                                   single.std['fsigma8'] / np.sqrt(2),
                                   rtol=0.1)

    def test_fisher_forecast_on_joint_bundle(self, joint_cfg, single_bundle):
        """Fisher forecast accepts a JointBundle: the duplicated block-
        diagonal dataset doubles the Fisher information, so every sigma
        scales by 1/sqrt(2) relative to the single dataset (up to the
        reference's lerp-the-precision quirk, which makes the single-path
        icov differ from inv(lerped C) at the few-1e-3 level)."""
        from victor_tpu.sampling.optimize import fisher_forecast
        jb = build_joint_tables(joint_cfg)
        fid = dict(PARAMS)
        names = ('fsigma8', 'epsilon')
        joint = fisher_forecast(jb, fid, names)
        single = fisher_forecast(single_bundle, fid, names)
        for n in names:
            assert np.isfinite(joint.std[n]) and joint.std[n] > 0
            np.testing.assert_allclose(joint.std[n],
                                       single.std[n] / np.sqrt(2.0),
                                       rtol=0.05)

    @pytest.mark.slow
    def test_run_smc_on_joint_bundle(self, joint_cfg):
        from victor_tpu.sampling import run_smc
        jb = build_joint_tables(joint_cfg)
        block = {
            'fsigma8': {'prior': {'dist': 'uniform', 'min': 0.05, 'max': 1.5}},
            'beta': 0.37, 'sigma_v': 380.0, 'epsilon': 1.0,
        }
        res = run_smc(jb, block, n_particles=32, n_moves=2, seed=5, chunk=16)
        assert res.betas[-1] == 1.0
        assert np.isfinite(res.logz)
        assert 0.3 < res.particles[:, 0].mean() < 0.85


class TestJointCLI:
    """Top-level `quantiles:` configs are first-class in the CLI."""

    @pytest.fixture()
    def joint_yaml(self, joint_cfg, tmp_path):
        import yaml
        cfg = dict(joint_cfg)
        cfg['params'] = {
            'fsigma8': {'prior': {'dist': 'uniform', 'min': 0.05, 'max': 1.5},
                        'ref': {'dist': 'norm', 'loc': 0.47, 'scale': 0.03}},
            'beta': {'prior': {'dist': 'uniform', 'min': 0.2, 'max': 0.6},
                     'ref': {'dist': 'norm', 'loc': 0.37, 'scale': 0.02}},
            'sigma_v': 380.0,
            'epsilon': 1.0,
        }
        cfg['sampler'] = {'n_walkers': 8, 'max_steps': 4, 'check_every': 2,
                          'rhat_stop': 0.0}
        p = tmp_path / 'joint.yaml'
        p.write_text(yaml.safe_dump(cfg))
        return str(p)

    def test_eval(self, joint_yaml, capsys):
        import json
        from victor_tpu.__main__ import main
        main(['eval', joint_yaml, '--param', 'fsigma8=0.47',
              '--param', 'beta=0.37'])
        out = json.loads(capsys.readouterr().out)
        assert out['n_quantiles'] == 2
        # block-diagonal duplicate: ~2x the single-dataset chi2 of 65.01
        # (not exact: the joint covariance here is the lerped C while the
        # single path lerps precision matrices — the reference quirk)
        assert 110.0 < out['chi2'] < 130.0

    @pytest.mark.slow
    def test_run_ensemble(self, joint_yaml, capsys):
        # explicit --sampler: bare `run` now defaults to the calibrated MH
        # sampler; the fixture's rhat_stop: 0.0 opts out of the ensemble
        # loud-nonconvergence exit (4 steps cannot converge)
        import json
        from victor_tpu.__main__ import main
        main(['run', joint_yaml, '--sampler', 'ensemble'])
        out = json.loads(capsys.readouterr().out)
        assert out['sampler'] == 'ensemble'
        assert out['n_steps'] >= 4
        assert set(out['summary']) == {'fsigma8', 'beta'}

    def test_forecast(self, joint_yaml, capsys):
        import json
        from victor_tpu.__main__ import main
        main(['forecast', joint_yaml, '--param', 'fsigma8=0.47',
              '--param', 'beta=0.37'])
        out = json.loads(capsys.readouterr().out)
        assert set(out['sigma_fisher']) == {'fsigma8', 'beta'}
        for sig in out['sigma_fisher'].values():
            assert np.isfinite(sig) and sig > 0
        # duplicated data: expected sigma(fsigma8) ~ single/sqrt(2) ~ 0.04
        assert 0.01 < out['sigma_fisher']['fsigma8'] < 0.1
