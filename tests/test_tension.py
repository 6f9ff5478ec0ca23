"""Tension statistics (sampling/tension.py): evidence ratio + parameter
shift, validated against a fully analytic two-Gaussian case.

With uniform priors on [-5, 5]^2 (volume V = 100) and Gaussian likelihoods
N(x; mu_i, C_i) whose mass lies inside the box:

    Z_i  = 1/V                      (the normal integrates to 1)
    Z_AB = (1/V) N(mu_a - mu_b; 0, C_a + C_b)
    ln R = ln V + ln N(mu_a - mu_b; 0, C_a + C_b)

so both the concordant (same centre: ln R = ln V - ln(2 pi) - ln|C_a+C_b|/2
> 0) and tense (separated centres: the -d^T (C_a+C_b)^{-1} d / 2 exponent
drives ln R < 0) regimes have closed forms, and the parameter-shift n-sigma
is |d| in combined-covariance units by construction.
"""

import numpy as np
import pytest
import jax.numpy as jnp


SIG2 = 0.04                      # isotropic variance of both likelihoods
V = 100.0                        # prior volume

BLOCK = {'x': {'prior': {'dist': 'uniform', 'min': -5.0, 'max': 5.0}},
         'y': {'prior': {'dist': 'uniform', 'min': -5.0, 'max': 5.0}}}


def _gauss_like(mu):
    mu = np.asarray(mu)

    def loglike(params):
        d = jnp.stack([params['x'] - mu[0], params['y'] - mu[1]])
        chi2 = (d ** 2).sum() / SIG2
        lognorm = -jnp.log(2 * jnp.pi * SIG2)
        return lognorm - 0.5 * chi2, chi2
    return loglike


def _analytic_logr(mu_a, mu_b):
    d = np.asarray(mu_a) - np.asarray(mu_b)
    csum = 2 * SIG2
    return (np.log(V) - np.log(2 * np.pi * csum)
            - 0.5 * (d ** 2).sum() / csum)


class TestProductTarget:
    def test_product_sums_members(self):
        from victor_tpu.sampling.targets import ProductTarget, resolve_target
        a, b = _gauss_like([0.0, 0.0]), _gauss_like([1.0, 0.0])
        tbl, loglike, cid = resolve_target(ProductTarget((a, b)), None, None)
        params = {'x': jnp.asarray(0.3), 'y': jnp.asarray(-0.2)}
        lnl, aux = loglike(tbl, params)
        la, ca = a(params)
        lb, cb = b(params)
        np.testing.assert_allclose(float(lnl), float(la + lb), rtol=1e-12)
        np.testing.assert_allclose(float(aux), float(ca + cb), rtol=1e-12)
        assert cid[0] == 'product' and len(cid[1]) == 2


class TestAnalyticTension:
    def test_concordant_datasets(self):
        from victor_tpu.sampling import run_tension
        res = run_tension(_gauss_like([0.5, -0.3]), _gauss_like([0.5, -0.3]),
                          BLOCK, n_particles=2048, n_moves=6, seed=0,
                          chunk=None)
        truth = _analytic_logr([0.5, -0.3], [0.5, -0.3])
        assert truth > 0
        assert res.logr > 0
        assert abs(res.logr - truth) < max(4 * res.logr_se, 0.5)
        assert res.shift_nsigma < 3.0
        assert res.shift_p > 0.01

    def test_shifted_datasets(self):
        from victor_tpu.sampling import run_tension
        mu_a, mu_b = [0.0, 0.0], [1.0, 0.0]
        res = run_tension(_gauss_like(mu_a), _gauss_like(mu_b), BLOCK,
                          n_particles=2048, n_moves=6, seed=1, chunk=None)
        truth = _analytic_logr(mu_a, mu_b)       # ~ -0.96: tension
        assert truth < 0
        assert abs(res.logr - truth) < max(4 * res.logr_se, 0.5)
        # |d| = 1.0 in combined sigma sqrt(0.08) -> 3.54 sigma shift
        assert 2.5 < res.shift_nsigma < 4.5
        # joint posterior sits between the two dataset centres
        assert 0.3 < res.summary_ab['x']['mean'] < 0.7

    def test_parameter_shift_identity(self):
        from victor_tpu.sampling import parameter_shift
        c = np.diag([0.04, 0.09])
        chi2, ndof, p, nsigma = parameter_shift([0.2, 0.0], c, [0.0, 0.0], c)
        np.testing.assert_allclose(chi2, 0.04 / 0.08, rtol=1e-12)
        assert ndof == 2
        assert 0 < p < 1 and nsigma < 1.5

    def test_parameter_shift_single_parameter(self):
        """np.cov of an (N, 1) cloud is 0-d — the shift must still work for
        a single shared sampled parameter (atleast_2d guard)."""
        from victor_tpu.sampling import parameter_shift
        rng = np.random.default_rng(0)
        pa = rng.standard_normal((400, 1)) * 0.1
        pb = rng.standard_normal((400, 1)) * 0.1 + 0.3
        chi2, ndof, p, nsigma = parameter_shift(
            pa.mean(axis=0), np.cov(pa, rowvar=False),
            pb.mean(axis=0), np.cov(pb, rowvar=False))
        assert ndof == 1
        # 0.3 shift over sqrt(2)*0.1 combined sigma ~ 2.1 sigma
        assert 1.3 < nsigma < 3.2

    def test_parameter_shift_rank_deficient(self):
        """A rank-deficient combined covariance (perfectly correlated pair)
        must count only the surviving directions as dof."""
        from victor_tpu.sampling import parameter_shift
        c = np.array([[0.04, 0.04], [0.04, 0.04]])      # rank 1
        chi2, ndof, p, nsigma = parameter_shift([0.2, 0.2], c,
                                                [0.0, 0.0], c)
        assert ndof == 1


class TestShardedTension:
    @pytest.mark.slow  # sharded SMC + the ProductTarget mesh replication are
    # default-tested separately (test_smc sharded; dryrun ProductTarget leg)
    def test_mesh_sharded_matches_analytic(self):
        """run_tension with the particle axis sharded over the 8-device CPU
        mesh: the ProductTarget's tuple-of-tables pytree must replicate and
        the sharded evidences must still reproduce the closed-form ln R."""
        from victor_tpu.parallel import make_mesh
        from victor_tpu.sampling import run_tension
        res = run_tension(_gauss_like([0.5, -0.3]), _gauss_like([0.5, -0.3]),
                          BLOCK, n_particles=2048, n_moves=6, seed=0,
                          chunk=None, mesh=make_mesh(('particles',)))
        truth = _analytic_logr([0.5, -0.3], [0.5, -0.3])
        assert abs(res.logr - truth) < max(4 * res.logr_se, 0.5)
        assert res.shift_nsigma < 3.0


class TestBOSSTensionCLI:
    @pytest.mark.slow
    def test_cli_boss_vs_itself(self, boss_config, tmp_path, capsys):
        """`tension cfg cfg` (a dataset against itself) must report
        concordance with a small parameter shift."""
        import json
        import yaml
        from victor_tpu.__main__ import main
        cfg = dict(boss_config)
        cfg['params'] = {
            'fsigma8': {'prior': {'dist': 'uniform', 'min': 0.05,
                                  'max': 1.5}},
            'beta': {'prior': {'dist': 'uniform', 'min': 0.2, 'max': 0.6}},
            'sigma_v': 380.0,
            'epsilon': 1.0,
        }
        p = tmp_path / 'a.yaml'
        p.write_text(yaml.safe_dump(cfg))
        main(['tension', str(p), str(p), '--particles', '48', '--moves', '2',
              '--seed', '3'])
        out = json.loads(capsys.readouterr().out)
        assert out['verdict'] == 'concordance'
        assert out['log_evidence_ratio'] > 0
        assert out['parameter_shift']['n_sigma'] < 3.0
        assert set(out['posterior_joint']) == {'fsigma8', 'beta'}

    @pytest.mark.slow
    def test_cli_compare_streaming_vs_kaiser(self, boss_config, tmp_path,
                                             capsys):
        """`compare cfg cfg --set-b model.rsd_model=kaiser`: same data, two
        models — streaming must be decisively favored (the kaiser best fit
        is chi2 ~104 vs ~65 on the BOSS data)."""
        import json
        import yaml
        from victor_tpu.__main__ import main
        cfg = dict(boss_config)
        cfg['params'] = {
            'fsigma8': {'prior': {'dist': 'uniform', 'min': 0.05,
                                  'max': 1.5}},
            'beta': {'prior': {'dist': 'uniform', 'min': 0.2, 'max': 0.6}},
            'sigma_v': 380.0,
            'epsilon': 1.0,
        }
        p = tmp_path / 'm.yaml'
        p.write_text(yaml.safe_dump(cfg))
        main(['compare', str(p), str(p), '--set-b', 'model.rsd_model=kaiser',
              '--particles', '48', '--moves', '2', '--seed', '5'])
        out = json.loads(capsys.readouterr().out)
        # label-keyed output: the same path appears twice, so path-keyed
        # dicts would collapse and 'favored' could not identify the winner
        assert out['favored'] == 'a'
        assert out['delta_log_evidence'] > 5
        assert out['jeffreys'].startswith('decisive')
        assert out['a']['set'] == []
        assert out['b']['set'] == ['model.rsd_model=kaiser']
        assert out['a']['log_evidence'] > out['b']['log_evidence']

    def test_cli_rejects_mismatched_params(self, boss_config, tmp_path):
        import yaml
        from victor_tpu.__main__ import main
        cfg = dict(boss_config)
        cfg['params'] = {'fsigma8': {'prior': {'dist': 'uniform',
                                               'min': 0.05, 'max': 1.5}},
                         'beta': 0.37, 'sigma_v': 380.0, 'epsilon': 1.0}
        a = tmp_path / 'a.yaml'
        a.write_text(yaml.safe_dump(cfg))
        cfg2 = dict(cfg)
        cfg2['params'] = dict(cfg['params'], beta=0.40)
        b = tmp_path / 'b.yaml'
        b.write_text(yaml.safe_dump(cfg2))
        with pytest.raises(SystemExit, match='share ONE params'):
            main(['tension', str(a), str(b)])
