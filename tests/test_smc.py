"""Tempered-SMC sampler (sampling/smc.py): evidence + posterior recovery.

The analytic check uses a correlated Gaussian likelihood under uniform
priors, where the evidence is exactly 1/prior-volume (all likelihood mass
inside the box); the BOSS check ties the sampler to the same likelihood the
other samplers and the grid quadrature run on.
"""

import numpy as np
import pytest
import jax.numpy as jnp


class TestGaussianEvidence:
    MU = np.array([0.5, -0.3])
    COV = np.array([[1.0, 0.6], [0.6, 0.8]])

    def _loglike(self, params):
        d = jnp.stack([params['x'] - self.MU[0], params['y'] - self.MU[1]])
        icov = jnp.asarray(np.linalg.inv(self.COV))
        chi2 = d @ icov @ d
        lognorm = -jnp.log(2 * jnp.pi) - 0.5 * jnp.log(
            jnp.asarray(np.linalg.det(self.COV)))
        return lognorm - 0.5 * chi2, chi2

    BLOCK = {'x': {'prior': {'dist': 'uniform', 'min': -5.0, 'max': 5.0}},
             'y': {'prior': {'dist': 'uniform', 'min': -5.0, 'max': 5.0}}}

    @pytest.fixture(scope='class')
    def result(self):
        from victor_tpu.sampling import run_smc
        return run_smc(self._loglike, self.BLOCK, n_particles=512,
                       n_moves=5, seed=1, chunk=None)

    def test_evidence_matches_analytic(self, result):
        # integral of the normalised Gaussian over the box is ~1, so
        # Z = 1 / (10 * 10) exactly (mass outside the box is ~1e-5)
        logz_true = -np.log(100.0)
        assert abs(result.logz - logz_true) < max(3 * result.logz_se, 0.15), \
            f'logZ {result.logz:.3f} vs analytic {logz_true:.3f} ' \
            f'(se {result.logz_se:.3f})'

    def test_posterior_moments(self, result):
        mean = result.particles.mean(axis=0)
        np.testing.assert_allclose(mean, self.MU, atol=0.15)
        std = result.particles.std(axis=0)
        np.testing.assert_allclose(std, np.sqrt(np.diag(self.COV)), rtol=0.2)
        # the off-diagonal correlation survives the mutation kernel
        corr = np.corrcoef(result.particles.T)[0, 1]
        true = self.COV[0, 1] / np.sqrt(self.COV[0, 0] * self.COV[1, 1])
        assert abs(corr - true) < 0.15

    def test_ladder_and_diagnostics(self, result):
        assert result.betas[0] == 0.0 and result.betas[-1] == 1.0
        assert np.all(np.diff(result.betas) > 0)
        assert np.all(result.ess > 0.2)          # adaptive ESS control held
        assert np.all(result.acceptance > 0.05)  # mutations actually move


class TestCheckpointResume:
    def test_interrupted_run_resumes_bit_identically(self, tmp_path):
        """Kill the run after 2 stages (max_stages), resume from the
        checkpoint: the final particles, evidence, and ladder must be
        bit-identical to an uninterrupted run (the d-beta bisection is
        deterministic in the restored log-likelihoods and the PRNG key is
        part of the state)."""
        from victor_tpu.sampling import run_smc
        g = TestGaussianEvidence()
        ckpt = str(tmp_path / 'smc_ckpt.npz')

        full = run_smc(g._loglike, g.BLOCK, n_particles=128, n_moves=3,
                       seed=7, chunk=None)

        with pytest.raises(RuntimeError):
            run_smc(g._loglike, g.BLOCK, n_particles=128, n_moves=3,
                    seed=7, chunk=None, max_stages=2, checkpoint=ckpt)
        resumed = run_smc(g._loglike, g.BLOCK, n_particles=128, n_moves=3,
                          seed=7, chunk=None, checkpoint=ckpt, resume=True)

        np.testing.assert_array_equal(resumed.particles, full.particles)
        assert resumed.logz == full.logz
        np.testing.assert_array_equal(resumed.betas, full.betas)

        # resuming a FINISHED run returns the stored state without sampling
        again = run_smc(g._loglike, g.BLOCK, n_particles=128, n_moves=3,
                        seed=7, chunk=None, checkpoint=ckpt, resume=True)
        np.testing.assert_array_equal(again.particles, full.particles)
        assert again.logz == full.logz


class TestShardedSMC:
    def test_mesh_sharded_matches_gaussian(self):
        """SMC with the particle axis sharded over the 8-device CPU mesh:
        the run completes, the evidence matches the analytic value, and the
        resampling gather works across shards."""
        from victor_tpu.parallel import make_mesh
        from victor_tpu.sampling import run_smc
        g = TestGaussianEvidence()
        mesh = make_mesh(('particles',))
        res = run_smc(g._loglike, g.BLOCK, n_particles=256, n_moves=4,
                      seed=2, chunk=None, mesh=mesh)
        assert res.betas[-1] == 1.0
        assert abs(res.logz - (-np.log(100.0))) < max(3 * res.logz_se, 0.25)
        np.testing.assert_allclose(res.particles.mean(axis=0), g.MU, atol=0.25)


class TestBOSSSMC:
    BLOCK = {
        'fsigma8': {'prior': {'dist': 'uniform', 'min': 0.05, 'max': 1.5}},
        'beta': {'prior': {'dist': 'uniform', 'min': 0.2, 'max': 0.6}},
        'sigma_v': 380.0,
        'epsilon': 1.0,
    }

    def test_boss_smoke_and_export(self, boss_config, tmp_path):
        from victor_tpu.io import build_tables
        from victor_tpu.sampling import run_smc
        bundle = build_tables(boss_config['model'], boss_config['data'])
        res = run_smc(bundle, self.BLOCK, n_particles=48, n_moves=2,
                      seed=4, chunk=16,
                      output=str(tmp_path / 'chains' / 'smc'))
        assert res.betas[-1] == 1.0
        assert np.isfinite(res.logz)
        assert res.particles.shape == (48, 2)
        # posterior bulk (quadrature: fsigma8 0.573 +/- 0.054 for the 4-param
        # fit; the 2-param conditional peaks nearby)
        m = res.summary()
        assert 0.35 < m['fsigma8']['mean'] < 0.8
        assert 0.3 < m['beta']['mean'] < 0.45
        import os
        assert os.path.exists(tmp_path / 'chains' / 'smc.1.txt')

    @pytest.mark.slow
    def test_cli_run_smc_json_includes_ppp(self, boss_config, tmp_path,
                                           capsys):
        """`run --sampler smc` JSON: evidence fields + the posterior-
        predictive p-value computed from the particles' chi2 column
        (bundle targets only — sampling/gof.py)."""
        import json
        import yaml
        from victor_tpu.__main__ import main
        cfg = dict(boss_config)
        cfg['params'] = self.BLOCK
        p = tmp_path / 'smc.yaml'
        p.write_text(yaml.safe_dump(cfg))
        main(['run', str(p), '--sampler', 'smc', '--particles', '48',
              '--moves', '2', '--seed', '4',
              '--output', str(tmp_path / 'c' / 'smc')])
        out = json.loads(capsys.readouterr().out)
        assert np.isfinite(out['log_evidence'])
        assert 0.0 <= out['posterior_predictive_p'] <= 1.0
