"""Nested sampler (sampling/nested.py): evidence + posterior recovery.

Mirrors test_smc.py: the analytic check uses a correlated Gaussian under
uniform priors (Z = 1/prior-volume exactly), the BOSS check ties the sampler
to the same likelihood every other sampler runs on. NS and SMC share no
statistics (prior-volume integral vs temperature ladder), so their agreement
on the same targets is a genuine cross-validation.
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
        from victor_tpu.sampling import run_nested
        return run_nested(self._loglike, self.BLOCK, n_live=512, n_batch=128,
                          n_steps=16, seed=1, chunk=None)

    def test_evidence_matches_analytic(self, result):
        logz_true = -np.log(100.0)
        assert abs(result.logz - logz_true) < max(3 * result.logz_se, 0.15), \
            f'logZ {result.logz:.3f} vs analytic {logz_true:.3f} ' \
            f'(se {result.logz_se:.3f})'

    def test_posterior_moments(self, result):
        mean = result.particles.mean(axis=0)
        np.testing.assert_allclose(mean, self.MU, atol=0.15)
        std = result.particles.std(axis=0)
        np.testing.assert_allclose(std, np.sqrt(np.diag(self.COV)), rtol=0.2)
        corr = np.corrcoef(result.particles.T)[0, 1]
        true = self.COV[0, 1] / np.sqrt(self.COV[0, 0] * self.COV[1, 1])
        assert abs(corr - true) < 0.15

    def test_run_diagnostics(self, result):
        # the raw NS sequence is ordered in lnL within each batch, the
        # weights normalise to Z, and the replacement chains kept moving
        assert result.n_iter > 0
        assert result.n_like == 512 + result.n_iter * 128 * 16
        wn = np.exp(result.points_logwt - result.logz)
        assert abs(wn.sum() - 1.0) < 1e-6
        assert result.ess > 100
        assert np.all(result.acceptance > 0.05)
        assert result.h > 0

    def test_information_matches_analytic(self, result):
        # H = E_post[ln L] - ln Z; for a normalised Gaussian inside a huge
        # box: E[ln L] = -ln(2 pi) - 0.5 ln|C| - 1 (d/2 with d=2)
        h_true = (-np.log(2 * np.pi) - 0.5 * np.log(np.linalg.det(self.COV))
                  - 1.0) + np.log(100.0)
        assert abs(result.h - h_true) < 0.3


class TestValidation:
    def test_rejects_bad_batch_and_steps(self):
        from victor_tpu.sampling import run_nested
        g = TestGaussianEvidence()
        with pytest.raises(ValueError, match='n_batch'):
            run_nested(g._loglike, g.BLOCK, n_live=64, n_batch=40)
        with pytest.raises(ValueError, match='n_steps'):
            run_nested(g._loglike, g.BLOCK, n_live=64, n_batch=16, n_steps=0)

    def test_max_iter_raises(self):
        from victor_tpu.sampling import run_nested
        g = TestGaussianEvidence()
        with pytest.raises(RuntimeError, match='did not terminate'):
            run_nested(g._loglike, g.BLOCK, n_live=128, n_batch=32,
                       n_steps=4, seed=3, chunk=None, max_iter=2)
        with pytest.raises(ValueError, match='checkpoint_every'):
            run_nested(g._loglike, g.BLOCK, n_live=64, n_batch=16,
                       checkpoint_every=0)

    def test_plateau_warns(self):
        """A constant likelihood ties every survivor at the threshold: the
        plateau fallback (replacement chains seeded AT L*) must be loud —
        shrinkage-based logZ is biased on plateaus (Fowlie et al. 2021)."""
        import logging

        from victor_tpu.sampling import run_nested

        def flat(params):
            return jnp.asarray(0.0), jnp.asarray(0.0)

        # the victor_tpu root logger has propagate=False, so capture with an
        # explicit handler rather than caplog's root-based capture
        records = []

        class _Grab(logging.Handler):
            def emit(self, record):
                records.append(record)

        h = _Grab(level=logging.WARNING)
        logging.getLogger('victor_tpu.nested').addHandler(h)
        try:
            res = run_nested(flat, TestGaussianEvidence.BLOCK, n_live=64,
                             n_batch=16, n_steps=2, seed=0, chunk=None,
                             dlogz=0.5)
        finally:
            logging.getLogger('victor_tpu.nested').removeHandler(h)
        assert any('plateau' in r.getMessage() for r in records)
        # flat L=1 over the prior: Z = 1 regardless of the biased shrinkage
        assert abs(res.logz) < 0.2


class TestCheckpointResume:
    def test_interrupted_run_resumes_bit_identically(self, tmp_path):
        """Kill the run after 3 iterations (max_iter), resume from the
        checkpoint: the final particles, evidence, and eval count must be
        bit-identical to an uninterrupted run (survivor ordering is
        deterministic in the restored likelihoods; the device PRNG key and
        the iteration counter that seeds the host-side start draw are part
        of the state)."""
        from victor_tpu.sampling import run_nested
        g = TestGaussianEvidence()
        ckpt = str(tmp_path / 'ns_ckpt.npz')

        full = run_nested(g._loglike, g.BLOCK, n_live=128, n_batch=32,
                          n_steps=6, seed=7, chunk=None)

        with pytest.raises(RuntimeError):
            run_nested(g._loglike, g.BLOCK, n_live=128, n_batch=32,
                       n_steps=6, seed=7, chunk=None, max_iter=3,
                       checkpoint=ckpt)
        resumed = run_nested(g._loglike, g.BLOCK, n_live=128, n_batch=32,
                             n_steps=6, seed=7, chunk=None,
                             checkpoint=ckpt, resume=True)

        np.testing.assert_array_equal(resumed.particles, full.particles)
        assert resumed.logz == full.logz
        assert resumed.n_like == full.n_like
        np.testing.assert_array_equal(resumed.points_logwt, full.points_logwt)

        # resuming a FINISHED run replays the terminal state without sampling
        again = run_nested(g._loglike, g.BLOCK, n_live=128, n_batch=32,
                           n_steps=6, seed=7, chunk=None,
                           checkpoint=ckpt, resume=True)
        np.testing.assert_array_equal(again.particles, full.particles)
        assert again.logz == full.logz

        # the checkpoint's schedule WINS over conflicting arguments: a
        # resume called with different n_live/n_batch/n_steps/seed (e.g.
        # the defaults) must not splice a different shrinkage schedule onto
        # the accumulated dead records — it inherits the stored one and
        # stays bit-identical (the n_batch default/validation runs AFTER
        # the checkpoint load, mirroring smc.py's load-first ordering)
        other = run_nested(g._loglike, g.BLOCK, n_live=1024, n_batch=None,
                           n_steps=24, seed=99, chunk=None,
                           checkpoint=ckpt, resume=True)
        np.testing.assert_array_equal(other.particles, full.particles)
        assert other.logz == full.logz

    @pytest.mark.slow  # the bit-identical interrupted-resume test above is
    # the default-tier coverage; this adds only the cadence variant
    def test_checkpoint_every_resumes_bit_identically(self, tmp_path):
        """checkpoint_every=3 saves at iterations 3, 6, ... and ALSO on the
        max_iter error path (so the error message's 'state saved' is true
        for any cadence); the resumed run continues from the saved state and
        finishes bit-identical (O(n_iter^2) I/O lever for long runs)."""
        from victor_tpu.sampling import run_nested
        g = TestGaussianEvidence()
        ckpt = str(tmp_path / 'ns_ckpt3.npz')

        full = run_nested(g._loglike, g.BLOCK, n_live=128, n_batch=32,
                          n_steps=6, seed=7, chunk=None)
        with pytest.raises(RuntimeError):
            run_nested(g._loglike, g.BLOCK, n_live=128, n_batch=32,
                       n_steps=6, seed=7, chunk=None, max_iter=4,
                       checkpoint=ckpt, checkpoint_every=3)
        assert int(np.load(ckpt)['it']) == 4     # the max_iter-path save
        resumed = run_nested(g._loglike, g.BLOCK, n_live=128, n_batch=32,
                             n_steps=6, seed=7, chunk=None,
                             checkpoint=ckpt, resume=True,
                             checkpoint_every=3)
        np.testing.assert_array_equal(resumed.particles, full.particles)
        assert resumed.logz == full.logz


class TestShardedNested:
    def test_mesh_sharded_matches_gaussian(self):
        """NS with the live-point axis sharded over the 8-device CPU mesh:
        the constrained-replacement gathers/scatters work across shards and
        the evidence still matches the analytic value."""
        from victor_tpu.parallel import make_mesh
        from victor_tpu.sampling import run_nested
        g = TestGaussianEvidence()
        mesh = make_mesh(('live',))
        res = run_nested(g._loglike, g.BLOCK, n_live=256, n_batch=64,
                         n_steps=10, seed=2, chunk=None, mesh=mesh)
        assert abs(res.logz - (-np.log(100.0))) < max(3 * res.logz_se, 0.25)
        np.testing.assert_allclose(res.particles.mean(axis=0), g.MU,
                                   atol=0.25)


class TestBOSSNested:
    BLOCK = {
        'fsigma8': {'prior': {'dist': 'uniform', 'min': 0.05, 'max': 1.5}},
        'beta': {'prior': {'dist': 'uniform', 'min': 0.2, 'max': 0.6}},
        'sigma_v': 380.0,
        'epsilon': 1.0,
    }

    def test_boss_smoke_and_export(self, boss_config, tmp_path):
        from victor_tpu.io import build_tables
        from victor_tpu.sampling import run_nested
        bundle = build_tables(boss_config['model'], boss_config['data'])
        res = run_nested(bundle, self.BLOCK, n_live=48, n_batch=12,
                         n_steps=3, dlogz=0.5, seed=4, chunk=16,
                         output=str(tmp_path / 'chains' / 'ns'))
        assert np.isfinite(res.logz)
        assert res.particles.shape[1] == 2
        m = res.summary()
        assert 0.35 < m['fsigma8']['mean'] < 0.8
        assert 0.3 < m['beta']['mean'] < 0.45
        import os
        assert os.path.exists(tmp_path / 'chains' / 'ns.1.txt')

    @pytest.mark.slow
    def test_cli_run_ns_json(self, boss_config, tmp_path, capsys):
        """`run --sampler ns` JSON: evidence fields + the posterior-
        predictive p-value from the particles' chi2 column."""
        import json
        import yaml
        from victor_tpu.__main__ import main
        cfg = dict(boss_config)
        cfg['params'] = self.BLOCK
        p = tmp_path / 'ns.yaml'
        p.write_text(yaml.safe_dump(cfg))
        main(['run', str(p), '--sampler', 'ns', '--live', '48',
              '--ns-steps', '3', '--dlogz', '0.5', '--seed', '4',
              '--output', str(tmp_path / 'c' / 'ns')])
        out = json.loads(capsys.readouterr().out)
        assert np.isfinite(out['log_evidence'])
        assert 0.0 <= out['posterior_predictive_p'] <= 1.0

    @pytest.mark.slow
    def test_cli_passes_n_batch(self, boss_config, tmp_path, monkeypatch,
                                capsys):
        """`--ns-batch` / sampler.n_batch reach run_nested (previously the
        config key was silently ignored and the default n_live//4 used)."""
        import json
        import yaml
        import victor_tpu.sampling as sampling_mod
        from victor_tpu.__main__ import main

        seen = {}
        real = sampling_mod.run_nested

        def spy(bundle, params_block, **kw):
            seen.update(kw)
            return real(bundle, params_block, **kw)

        monkeypatch.setattr(sampling_mod, 'run_nested', spy)
        cfg = dict(boss_config)
        cfg['params'] = self.BLOCK
        cfg['sampler'] = {'kind': 'ns', 'n_live': 48, 'n_batch': 8,
                          'n_steps': 3, 'dlogz': 0.5}
        p = tmp_path / 'nsb.yaml'
        p.write_text(yaml.safe_dump(cfg))
        main(['run', str(p), '--seed', '4'])
        assert seen['n_batch'] == 8
        out = json.loads(capsys.readouterr().out)
        assert np.isfinite(out['log_evidence'])
