"""Importance reweighting (sampling/post.py) — the `cobaya post` role.

Analytic checks on Gaussian targets where the reweighted moments, the
evidence ratio, and the ESS are known in closed form; a BOSS check that
reweights a small SMC posterior across likelihood forms through the CLI
subcommand and round-trips the fractional-weight GetDist export.
"""

import json

import numpy as np
import pytest
import jax.numpy as jnp

MU = np.array([0.5, -0.3])
COV = np.array([[0.04, 0.012], [0.012, 0.09]])     # sd 0.2 / 0.3 — far from
                                                   # the prior box edges

BLOCK = {'x': {'prior': {'dist': 'uniform', 'min': -5.0, 'max': 5.0}},
         'y': {'prior': {'dist': 'uniform', 'min': -5.0, 'max': 5.0}}}


def _gauss_target(mu, cov, offset=0.0):
    icov = jnp.asarray(np.linalg.inv(cov))
    lognorm = float(-np.log(2 * np.pi) - 0.5 * np.log(np.linalg.det(cov))
                    + offset)

    def loglike(params):
        d = jnp.stack([params['x'] - mu[0], params['y'] - mu[1]])
        chi2 = d @ icov @ d
        return lognorm - 0.5 * chi2, chi2
    return loglike


def _draws(mu, cov, n, seed=0):
    return np.random.default_rng(seed).multivariate_normal(mu, cov, size=n)


class TestAnalytic:
    def test_constant_offset_is_exact(self):
        """new = old * e^c: weights unchanged, Delta lnZ = c, se = 0."""
        from victor_tpu.sampling import reweight
        theta = _draws(MU, COV, 512)
        res = reweight(_gauss_target(MU, COV),
                       _gauss_target(MU, COV, offset=1.7), BLOCK, theta)
        assert abs(res.delta_logz - 1.7) < 1e-9
        assert res.delta_logz_se < 1e-9
        np.testing.assert_allclose(res.weights, 1.0, atol=1e-12)
        assert abs(res.ess - 512) < 1e-6
        assert res.efficiency == pytest.approx(1.0)

    def test_shifted_target_moments(self):
        """Shift the target 1 sigma in x: reweighted moments land on the NEW
        Gaussian; both targets are normalized so Delta lnZ ~ 0."""
        from victor_tpu.sampling import reweight
        mu2 = MU + np.array([0.2, 0.0])
        theta = _draws(MU, COV, 8192)
        res = reweight(_gauss_target(MU, COV), _gauss_target(mu2, COV),
                       BLOCK, theta)
        m = res.summary()
        assert abs(m['x']['mean'] - mu2[0]) < 0.015
        assert abs(m['y']['mean'] - mu2[1]) < 0.02
        assert abs(m['x']['std'] - 0.2) < 0.015
        assert abs(res.delta_logz) < max(4 * res.delta_logz_se, 0.02)
        # 1-sigma shift keeps a healthy overlap but must cost ESS
        assert 0.2 * res.n < res.ess < 0.95 * res.n

    def test_prior_change_enters_weights(self):
        """Shrinking the prior box (no posterior mass cut) changes lnZ by
        exactly the log prior-volume ratio, with zero variance."""
        from victor_tpu.sampling import reweight
        block_new = {'x': {'prior': {'dist': 'uniform', 'min': -4.0,
                                     'max': 4.0}},
                     'y': {'prior': {'dist': 'uniform', 'min': -4.0,
                                     'max': 4.0}}}
        theta = _draws(MU, COV, 512)
        target = _gauss_target(MU, COV)
        res = reweight(target, target, BLOCK, theta,
                       params_block_new=block_new)
        assert res.delta_logz == pytest.approx(np.log(100.0 / 64.0),
                                               abs=1e-9)
        assert res.delta_logz_se < 1e-9

    def test_zero_old_density_particle_dropped(self):
        """A row outside the old prior support cannot have come from the old
        posterior — it is zero-weighted with a warning, not propagated."""
        from victor_tpu.sampling import reweight
        theta = np.vstack([_draws(MU, COV, 64), [[7.0, 0.0]]])
        res = reweight(_gauss_target(MU, COV),
                       _gauss_target(MU, COV, offset=0.3), BLOCK, theta)
        assert res.weights[-1] == 0.0
        assert res.delta_logz == pytest.approx(0.3, abs=1e-9)

    def test_sampled_name_mismatch_raises(self):
        from victor_tpu.errors import InputError
        from victor_tpu.sampling import reweight
        block_new = {'x': BLOCK['x'],
                     'z': {'prior': {'dist': 'uniform', 'min': -5.0,
                                     'max': 5.0}}}
        with pytest.raises(InputError):
            reweight(_gauss_target(MU, COV), _gauss_target(MU, COV), BLOCK,
                     _draws(MU, COV, 16), params_block_new=block_new)

    def test_disjoint_targets_raise(self):
        from victor_tpu.errors import InputError
        from victor_tpu.sampling import reweight
        # new prior box excludes every draw -> zero overlap
        block_new = {'x': {'prior': {'dist': 'uniform', 'min': 3.0,
                                     'max': 5.0}},
                     'y': {'prior': {'dist': 'uniform', 'min': 3.0,
                                     'max': 5.0}}}
        with pytest.raises(InputError):
            reweight(_gauss_target(MU, COV), _gauss_target(MU, COV), BLOCK,
                     _draws(MU, COV, 16), params_block_new=block_new)


class TestChainIO:
    def test_read_getdist_glob_metachar_root(self, tmp_path):
        """A chain root containing glob metacharacters ([, ], *) must read
        back literally — glob.escape in read_getdist (a run directory like
        'run[2026]' is an ordinary filename)."""
        from victor_tpu.sampling import read_getdist
        from victor_tpu.sampling.chains import export_getdist
        from victor_tpu.sampling.priors import ParamSpace

        root = str(tmp_path / 'run[2026]' / 'ns')
        space = ParamSpace(BLOCK)
        draws = _draws(MU, COV, 32)
        lnp = -0.5 * np.sum(draws ** 2, axis=1)
        export_getdist(root, space, draws[:, None, :], lnp[:, None],
                       np.zeros((32, 1, 1)), aux_names=['aux_0'],
                       burn_in=0, n_chain_files=1)
        names, w, mlnp, samples = read_getdist(root)
        assert names[:2] == ['x', 'y']
        np.testing.assert_allclose(samples[:, :2], draws, rtol=0, atol=2e-6)


class TestApplySet:
    def test_list_traversal_by_index(self):
        """--set must traverse list nodes (a joint quantiles: block) by
        integer index instead of clobbering the list with a dict."""
        from victor_tpu.__main__ import _apply_set
        cfg = {'quantiles': [{'model': {'a': 1}}, {'model': {'a': 2}}],
               'top': 3}
        out = _apply_set(cfg, ['quantiles.1.model.a=9', 'top=4'])
        assert out['quantiles'][1]['model']['a'] == 9
        assert out['quantiles'][0]['model']['a'] == 1   # untouched
        assert out['top'] == 4
        assert cfg['quantiles'][1]['model']['a'] == 2   # deep copy

    def test_new_key_creation_is_loud(self, capsys):
        """Auto-vivification is deliberate (new nested options can be set)
        but must warn on stderr — a typo'd key would otherwise silently
        no-op the override (e.g. reweighting against an unchanged target)."""
        from victor_tpu.__main__ import _apply_set
        cfg = {'data': {'likelihood': {'form': 'sellentin'}}}

        out = _apply_set(cfg, ['data.liklihood.form=gaussian'])
        err = capsys.readouterr().err
        assert 'data.liklihood' in err and 'created' in err
        assert out['data']['likelihood']['form'] == 'sellentin'  # unchanged

        _apply_set(cfg, ['data.likelihood.nmocks=500'])   # new LEAF key
        assert 'nmocks' in capsys.readouterr().err

        _apply_set(cfg, ['data.likelihood.form=gaussian'])  # existing path
        assert capsys.readouterr().err == ''

    def test_list_index_errors_are_clean(self):
        from victor_tpu.__main__ import _apply_set
        cfg = {'quantiles': [{'model': {}}]}
        with pytest.raises(SystemExit, match='integer index'):
            _apply_set(cfg, ['quantiles.model.a=1'])
        with pytest.raises(SystemExit, match='out of range'):
            _apply_set(cfg, ['quantiles.3.model.a=1'])
        with pytest.raises(SystemExit, match='scalar'):
            _apply_set(cfg, ['quantiles.0.model=5', 'quantiles.0.model.a=1'])


class TestBOSSPostCLI:
    BLOCK = {
        'fsigma8': {'prior': {'dist': 'uniform', 'min': 0.05, 'max': 1.5}},
        'beta': {'prior': {'dist': 'uniform', 'min': 0.2, 'max': 0.6}},
        'sigma_v': 380.0,
        'epsilon': 1.0,
    }

    def test_cli_post_form_change(self, boss_config, tmp_path, capsys):
        """Tiny SMC run under the Sellentin form, then `post --set
        data.likelihood.form=gaussian`: at nmocks=1000 the form change is
        mild, so the ESS stays high and the moments barely move; the
        reweighted GetDist export carries a fractional-weight column."""
        import yaml
        from victor_tpu.__main__ import main
        from victor_tpu.sampling import read_getdist

        cfg = dict(boss_config)
        cfg['params'] = self.BLOCK
        p = tmp_path / 'post.yaml'
        p.write_text(yaml.safe_dump(cfg))
        root = str(tmp_path / 'c' / 'smc')
        main(['run', str(p), '--sampler', 'smc', '--particles', '48',
              '--moves', '2', '--seed', '4', '--output', root])
        capsys.readouterr()

        root2 = str(tmp_path / 'c' / 'post')
        main(['post', str(p), '--chains', root,
              '--set', 'data.likelihood.form=gaussian', '--output', root2])
        out = json.loads(capsys.readouterr().out)
        assert out['n_particles'] == 48
        assert np.isfinite(out['delta_logz'])
        assert out['efficiency'] > 0.5
        for k in ('fsigma8', 'beta'):
            assert abs(out['params_new'][k]['mean']
                       - out['params_old'][k]['mean']) < 0.05

        names, w, mlnp, samples = read_getdist(root2)
        # yaml.safe_dump alphabetizes the params block; the chain order
        # follows the (re-serialized) config, consistently end-to-end
        assert sorted(names[:2]) == ['beta', 'fsigma8']
        assert w.shape == (48,)
        assert w.mean() == pytest.approx(1.0, abs=1e-6)
        assert w.std() > 0          # fractional weights, not all-ones
        assert np.all(np.isfinite(mlnp))

    def test_cli_post_requires_a_change(self, boss_config, tmp_path):
        import yaml
        from victor_tpu.__main__ import main
        cfg = dict(boss_config)
        cfg['params'] = self.BLOCK
        p = tmp_path / 'post.yaml'
        p.write_text(yaml.safe_dump(cfg))
        with pytest.raises(SystemExit):
            main(['post', str(p), '--chains', str(tmp_path / 'c' / 'smc')])
