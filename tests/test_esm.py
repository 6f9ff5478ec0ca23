"""Excursion-set model parity tests vs the reference ExcursionSetProfile.

The reference runs here in Eisenstein-Hu mode (camb not installed; the
reference itself falls back the same way, excursion_set_profile.py:63-70).
All comparisons are in the regular (no shell-crossing) regime where our
fixed-shape masked cleanup is exactly the reference computation.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
import refshim  # noqa: E402

refshim.install()

from victor_tpu.io import build_tables  # noqa: E402
from victor_tpu.models import esm  # noqa: E402
from victor_tpu.models import ccf_theory as th  # noqa: E402
from victor_tpu.likelihood import core as lk  # noqa: E402

# CCFLikelihood.yaml defaults (victor/likelihoods/CCFLikelihood.yaml:20-27)
ESM_PARAMS = {
    'f': 0.778, 'sigma_8_0': 0.81, 'b10': -1.544, 'b01': -4.228,
    'Rp': 7.973, 'Rx': 0.467, 'Omega_m': 0.31, 'Omega_b': 0.048,
    'H0': 67.5, 'ns': 0.96, 'delta_c': 1.686,
    'beta': 0.37, 'sigma_v': 380.0, 'epsilon': 1.0,
}
Z_EFF = 0.57


def jparams(d):
    return {k: jnp.asarray(v) for k, v in d.items()}


@pytest.fixture(scope='module')
def ref_esp():
    from victor.excursion_set_profile import ExcursionSetProfile
    esp = ExcursionSetProfile(h=0.675, omega_m=0.31, omega_b=0.048, z=Z_EFF,
                              ns=0.96, use_eisenstein_hu=True)
    esp.set_normalisation(0.81, z=0)
    return esp


@pytest.fixture(scope='module')
def esm_bundle(boss_config):
    import copy
    cfg = copy.deepcopy(boss_config)
    cfg['model']['matter_ccf'] = {
        'model': 'excursion_set',
        'excursion_set_options': {'use_eisenstein_hu': True},
    }
    return build_tables(cfg['model'], cfg['data'])


class TestESMPrimitives:
    def test_growth_factor(self, ref_esp):
        for z in (0.0, 0.57, 1.2):
            got = float(esm.esm_growth_factor(jnp.asarray(z), 0.31, 0.69))
            np.testing.assert_allclose(got, ref_esp.growth_factor(z), rtol=1e-10)

    def test_sj_integrals(self, ref_esp, esm_bundle):
        st = esm.esm_state(esm_bundle.tables, esm_bundle.spec, jparams(ESM_PARAMS))
        Rq = np.linspace(5.0, 80.0, 12)
        ours = np.asarray(esm._sj_pq(st, ESM_PARAMS['Rp'], jnp.asarray(Rq),
                                     ESM_PARAMS['Rx'], j=0))
        ref = ref_esp._sj_pq(ESM_PARAMS['Rp'], Rq, ESM_PARAMS['Rx'], 0)[0]
        np.testing.assert_allclose(ours, ref, rtol=1e-7)
        ours_pp = float(esm._sj_pp(st, ESM_PARAMS['Rp'], ESM_PARAMS['Rx'], j=1))
        ref_pp = ref_esp._sj_pp(ESM_PARAMS['Rp'], ESM_PARAMS['Rx'], 1)[0][0]
        np.testing.assert_allclose(ours_pp, ref_pp, rtol=1e-7)

    def test_lagrangian_profile(self, ref_esp, esm_bundle):
        st = esm.esm_state(esm_bundle.tables, esm_bundle.spec, jparams(ESM_PARAMS))
        Rq = np.linspace(5.0, 100.0, 10)
        ours = np.asarray(esm.lagrangian_profile(
            st, jnp.asarray(Rq), ESM_PARAMS['b10'], ESM_PARAMS['b01'],
            ESM_PARAMS['Rp'], ESM_PARAMS['Rx']))
        ref = ref_esp._lagrangian_profile(Rq, ESM_PARAMS['b10'],
                                          ESM_PARAMS['b01'], ESM_PARAMS['Rp'],
                                          ESM_PARAMS['Rx'])[0]
        np.testing.assert_allclose(ours, ref, rtol=1e-6)

    def test_enclosed_profile(self, ref_esp, esm_bundle):
        t = esm_bundle.tables
        r_v = np.asarray(t.r_v)
        spl = ref_esp.model_enclosed_density_profile(
            r_v, Z_EFF, ESM_PARAMS['b10'], ESM_PARAMS['b01'],
            ESM_PARAMS['Rp'], ESM_PARAMS['Rx'])
        ours = np.asarray(esm.enclosed_profile_at(
            t, esm_bundle.spec, jparams(ESM_PARAMS), t.r_v))
        np.testing.assert_allclose(ours, spl(r_v), rtol=2e-6, atol=1e-9)

    def test_delta_profiles_combination(self, ref_esp, esm_bundle):
        """Reference delta_profiles ESM branch (victor/ccf_model.py:373-381)."""
        from scipy.interpolate import InterpolatedUnivariateSpline as IUS
        t = esm_bundle.tables
        r_v = np.asarray(t.r_v)
        spl = ref_esp.model_enclosed_density_profile(
            r_v, Z_EFF, ESM_PARAMS['b10'], ESM_PARAMS['b01'],
            ESM_PARAMS['Rp'], ESM_PARAMS['Rx'])
        Delta_ref = spl(r_v)
        deriv = np.gradient(Delta_ref, r_v)
        delta_ref = IUS(r_v, Delta_ref + r_v * deriv / 3.0, ext=3)(r_v)
        d_rv, D_rv, d_100, D_100 = th.delta_profiles(
            t, esm_bundle.spec, esm_bundle.theory_opts, jparams(ESM_PARAMS))
        np.testing.assert_allclose(np.asarray(D_rv), Delta_ref, rtol=2e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(d_rv), delta_ref, rtol=2e-6, atol=1e-8)
        # fine-grid respline (ccf_model.py:421-423)
        r100 = np.asarray(t.rgrid100)
        np.testing.assert_allclose(np.asarray(D_100),
                                   IUS(r_v, Delta_ref, ext=3)(r100),
                                   rtol=2e-6, atol=1e-8)


class TestESMEndToEnd:
    def test_likelihood_vs_reference(self, esm_bundle, boss_config):
        """Full chi2/lnL with the ESM matter model vs the shimmed reference."""
        import copy
        from victor.ccf_fit import CCFFit
        cfg = copy.deepcopy(boss_config)
        cfg['model']['matter_ccf'] = {
            'model': 'excursion_set',
            'excursion_set_options': {'use_eisenstein_hu': True},
        }
        ref_fit = CCFFit(cfg['model'], cfg['data'])
        params = dict(ESM_PARAMS)
        ref_lnl, ref_chi2 = ref_fit.log_likelihood(params)

        lnl, chi2 = lk.log_likelihood(esm_bundle.tables, esm_bundle.spec,
                                      esm_bundle.theory_opts,
                                      esm_bundle.fit_opts, jparams(params))
        np.testing.assert_allclose(float(chi2), ref_chi2, rtol=1e-5)
        np.testing.assert_allclose(float(lnl), ref_lnl, rtol=1e-5)

    def test_jit_vmap_esm(self, esm_bundle):
        """The ESM path must stay jit/vmap-safe (dynamic splines and all)."""
        t, s, o, f = (esm_bundle.tables, esm_bundle.spec,
                      esm_bundle.theory_opts, esm_bundle.fit_opts)

        def single(b10):
            p = jparams(ESM_PARAMS)
            p['b10'] = b10
            return lk.log_likelihood(t, s, o, f, p)

        lnl, chi2 = jax.jit(jax.vmap(single))(jnp.linspace(-1.6, -1.5, 4))
        assert lnl.shape == (4,)
        assert bool(jnp.all(jnp.isfinite(lnl)))

    def test_nonlinear_velocity_smoke(self, esm_bundle):
        """Nonlinear mean velocity (intended density_evolution; the reference
        implementation is unreachable, excursion_set_profile.py:460)."""
        opts = esm_bundle.theory_opts.replace(mean_model='nonlinear')
        vr, dvr = th.velocity_terms(esm_bundle.tables, esm_bundle.spec, opts,
                                    jparams(ESM_PARAMS))
        vr = np.asarray(vr)
        assert np.all(np.isfinite(vr)) and np.all(np.isfinite(np.asarray(dvr)))
        # void outflow: positive radial velocity in the interior
        assert vr[1:10].mean() > 0

    def test_s8z_derived(self, esm_bundle, ref_esp):
        got = float(esm.esm_s8z(esm_bundle.tables, esm_bundle.spec,
                                jparams(ESM_PARAMS)))
        ref = ref_esp.s8z_fiducial * np.sqrt(ref_esp.normalisation)
        np.testing.assert_allclose(got, ref, rtol=1e-8)


class TestESPClassWrapper:
    """The standalone ExcursionSetProfile class API (reference surface)."""

    def test_vs_reference_class(self, ref_esp):
        from victor_tpu import ExcursionSetProfile
        esp = ExcursionSetProfile(h=0.675, omega_m=0.31, omega_b=0.048,
                                  z=Z_EFF, ns=0.96, use_eisenstein_hu=True)
        np.testing.assert_allclose(esp.s80_fiducial, ref_esp.s80_fiducial,
                                   rtol=1e-8)
        np.testing.assert_allclose(esp.growth_factor(Z_EFF),
                                   ref_esp.growth_factor(Z_EFF), rtol=1e-10)
        esp.set_normalisation(0.81, z=0)
        np.testing.assert_allclose(esp.normalisation, ref_esp.normalisation,
                                   rtol=1e-8)
        r = np.linspace(1.0, 100.0, 25)
        ours = esp.model_enclosed_density_profile(
            r, Z_EFF, ESM_PARAMS['b10'], ESM_PARAMS['b01'],
            ESM_PARAMS['Rp'], ESM_PARAMS['Rx'])(r)
        ref = ref_esp.model_enclosed_density_profile(
            r, Z_EFF, ESM_PARAMS['b10'], ESM_PARAMS['b01'],
            ESM_PARAMS['Rp'], ESM_PARAMS['Rx'])(r)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-6, atol=1e-9)

    def test_intended_methods_run(self):
        from victor_tpu import ExcursionSetProfile
        esp = ExcursionSetProfile(h=0.675, omega_m=0.31, omega_b=0.048,
                                  z=Z_EFF, use_eisenstein_hu=True)
        esp.set_normalisation(0.81)
        r = np.linspace(1.0, 100.0, 20)
        # broken in the reference (excursion_set_profile.py:408,460) —
        # implemented as intended here
        delta = esp.model_density_profile(r, Z_EFF, -1.544, -4.228, 7.973, 0.467)
        assert np.all(np.isfinite(delta(r)))
        evo = esp.density_evolution(Z_EFF, -1.544, -4.228, 7.973, 0.467,
                                    r_max=float(r.max()))
        assert np.all(np.isfinite(evo(r)))
        pk = esp.power(np.logspace(-3, 0, 10), Z_EFF)
        assert np.all(pk > 0)

    def test_returned_profiles_are_snapshots(self):
        """A profile handed out for one z must not change when the instance
        is later queried at another z (the reference returns snapshot scipy
        splines; aliasing mutable instance state silently rewrote earlier
        profiles)."""
        from victor_tpu import ExcursionSetProfile
        esp = ExcursionSetProfile(h=0.675, omega_m=0.31, omega_b=0.048,
                                  z=Z_EFF, use_eisenstein_hu=True)
        esp.set_normalisation(0.81)
        r = np.linspace(1.0, 100.0, 20)
        args = (-1.544, -4.228, 7.973, 0.467)
        p1 = esp.model_enclosed_density_profile(r, 0.5, *args)
        v1 = p1(r)
        evo1 = esp.density_evolution(0.5, *args, r_max=float(r.max()))
        e1 = evo1(r)
        # later calls at a different z / r_max must not back-react
        esp.model_enclosed_density_profile(r, 0.9, *args)
        esp.density_evolution(0.9, *args, r_max=50.0)
        np.testing.assert_array_equal(p1(r), v1)
        np.testing.assert_array_equal(evo1(r), e1)


class TestESMGradients:
    def test_ad_matches_finite_differences(self, esm_bundle):
        """The full ESM likelihood is exactly differentiable (enables HMC
        over excursion-set + cosmology parameters)."""
        from victor_tpu.likelihood import core as lk2
        t, s, o, f = (esm_bundle.tables, esm_bundle.spec,
                      esm_bundle.theory_opts, esm_bundle.fit_opts)
        base = jparams(ESM_PARAMS)

        def nll(theta):
            p = dict(base)
            p['f'], p['b10'], p['Rp'], p['sigma_8_0'] = (theta[0], theta[1],
                                                         theta[2], theta[3])
            lnl, _ = lk2.log_likelihood(t, s, o, f, p)
            return -lnl

        theta = jnp.asarray([0.778, -1.544, 7.973, 0.81])
        g = jax.jit(jax.grad(nll))(theta)
        for i in range(4):
            eps = 1e-6
            fd = (nll(theta.at[i].add(eps)) - nll(theta.at[i].add(-eps))) / (2 * eps)
            np.testing.assert_allclose(float(g[i]), float(fd), rtol=2e-4,
                                       err_msg=f'param {i}')


class TestTophatWindowADStability:
    def test_second_order_f32_finite_and_accurate(self):
        """The spherical top-hat window must survive second-order AD in f32
        at the extreme x of the variance integrals (x ~ 1e-5 in sigma80,
        ~2e-3 in the ESM s_j integrals): plain AD of the formula stacks
        quotient rules to x^-9..x^-15 intermediates that overflow f32 and
        NaN Hessians (the custom_jvp in eisenstein_hu.tophat_window
        re-expresses W' via W and sin/x^2 so every order stays at x^-2)."""
        from victor_tpu.models.eisenstein_hu import tophat_window
        x64 = jnp.asarray([1e-5, 2e-3, 0.1, 5.0, 240.0])

        def f(scale, xs):
            return jnp.sum(tophat_window(scale * xs))

        # primal parity with the raw formula
        raw = 3.0 * (jnp.sin(x64) - x64 * jnp.cos(x64)) / x64 ** 3
        np.testing.assert_allclose(np.asarray(tophat_window(x64)),
                                   np.asarray(raw), rtol=1e-12)
        # first/second derivatives: f64 reference values
        one64 = jnp.asarray(1.0)
        g64 = jax.grad(f)(one64, x64)
        h64 = jax.jvp(lambda s: jax.grad(f)(s, x64), (one64,), (one64,))[1]
        # f32: finite and matching
        x32 = x64.astype(jnp.float32)
        one32 = jnp.asarray(1.0, jnp.float32)
        g32 = jax.grad(f)(one32, x32)
        h32 = jax.jvp(lambda s: jax.grad(f)(s, x32), (one32,), (one32,))[1]
        assert np.isfinite(float(g32)) and np.isfinite(float(h32))
        np.testing.assert_allclose(float(g32), float(g64), rtol=2e-4)
        np.testing.assert_allclose(float(h32), float(h64), rtol=2e-3)


class TestESMRandomCosmology:
    """Randomized-cosmology parity sweep: the fixture classes above pin ONE
    cosmology; these draw (h, Omega_m, Omega_b, ns, sigma_8_0, b10, b01,
    Rp, Rx, delta_c) at random within the regular (no shell-crossing) regime
    and compare the full enclosed-density profile against a freshly
    constructed reference ExcursionSetProfile — the whole cosmology-dependent
    chain (EH98 P(k), growth, sigma8 normalisation, s_j integrals, 1-halo +
    2-halo Eulerian profile) at each draw."""

    def _draw(self, seed):
        rng = np.random.default_rng(1000 + seed)
        return {
            'h': float(rng.uniform(0.62, 0.74)),
            'Omega_m': float(rng.uniform(0.26, 0.35)),
            'Omega_b': float(rng.uniform(0.042, 0.054)),
            'ns': float(rng.uniform(0.93, 1.0)),
            'sigma_8_0': float(rng.uniform(0.72, 0.92)),
            'b10': float(rng.uniform(-2.5, -0.6)),
            'b01': float(rng.uniform(-5.5, -3.0)),
            'Rp': float(rng.uniform(6.0, 10.5)),
            'Rx': float(rng.uniform(0.35, 0.70)),
            'delta_c': float(rng.uniform(1.55, 1.80)),
        }

    def _check(self, seed, esm_bundle):
        from victor.excursion_set_profile import ExcursionSetProfile
        d = self._draw(seed)
        esp = ExcursionSetProfile(h=d['h'], omega_m=d['Omega_m'],
                                  omega_b=d['Omega_b'], z=Z_EFF, ns=d['ns'],
                                  mnu=0.06, use_eisenstein_hu=True)
        esp.set_normalisation(d['sigma_8_0'], z=0)
        t = esm_bundle.tables
        r_v = np.asarray(t.r_v)
        spl = esp.model_enclosed_density_profile(
            r_v, Z_EFF, d['b10'], d['b01'], d['Rp'], d['Rx'],
            delta_c=d['delta_c'])
        params = dict(ESM_PARAMS)
        params.update(d)
        params['H0'] = 100.0 * params.pop('h')
        ours = np.asarray(esm.enclosed_profile_at(
            t, esm_bundle.spec, jparams(params), t.r_v))
        np.testing.assert_allclose(ours, spl(r_v), rtol=5e-6, atol=1e-8,
                                   err_msg=f'seed={seed} draw={d}')

    @pytest.mark.parametrize('seed', range(3))
    def test_random_cosmology(self, seed, esm_bundle):
        self._check(seed, esm_bundle)

    @pytest.mark.slow
    @pytest.mark.parametrize('seed', range(3, 12))
    def test_random_cosmology_extended(self, seed, esm_bundle):
        self._check(seed, esm_bundle)

    @pytest.mark.slow
    @pytest.mark.parametrize('seed', range(2))
    def test_random_cosmology_likelihood_e2e(self, seed, esm_bundle,
                                             boss_config):
        """Full chi2/lnL through the ESM matter model at a random cosmology
        vs the shimmed reference (the fixture e2e test pins one point; this
        ties the randomized profile sweep to the likelihood level)."""
        import copy
        from victor.ccf_fit import CCFFit
        d = self._draw(100 + seed)
        cfg = copy.deepcopy(boss_config)
        cfg['model']['matter_ccf'] = {
            'model': 'excursion_set',
            'excursion_set_options': {'use_eisenstein_hu': True},
        }
        rng = np.random.default_rng(200 + seed)
        params = dict(ESM_PARAMS)
        params.update(d)
        params['H0'] = 100.0 * params.pop('h')
        params['beta'] = float(rng.uniform(0.32, 0.42))
        params['sigma_v'] = float(rng.uniform(300.0, 420.0))
        params['epsilon'] = float(rng.uniform(0.97, 1.03))
        ref_fit = CCFFit(cfg['model'], cfg['data'])
        ref_lnl, ref_chi2 = ref_fit.log_likelihood(dict(params))
        lnl, chi2 = lk.log_likelihood(esm_bundle.tables, esm_bundle.spec,
                                      esm_bundle.theory_opts,
                                      esm_bundle.fit_opts, jparams(params))
        np.testing.assert_allclose(float(chi2), ref_chi2, rtol=2e-5,
                                   err_msg=f'seed={seed} draw={params}')
        np.testing.assert_allclose(float(lnl), ref_lnl, rtol=2e-5)
