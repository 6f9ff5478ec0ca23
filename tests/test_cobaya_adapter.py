"""Execute the cobaya adapter through cobaya's component-construction flow.

Complements test_api.py::TestCobayaAdapter (which drives initialize/calculate
directly): here we reproduce the slice of cobaya's machinery the adapter
relies on but which isn't covered there — merging the adjacent
<ClassName>.yaml class defaults under the input info before attribute
injection, evaluating string `value: "lambda ..."` derived parameters, and
the `config_file` route (reference behavior: victor/likelihoods/
CCFLikelihood.py:8-27 + CCFLikelihood.yaml:1-40). cobaya itself is not
installable in this environment, so a faithful interface double stands in.
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _install_double(monkeypatch):
    cobaya = types.ModuleType('cobaya')
    lik = types.ModuleType('cobaya.likelihood')

    class Likelihood:   # attribute-bag contract the adapter subclasses
        pass

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
