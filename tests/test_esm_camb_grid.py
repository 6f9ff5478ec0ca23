"""Varying-cosmology CAMB-grid mode of the excursion-set model.

The reference, with camb installed, rebuilds ExcursionSetProfile per
cosmology tuple through an lru_cache factory
(victor/excursion_set_profile.py:84-104, ccf_model.py:19-22), so a chain
can vary (h, Omega_m, Omega_b, ns) with CAMB-grade P(k). victor_tpu's
device-evaluable analogue ingests a GRID of generator tables
(tools/make_camb_table.py --grid) and multilinearly interpolates log P(k)
per likelihood call (models/esm.py:_esm_grid_interp).

camb is not installable here, so the fixture grid is generated from the
Eisenstein-Hu formula — deliberately: an EH-generated grid makes the
grid-mode pipeline exactly comparable to the direct EH-mode pipeline
(same underlying P(k)), isolating the grid machinery. At grid points the
two must agree to resampling precision; off-grid the difference is pure
interpolation error, bounded here and at posterior level in BASELINE.md.
"""

import copy
import itertools
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from victor_tpu.errors import InputError
from victor_tpu.io import build_tables
from victor_tpu.likelihood import core as lk
from victor_tpu.models import esm
from victor_tpu.models.eisenstein_hu import (eisenstein_hu_params, power_eh,
                                             sigma80)
from victor_tpu.ops.special import growth_factor_lcdm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
Z_EFF = 0.57

ESM_PARAMS = {
    'f': 0.778, 'sigma_8_0': 0.81, 'b10': -1.544, 'b01': -4.228,
    'Rp': 7.973, 'Rx': 0.467, 'Omega_m': 0.31, 'Omega_b': 0.048,
    'H0': 67.5, 'ns': 0.96, 'delta_c': 1.686,
    'beta': 0.37, 'sigma_v': 380.0, 'epsilon': 1.0,
}

AXES = {
    'H0': np.array([65.0, 67.5, 70.0]),
    'Omega_m': np.array([0.29, 0.31, 0.33]),
    'Omega_b': np.array([0.048]),              # singleton axis path
    'ns': np.array([0.92, 0.96, 1.0]),
}


def jparams(d):
    return {k: jnp.asarray(v) for k, v in d.items()}


def _eh_table(H0, omm, omb, ns, k):
    p = eisenstein_hu_params(H0 / 100.0, omm, omb, ns=ns, As=2e-9)
    pk0 = np.asarray(power_eh(p, jnp.asarray(k)), dtype=np.float64)
    s80 = float(sigma80(p))
    s8z = s80 * float(growth_factor_lcdm(Z_EFF, omm, 1.0 - omm))
    return pk0, s80, s8z


@pytest.fixture(scope='module')
def grid_path(tmp_path_factory):
    """Synthetic EH-generated grid in the make_camb_table.py --grid schema
    (different, denser k grid than esm_k to exercise the resample)."""
    k = np.logspace(-4, np.log10(2.0), 400)
    names = list(AXES)
    shape = tuple(len(AXES[n]) for n in names)
    logpk = np.empty(shape + (len(k),))
    s80g = np.empty(shape)
    s8zg = np.empty(shape)
    for idx in itertools.product(*(range(n) for n in shape)):
        vals = {n: AXES[n][idx[a]] for a, n in enumerate(names)}
        pk0, s80, s8z = _eh_table(vals['H0'], vals['Omega_m'],
                                  vals['Omega_b'], vals['ns'], k)
        logpk[idx] = np.log(pk0)
        s80g[idx] = s80
        s8zg[idx] = s8z
    path = tmp_path_factory.mktemp('cambgrid') / 'pk_grid.npz'
    out = {'k': k, 'axis_names': np.asarray(names), 'logpk0': logpk,
           'sigma8_0': s80g, 'sigma8_z': s8zg, 'z': Z_EFF}
    for n in names:
        out[f'grid_{n}'] = AXES[n]
    np.savez(path, **out)
    return str(path)


def _esm_cfg(boss_config, **esm_opts):
    cfg = copy.deepcopy(boss_config)
    cfg['model']['matter_ccf'] = {
        'model': 'excursion_set',
        'excursion_set_options': {'use_eisenstein_hu': False, **esm_opts},
    }
    return cfg


@pytest.fixture(scope='module')
def grid_bundle(boss_config, grid_path):
    cfg = _esm_cfg(boss_config, pk_grid_file=grid_path)
    return build_tables(cfg['model'], cfg['data'])


@pytest.fixture(scope='module')
def eh_bundle(boss_config):
    cfg = copy.deepcopy(boss_config)
    cfg['model']['matter_ccf'] = {
        'model': 'excursion_set',
        'excursion_set_options': {'use_eisenstein_hu': True},
    }
    return build_tables(cfg['model'], cfg['data'])


class TestIngestion:
    def test_grid_tables_load(self, grid_bundle):
        t, spec = grid_bundle.tables, grid_bundle.spec
        assert not spec.esm_use_eh
        assert spec.esm_grid_names == ('H0', 'Omega_m', 'Omega_b', 'ns')
        assert t.esm_pk_grid.shape == (27, 200)
        assert t.esm_s80_grid.shape == (27,)
        assert len(t.esm_grid_axes) == 4

    def test_shape_mismatch_raises(self, boss_config, grid_path, tmp_path):
        g = dict(np.load(grid_path, allow_pickle=False))
        g['logpk0'] = g['logpk0'][:2]                 # break the axis match
        bad = tmp_path / 'bad.npz'
        np.savez(bad, **g)
        with pytest.raises(InputError, match='does not match the axis'):
            build_tables(
                _esm_cfg(boss_config, pk_grid_file=str(bad))['model'],
                boss_config['data'])

    def test_non_monotone_axis_raises(self, boss_config, grid_path,
                                      tmp_path):
        g = dict(np.load(grid_path, allow_pickle=False))
        g['grid_H0'] = np.array([70.0, 67.5, 65.0])
        bad = tmp_path / 'bad2.npz'
        np.savez(bad, **g)
        with pytest.raises(InputError, match='strictly increasing'):
            build_tables(
                _esm_cfg(boss_config, pk_grid_file=str(bad))['model'],
                boss_config['data'])


class TestInterpolation:
    def test_exact_at_grid_points_matches_eh(self, grid_bundle, eh_bundle):
        """At a grid node the interpolation collapses to that node's table,
        which was generated from the same EH formula the EH branch
        evaluates on device: pk and s8z must agree to resample precision
        across several nodes."""
        for H0, omm, ns in [(65.0, 0.29, 0.92), (67.5, 0.31, 0.96),
                            (70.0, 0.33, 1.0), (65.0, 0.33, 0.96)]:
            params = jparams({**ESM_PARAMS, 'H0': H0, 'Omega_m': omm,
                              'ns': ns})
            st_g = esm.esm_state(grid_bundle.tables, grid_bundle.spec,
                                 params)
            st_e = esm.esm_state(eh_bundle.tables, eh_bundle.spec, params)
            np.testing.assert_allclose(np.asarray(st_g['pk']),
                                       np.asarray(st_e['pk']), rtol=5e-6)
            np.testing.assert_allclose(float(st_g['s8z']),
                                       float(st_e['s8z']), rtol=1e-7)

    def test_off_grid_tracks_eh(self, grid_bundle, eh_bundle):
        """Between nodes the multilinear log-P(k) interpolation must track
        the direct EH evaluation to the expected interpolation error for
        these axis spacings (measured ~1e-3 relative; bound 1%)."""
        params = jparams({**ESM_PARAMS, 'H0': 66.4, 'Omega_m': 0.302,
                          'ns': 0.945})
        st_g = esm.esm_state(grid_bundle.tables, grid_bundle.spec, params)
        st_e = esm.esm_state(eh_bundle.tables, eh_bundle.spec, params)
        pk_g, pk_e = np.asarray(st_g['pk']), np.asarray(st_e['pk'])
        assert np.max(np.abs(np.log(pk_g) - np.log(pk_e))) < 0.01
        np.testing.assert_allclose(float(st_g['s8z']), float(st_e['s8z']),
                                   rtol=2e-3)

    def test_outside_hull_clamps_to_edge(self, grid_bundle):
        edge = esm.esm_state(grid_bundle.tables, grid_bundle.spec,
                             jparams({**ESM_PARAMS, 'H0': 65.0}))
        beyond = esm.esm_state(grid_bundle.tables, grid_bundle.spec,
                               jparams({**ESM_PARAMS, 'H0': 60.0}))
        np.testing.assert_allclose(np.asarray(beyond['pk']),
                                   np.asarray(edge['pk']), rtol=1e-12)

    def test_absent_axis_param_uses_eh_default(self, grid_bundle,
                                               eh_bundle):
        """A chain that does not sample an axis parameter must interpolate
        at the same default EH mode would use (ns = 0.96 here)."""
        p = {k: v for k, v in ESM_PARAMS.items() if k != 'ns'}
        st_g = esm.esm_state(grid_bundle.tables, grid_bundle.spec,
                             jparams(p))
        st_e = esm.esm_state(eh_bundle.tables, eh_bundle.spec, jparams(p))
        np.testing.assert_allclose(np.asarray(st_g['pk']),
                                   np.asarray(st_e['pk']), rtol=5e-6)


class TestEndToEnd:
    def test_likelihood_matches_eh_at_grid_point(self, grid_bundle,
                                                 eh_bundle):
        lnl_g, chi2_g = lk.log_likelihood(
            grid_bundle.tables, grid_bundle.spec, grid_bundle.theory_opts,
            grid_bundle.fit_opts, jparams(ESM_PARAMS))
        lnl_e, chi2_e = lk.log_likelihood(
            eh_bundle.tables, eh_bundle.spec, eh_bundle.theory_opts,
            eh_bundle.fit_opts, jparams(ESM_PARAMS))
        np.testing.assert_allclose(float(chi2_g), float(chi2_e), rtol=1e-6)
        np.testing.assert_allclose(float(lnl_g), float(lnl_e), rtol=1e-6)

    def test_likelihood_gradient_through_grid_cosmology(self, grid_bundle):
        """The chain path: gradients through the interpolated P(k) w.r.t.
        the grid-axis cosmology parameters are finite and nonzero (the
        whole ESM pipeline stays differentiable in grid mode)."""
        import jax

        def lnl(th):
            p = dict(jparams(ESM_PARAMS))
            p['H0'], p['Omega_m'], p['ns'] = th[0], th[1], th[2]
            return lk.log_likelihood(
                grid_bundle.tables, grid_bundle.spec,
                grid_bundle.theory_opts, grid_bundle.fit_opts, p)[0]
        g = np.asarray(jax.grad(lnl)(jnp.asarray([66.4, 0.302, 0.945])))
        assert np.all(np.isfinite(g))
        assert np.any(np.abs(g) > 0)

    def test_tool_generates_loadable_grid(self, boss_config, tmp_path):
        """make_camb_table.py --grid --generator eh end-to-end: the tool's
        output loads through the ingestion path and matches a direct EH
        evaluation at a grid node."""
        out = tmp_path / 'toolgrid.npz'
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, 'tools',
                                          'make_camb_table.py'),
             '--z', str(Z_EFF), '--generator', 'eh',
             '--grid', 'H0=65,70', '--grid', 'Omega_m=0.29,0.33',
             '--npts', '400', '--out', str(out)],
            capture_output=True, text=True, timeout=300,
            env=dict(os.environ, JAX_PLATFORMS='cpu'))
        assert r.returncode == 0, r.stderr
        assert '2-axis grid (2, 2)' in r.stdout
        cfg = _esm_cfg(boss_config, pk_grid_file=str(out))
        b = build_tables(cfg['model'], cfg['data'])
        assert b.spec.esm_grid_names == ('H0', 'Omega_m')
        st = esm.esm_state(b.tables, b.spec,
                           jparams({**ESM_PARAMS, 'H0': 70.0,
                                    'Omega_m': 0.29, 'ns': 0.96}))
        p = eisenstein_hu_params(0.70, 0.29, 0.048, ns=0.96, As=2e-9)
        pk_direct = np.asarray(power_eh(
            p, jnp.asarray(np.asarray(b.tables.esm_k))))
        norm = (0.81 / float(sigma80(p))) ** 2
        np.testing.assert_allclose(np.asarray(st['pk']), pk_direct * norm,
                                   rtol=2e-5)
