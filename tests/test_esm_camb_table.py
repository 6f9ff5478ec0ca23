"""CAMB-table ingestion path of the excursion-set model.

The reference's CAMB branch (victor/excursion_set_profile.py:84-104) runs
CAMB at a fixed cosmology; victor_tpu ingests a pregenerated table instead
(tools/make_camb_table.py) because CAMB is host-only Fortran. camb is not
installed here, so the fixture is synthetic: the Eisenstein-Hu spectrum
tabulated on a *different* (denser) k grid with its true sigma8 values.
That exercises every part of the ingestion path — npz load, spline
resample onto esm_k, esm_s80/esm_s8z bookkeeping, the esm_state CAMB
branch, and the ExcursionSetProfile(pk_table=) wrapper branch — and makes
the table-mode pipeline exactly comparable to the EH-mode pipeline (same
underlying P(k)), so consistency can be pinned tightly.
"""

import copy
import os

import numpy as np
import jax.numpy as jnp
import pytest

from victor_tpu.io import build_tables
from victor_tpu.likelihood import core as lk
from victor_tpu.models import esm
from victor_tpu.models.eisenstein_hu import (eisenstein_hu_params, power_eh,
                                             sigma80)

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
def pk_table_path(tmp_path_factory):
    """Synthetic table in the make_camb_table.py npz schema."""
    p = eisenstein_hu_params(0.675, 0.31, 0.048, ns=0.96, As=2e-9)
    k = np.logspace(-4, np.log10(2.0), 400)       # denser than esm_k (200)
    pk0 = np.asarray(power_eh(p, jnp.asarray(k)), dtype=np.float64)
    s80 = float(sigma80(p))
    Dz = float(esm.esm_growth_factor(jnp.asarray(Z_EFF), 0.31, 0.69))
    path = tmp_path_factory.mktemp('camb') / 'pk_table.npz'
    np.savez(path, k=k, pk0=pk0, sigma8_0=s80, sigma8_z=s80 * Dz,
             h=0.675, omega_m=0.31, omega_b=0.048, ns=0.96, mnu=0.0, z=Z_EFF)
    return str(path)


def _esm_cfg(boss_config, **esm_opts):
    cfg = copy.deepcopy(boss_config)
    cfg['model']['matter_ccf'] = {
        'model': 'excursion_set',
        'excursion_set_options': {'use_eisenstein_hu': False, **esm_opts},
    }
    return cfg


@pytest.fixture(scope='module')
def table_bundle(boss_config, pk_table_path):
    cfg = _esm_cfg(boss_config, pk_table_file=pk_table_path)
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
    def test_tables_populated(self, table_bundle, pk_table_path):
        t, spec = table_bundle.tables, table_bundle.spec
        assert spec.esm_use_eh is False
        with np.load(pk_table_path) as z:
            assert float(t.esm_s80) == pytest.approx(float(z['sigma8_0']))
            assert float(t.esm_s8z) == pytest.approx(float(z['sigma8_z']))
        # the table was resampled onto esm_k by a cubic IUS; against the
        # smooth EH source evaluated directly on esm_k the residual is the
        # 400-point cubic-interpolation error (~1e-5 rel near the BAO wiggles)
        p = eisenstein_hu_params(0.675, 0.31, 0.048, ns=0.96, As=2e-9)
        direct = np.asarray(power_eh(p, t.esm_k))
        np.testing.assert_allclose(np.asarray(t.esm_pk0), direct, rtol=1e-4)

    def test_esm_state_table_branch(self, table_bundle):
        """esm_state: table mode must use the stored spectrum and sigma8s
        (victor/excursion_set_profile.py:84-104 at fixed cosmology)."""
        t, spec = table_bundle.tables, table_bundle.spec
        s80_fid = float(t.esm_s80)
        st = esm.esm_state(t, spec, jparams({**ESM_PARAMS,
                                             'sigma_8_0': s80_fid}))
        # normalisation (s80/s80_fid)^2 == 1 -> pk is the table verbatim
        np.testing.assert_allclose(np.asarray(st['pk']),
                                   np.asarray(t.esm_pk0), rtol=1e-12)
        np.testing.assert_allclose(float(st['s8z']), float(t.esm_s8z),
                                   rtol=1e-12)
        # rescaling: pk scales as (s80/s80_fid)^2, s8z linearly
        st2 = esm.esm_state(t, spec, jparams({**ESM_PARAMS,
                                              'sigma_8_0': 0.9 * s80_fid}))
        np.testing.assert_allclose(np.asarray(st2['pk']),
                                   0.81 * np.asarray(t.esm_pk0), rtol=1e-6)
        np.testing.assert_allclose(float(st2['s8z']),
                                   0.9 * float(t.esm_s8z), rtol=1e-6)

    def test_fallback_without_table_file(self, boss_config):
        """use_eisenstein_hu: False with no pk_table_file must fall back to
        EH (mirrors reference fallback, excursion_set_profile.py:63-70)."""
        cfg = _esm_cfg(boss_config)  # no pk_table_file
        b = build_tables(cfg['model'], cfg['data'])
        assert b.spec.esm_use_eh is True


class TestConsistencyWithEH:
    def test_likelihood_matches_eh_mode(self, table_bundle, eh_bundle):
        """Same underlying P(k) -> same likelihood, through entirely
        different state resolution (table resample + stored sigma8s vs
        on-device EH + quadrature sigma8)."""
        lnl_t, chi2_t = lk.log_likelihood(
            table_bundle.tables, table_bundle.spec, table_bundle.theory_opts,
            table_bundle.fit_opts, jparams(ESM_PARAMS))
        lnl_e, chi2_e = lk.log_likelihood(
            eh_bundle.tables, eh_bundle.spec, eh_bundle.theory_opts,
            eh_bundle.fit_opts, jparams(ESM_PARAMS))
        assert np.isfinite(float(lnl_t))
        np.testing.assert_allclose(float(chi2_t), float(chi2_e), rtol=1e-5)
        np.testing.assert_allclose(float(lnl_t), float(lnl_e), rtol=1e-5)


class TestWrapperBranch:
    def test_excursion_set_profile_pk_table(self, pk_table_path):
        """ExcursionSetProfile(pk_table=..., use_eisenstein_hu=False) —
        the class-surface CAMB branch (victor/excursion_set_profile.py:84)."""
        from victor_tpu.models.esm import ExcursionSetProfile
        with np.load(pk_table_path) as z:
            tbl = {key: z[key] for key in z.files}
        esp = ExcursionSetProfile(h=0.675, omega_m=0.31, omega_b=0.048,
                                  z=Z_EFF, ns=0.96, use_eisenstein_hu=False,
                                  pk_table=tbl)
        assert esp.use_eisenstein_hu is False
        assert esp.s80_fiducial == pytest.approx(float(tbl['sigma8_0']))
        assert esp.s8z_fiducial == pytest.approx(float(tbl['sigma8_z']))
        esp.set_normalisation(0.81, z=0)

        eh = ExcursionSetProfile(h=0.675, omega_m=0.31, omega_b=0.048,
                                 z=Z_EFF, ns=0.96, use_eisenstein_hu=True)
        eh.set_normalisation(0.81, z=0)
        r = np.linspace(8.0, 80.0, 10)
        spl_t = esp.model_enclosed_density_profile(
            r, Z_EFF, ESM_PARAMS['b10'], ESM_PARAMS['b01'],
            ESM_PARAMS['Rp'], ESM_PARAMS['Rx'])
        spl_e = eh.model_enclosed_density_profile(
            r, Z_EFF, ESM_PARAMS['b10'], ESM_PARAMS['b01'],
            ESM_PARAMS['Rp'], ESM_PARAMS['Rx'])
        np.testing.assert_allclose(spl_t(r), spl_e(r), rtol=1e-5, atol=1e-9)

    def test_missing_table_falls_back_to_eh(self):
        from victor_tpu.models.esm import ExcursionSetProfile
        esp = ExcursionSetProfile(h=0.675, omega_m=0.31, omega_b=0.048,
                                  z=Z_EFF, use_eisenstein_hu=False,
                                  pk_table=None)
        assert esp.use_eisenstein_hu is True
