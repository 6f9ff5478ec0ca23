"""Randomized-configuration parity fuzz vs the executed reference.

The golden/option-parity tests pin the fixed BOSS tables; this fuzz layer
re-samples the *shapes* and *values* of every table (β sub-grids of different
lengths for model/data/covariance independently, contiguous s-bin subsets with
the matching covariance rows/cols, smooth multiplicative perturbations of the
multipoles / δ-template / σ_v-template / covariance) and draws random option
combinations (rsd_model × likelihood form × β-interpolation × isotropy ×
matter model × empirical correction × AP-rescale mode × kaiser toggles) and
random parameter points, asserting (lnL, χ²) parity against the actual
reference code (tools/refshim) at 1e-7. Catches loader/shape/option-plumbing
edge cases the fixed-grid goldens cannot (reference surface:
victor/ccf_model.py:99-297, victor/ccf_fit.py:44-260,356-483).
"""

import copy
import os
import sys

import h5py
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
import refshim  # noqa: E402

refshim.install()

from victor_tpu.io import build_tables  # noqa: E402
from victor_tpu.likelihood import core as lk  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_FAST = 9      # seeds run in the default suite (9 not 6: seed 8 is the
                # only early euclid_special draw, and the default tier must
                # cover every rsd model + the from_data / likelihood-interp
                # / linear_bias axes — test_default_tier_covers_named_axes)
N_SLOW = 41     # additional seeds under --runslow (widened in round 4 —
                # seeds 9..49 include 10 more from_data/likelihood-interp/
                # linear_bias crossings at ~3-5 s each)


def _smooth(rng, x, amp, order=3):
    """Smooth random perturbation field on x: a low-order Chebyshev series
    with |value| <~ amp (keeps the perturbed tables physical and splinable)."""
    xh = 2.0 * (x - x.min()) / (x.max() - x.min()) - 1.0
    coef = rng.normal(0.0, 1.0, order + 1) / (order + 1)
    return amp * np.polynomial.chebyshev.chebval(xh, coef)


def _fuzz_scenario(rng):
    """Structural variants beyond value/shape perturbations. Drawn FIRST so
    the file writer and the config builder stay consistent."""
    return {
        # (r, mu)-format fixed real-space input instead of beta-grid multipoles
        'rmu_model': bool(rng.random() < 0.2),
        # 3-key anisotropic sigma_v(r, mu) dispersion template
        'aniso_sv': bool(rng.random() < 0.3),
        # template provides the INTEGRATED profile Delta(r) (integrated: True)
        'integrated': bool(rng.random() < 0.25),
        # single fixed covariance matrix instead of the beta grid
        'fixed_cov': bool(rng.random() < 0.25),
        # real-space CCF measured from the data, not a template: inverse-AP
        # coordinate shifts apply at evaluation (victor/ccf_model.py:72-77,
        # 673-679) — crossed against every other axis here
        'from_data': bool(rng.random() < 0.25),
        # savgol radial filter of the dispersion template: reference default
        # (window 3, order 1), disabled, or window 5 / order 2
        'filter_variant': str(rng.choice(['default', 'off', 'w5o2'])),
    }


def _perturbed_files(rng, tmp_path, sc):
    """Write randomly perturbed / re-shaped model, data, and covariance HDF5
    files for scenario `sc`; return (model_file, data_file, cov_file)."""
    base = os.path.join(REPO, 'data', 'BOSS_DR12_CMASS_data')
    with h5py.File(os.path.join(
            base, 'CMASS_zobovVoids_reconRs10_0.43z0.7_medianRvcut_'
                  'PatchyMean_model.hdf5')) as f:
        m = {k: f[k][:] for k in f}
    with h5py.File(os.path.join(
            base, 'CMASS_zobovVoids_reconRs10_0.43z0.7_medianRvcut_'
                  'data.hdf5')) as f:
        d = {k: f[k][:] for k in f}
    with h5py.File(os.path.join(
            base, 'CMASS_zobovVoids_reconRs10_0.43z0.7_medianRvcut_'
                  'variable_D_covariance.hdf5')) as f:
        c = {k: f[k][:] for k in f}

    # --- model file: independent beta sub-grid + smooth value perturbations
    mstep = int(rng.integers(1, 3))
    msel = slice(None, None, mstep)
    r = m['r']
    mono = m['monopole'][msel] * (1.0 + _smooth(rng, r, 0.03)[None, :])
    quad = m['quadrupole'][msel] + _smooth(rng, r, 0.005)[None, :]
    delta = m['delta'] * (1.0 + _smooth(rng, m['rdelta'], 0.04))
    sigmav = m['sigmav'] * (1.0 + _smooth(rng, m['rsv'], 0.04))
    model_file = tmp_path / 'fuzz_model.hdf5'
    with h5py.File(model_file, 'w') as f:
        if sc['rmu_model']:
            # fixed (non-reconstruction) (r, mu)-grid input built from the
            # central beta row (reference converts it to multipoles on load,
            # victor/ccf_model.py:169-181)
            n_mu = int(rng.integers(48, 81))
            mu = np.linspace(0.0, 1.0, n_mu)
            p2 = 1.5 * mu ** 2 - 0.5
            ib = mono.shape[0] // 2
            f.create_dataset('mu', data=mu)
            f.create_dataset('xi_rmu', data=(mono[ib][:, None]
                                             + quad[ib][:, None] * p2[None, :]))
        else:
            f.create_dataset('beta', data=m['beta'][msel])
            f.create_dataset('monopole', data=mono)
            f.create_dataset('quadrupole', data=quad)
        f.create_dataset('r', data=r)
        f.create_dataset('rdelta', data=m['rdelta'])
        # integrated mode reuses the (perturbed) delta values as Delta(r):
        # parity only needs both codes to ingest the same numbers the same way
        f.create_dataset('delta', data=delta)
        f.create_dataset('rsv', data=m['rsv'])
        if sc['aniso_sv']:
            n_musv = int(rng.integers(11, 22))
            mu_sv = np.linspace(0.0, 1.0, n_musv)
            shape = 1.0 + rng.uniform(0.05, 0.4) * mu_sv ** 2 \
                + rng.uniform(-0.15, 0.15) * mu_sv ** 4
            f.create_dataset('musv', data=mu_sv)
            f.create_dataset('sigmav2d', data=sigmav[:, None] * shape[None, :])
        else:
            f.create_dataset('sigmav', data=sigmav)

    # --- data + covariance: shared contiguous s-bin subset (the covariance
    # rows/cols must track the data vector: indices [S, n_s0 + S] for l=0,2)
    n_s0 = d['s'].size
    start = int(rng.integers(0, 3))
    n_s = int(rng.integers(24, n_s0 - start + 1))
    S = np.arange(start, start + n_s)
    dstep = int(rng.integers(1, 3))
    dsel = slice(None, None, dstep)
    data_file = tmp_path / 'fuzz_data.hdf5'
    with h5py.File(data_file, 'w') as f:
        f.create_dataset('beta', data=d['beta'][dsel])
        f.create_dataset('s', data=d['s'][S])
        f.create_dataset('monopole',
                         data=(d['monopole'][dsel][:, S]
                               + _smooth(rng, d['s'][S], 0.01)[None, :]))
        f.create_dataset('quadrupole',
                         data=(d['quadrupole'][dsel][:, S]
                               + _smooth(rng, d['s'][S], 0.005)[None, :]))

    cstep = int(rng.integers(1, 3))
    csel = slice(None, None, cstep)
    idx = np.concatenate([S, n_s0 + S])
    cov = c['covmat'][csel][:, idx][:, :, idx]
    scale = 1.0 + _smooth(rng, np.arange(idx.size, dtype=float), 0.05)
    cov = cov * scale[None, :, None] * scale[None, None, :]  # SPD-preserving
    cov_file = tmp_path / 'fuzz_cov.hdf5'
    with h5py.File(cov_file, 'w') as f:
        if sc['fixed_cov']:
            f.create_dataset('covmat', data=cov[cov.shape[0] // 2])
        else:
            f.create_dataset('beta', data=c['beta'][csel])
            f.create_dataset('covmat', data=cov)

    return str(model_file), str(data_file), str(cov_file)


def _random_config(rng, sc, model_file, data_file, cov_file):
    rsd = rng.choice(['streaming', 'dispersion', 'kaiser', 'euclid_special'])
    form = rng.choice(['gaussian', 'hartlap', 'sellentin', 'percival'])
    if sc['rmu_model']:
        realspace = {'reconstruction': False, 'format': 'rmu',
                     'ccf_keys': ['r', 'mu', 'xi_rmu'],
                     'assume_isotropic': bool(rng.integers(0, 2))}
    else:
        realspace = {'reconstruction': True, 'beta_key': 'beta',
                     'format': 'multipoles',
                     'ccf_keys': ['r', 'monopole', 'quadrupole'],
                     'assume_isotropic': bool(rng.integers(0, 2))}
    if sc['from_data']:
        realspace['from_data'] = True
    dispersion = {'model': 'template',
                  'template_keys': (['rsv', 'musv', 'sigmav2d']
                                    if sc['aniso_sv'] else ['rsv', 'sigmav'])}
    if sc['filter_variant'] == 'off':
        dispersion['filter'] = False
    elif sc['filter_variant'] == 'w5o2':
        dispersion['filter_window'] = 5
        dispersion['filter_order'] = 2
    model = {
        'input_model_data_file': model_file, 'dir': '',
        'rsd_model': str(rsd), 'z_eff': 0.57,
        'cosmology': {'Omega_m': 0.31},
        'realspace_ccf': realspace,
        'matter_ccf': {'model': 'template', 'integrated': sc['integrated'],
                       'template_keys': ['rdelta', 'delta'],
                       'template_sigma8': 0.628, 'bias': 1.9},
        'velocity_pdf': {
            'mean': {'model': 'linear',
                     'empirical_corr': bool(rng.integers(0, 2))},
            'dispersion': dispersion,
            'rescale_templates_independent_of_AP': bool(rng.integers(0, 2))},
    }
    params = {'fsigma8': float(rng.uniform(0.35, 0.60)),
              'beta': float(rng.uniform(0.30, 0.45)),
              'sigma_v': float(rng.uniform(280.0, 430.0)),
              'epsilon': float(rng.uniform(0.96, 1.04))}
    if model['velocity_pdf']['mean']['empirical_corr']:
        params['Av'] = float(rng.uniform(-0.5, 0.5))
    if rsd in ('dispersion', 'kaiser', 'euclid_special'):
        # NOTE the reference SILENTLY IGNORES a config-level `niter:` (its
        # init whitelist drops it, victor/ccf_model.py:85-97; only the
        # per-call kwarg override at theory_xi time is honored). victor_tpu
        # honors it in both places (documented superset — PARITY.md), so the
        # reference call must receive it as a kwarg (_run_case).
        model['niter'] = int(rng.integers(3, 7))
    if rsd == 'dispersion':
        model['dispersion_interior'] = 'exact'  # victor_tpu-only key; the
        # reference ignores it — pins exact-parity fixed-point iterations
    if rsd == 'kaiser':
        model['kaiser_approximation'] = bool(rng.integers(0, 2))
        model['kaiser_coord_shift'] = bool(rng.integers(0, 2))
        if rng.integers(0, 2):
            params['M'] = float(rng.uniform(0.9, 1.1))
            params['Q'] = float(rng.uniform(0.9, 1.1))
    if rng.integers(0, 2):
        model['matter_ccf'] = {'model': 'linear_bias', 'bias': 1.9,
                               'template_sigma8': 0.628}
        params['bias'] = float(rng.uniform(1.7, 2.1))
    data = {
        'redshift_space_ccf': {
            'reconstruction': True, 'data_file': data_file, 'dir': '',
            'beta_key': 'beta',  # the data's own (independently re-sampled)
            # beta grid — without it the reference defaults to the MODEL grid
            'format': 'multipoles', 'ccf_keys': ['s', 'monopole',
                                                 'quadrupole']},
        'covariance_matrix': ({'data_file': cov_file, 'cov_key': 'covmat',
                               'fixed_beta': True} if sc['fixed_cov'] else
                              {'data_file': cov_file, 'cov_key': 'covmat',
                               'fixed_beta': False, 'beta_key': 'beta'}),
        'beta_interpolation': str(rng.choice(['datavector', 'likelihood'])),
        'likelihood': {'form': str(form), 'nmocks': 1000, 'nparams': 4},
        'dir': '',
    }
    return model, data, params


def _run_case(seed, tmp_path):
    rng = np.random.default_rng(seed)
    sc = _fuzz_scenario(rng)
    files = _perturbed_files(rng, tmp_path, sc)
    model, data, params = _random_config(rng, sc, *files)

    from victor.ccf_fit import CCFFit
    fit = CCFFit(copy.deepcopy(model), copy.deepcopy(data))
    ref_kwargs = {}
    if 'niter' in model:
        ref_kwargs['niter'] = model['niter']  # kwarg-only in the reference
    ref = fit.log_likelihood(dict(params), **ref_kwargs)

    b = build_tables(copy.deepcopy(model), copy.deepcopy(data))
    got = lk.log_likelihood(b.tables, b.spec, b.theory_opts, b.fit_opts,
                            {k: jnp.asarray(v) for k, v in params.items()})
    np.testing.assert_allclose((float(got[0]), float(got[1])), ref, rtol=1e-7,
                               err_msg=f'seed={seed} model={model} '
                                       f'params={params}')


@pytest.mark.parametrize('seed', range(N_FAST))
def test_fuzz_parity(seed, tmp_path):
    _run_case(seed, tmp_path)


@pytest.mark.slow
@pytest.mark.parametrize('seed', range(N_FAST, N_FAST + N_SLOW))
def test_fuzz_parity_extended(seed, tmp_path):
    _run_case(seed, tmp_path)


def test_default_tier_covers_named_axes(tmp_path):
    """The default-tier seeds must COLLECTIVELY draw every named scenario
    axis — the from_data inverse-AP shift, beta_interpolation='likelihood',
    the linear_bias matter model, every rsd model, every likelihood form,
    anisotropic sigma_v, and the fixed covariance — so an interaction bug
    on any axis cannot hide behind an unlucky seed shuffle (this replays
    the exact rng streams _run_case consumes)."""
    seen = {'from_data': 0, 'likelihood_interp': 0, 'linear_bias': 0,
            'aniso_sv': 0, 'fixed_cov': 0, 'rmu_model': 0}
    rsds, forms = set(), set()
    for seed in range(N_FAST):
        d = tmp_path / str(seed)
        d.mkdir()
        rng = np.random.default_rng(seed)
        sc = _fuzz_scenario(rng)
        files = _perturbed_files(rng, d, sc)
        model, data, params = _random_config(rng, sc, *files)
        seen['from_data'] += model['realspace_ccf'].get('from_data', False)
        seen['likelihood_interp'] += \
            data['beta_interpolation'] == 'likelihood'
        seen['linear_bias'] += model['matter_ccf']['model'] == 'linear_bias'
        seen['aniso_sv'] += sc['aniso_sv']
        seen['fixed_cov'] += sc['fixed_cov']
        seen['rmu_model'] += sc['rmu_model']
        rsds.add(model['rsd_model'])
        forms.add(data['likelihood']['form'])
    missing = [k for k, v in seen.items() if v == 0]
    assert not missing, f'default fuzz tier never draws: {missing} ({seen})'
    assert rsds == {'streaming', 'dispersion', 'kaiser', 'euclid_special'}, \
        rsds
    assert len(forms) >= 3, forms
