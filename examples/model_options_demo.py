#!/usr/bin/env python
"""Tour of every model option (the model_options_demo.ipynb equivalent).

Evaluates the theory/likelihood under each RSD mapping, matter model,
velocity-mean model, AP handling mode, and likelihood form, printing chi2 so
the effect of each switch is visible. Uses the shipped BOSS DR12 CMASS data.

Run from the repository root:  python examples/model_options_demo.py
"""

import os
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def show(fit, label, params, **kw):
    try:
        lnl, chi2 = fit.log_likelihood(params, **kw)
        print(f'  {label:52s} chi2 = {chi2:9.2f}  lnL = {lnl:8.2f}')
    except Exception as e:  # noqa: BLE001 - demo robustness
        print(f'  {label:52s} [{type(e).__name__}: {e}]')


def main():
    from victor_tpu import CCFFit

    with open(os.path.join(REPO, 'configs', 'boss_config.yaml')) as f:
        cfg = yaml.safe_load(f)
    cfg['model']['dir'] = REPO
    cfg['data']['dir'] = REPO
    fit = CCFFit(cfg['model'], cfg['data'])

    p = {'fsigma8': 0.47, 'beta': 0.37, 'sigma_v': 380.0, 'epsilon': 1.0}

    print('RSD models (victor/ccf_model.py:649-784):')
    show(fit, 'streaming (Gaussian streaming model)', p)
    show(fit, 'dispersion (change-of-variables streaming)', p,
         rsd_model='dispersion')
    show(fit, 'kaiser', p, rsd_model='kaiser')
    show(fit, 'kaiser + approximation', p, rsd_model='kaiser',
         kaiser_approximation=True)
    show(fit, 'kaiser without coordinate shift (Hamaus-style)', p,
         rsd_model='kaiser', kaiser_coord_shift=False)
    show(fit, 'kaiser with M/Q nuisances', {**p, 'M': 1.1, 'Q': 0.9},
         rsd_model='kaiser')
    show(fit, 'euclid_special', p, rsd_model='euclid_special')

    print('\nVelocity options (victor/ccf_model.py:385-492):')
    show(fit, 'linear continuity equation', p)
    show(fit, 'empirical correction (1 + A_v delta)', {**p, 'Av': 0.5},
         empirical_corr=True)
    show(fit, 'anisotropic real-space input', p, assume_isotropic=False)

    print('\nAP handling (victor/ccf_model.py:589-613):')
    show(fit, 'epsilon (+alpha) parameterisation', p)
    show(fit, '(aperp, apar) parameterisation',
         {'fsigma8': 0.47, 'beta': 0.37, 'sigma_v': 380.0,
          'aperp': 1.0, 'apar': 1.0})
    show(fit, 'AP-independent rescaling via astar',
         {**p, 'astar': 1.0}, velocity_independent_of_AP=True)

    print('\nLikelihood forms (victor/ccf_fit.py:415-473):')
    for form in ['gaussian', 'hartlap', 'sellentin', 'percival']:
        show(fit, form, p, form=form)
    show(fit, 'likelihood-level beta interpolation', p,
         beta_interpolation='likelihood')

    print('\nExcursion-set matter model (victor/excursion_set_profile.py, '
          'Eisenstein-Hu mode):')
    import copy
    esm_cfg = copy.deepcopy(cfg)
    esm_cfg['model']['matter_ccf'] = {
        'model': 'excursion_set',
        'excursion_set_options': {'use_eisenstein_hu': True}}
    esm_fit = CCFFit(esm_cfg['model'], esm_cfg['data'])
    esm_p = {'f': 0.778, 'sigma_8_0': 0.81, 'b10': -1.544, 'b01': -4.228,
             'Rp': 7.973, 'Rx': 0.467, 'beta': 0.37, 'sigma_v': 380.0,
             'epsilon': 1.0}
    show(esm_fit, 'excursion_set matter + linear velocity', esm_p)
    show(esm_fit, 'excursion_set + nonlinear velocity (intended impl)',
         esm_p, mean_model='nonlinear')


if __name__ == '__main__':
    main()
