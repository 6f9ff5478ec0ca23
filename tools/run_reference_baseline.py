"""Run the reference implementation (via tools/refshim) to:

1. verify the shimmed reference reproduces the notebook cell-22 golden checkpoints
   (victor_usage_demo.ipynb: streaming chi2=65.01 etc.),
2. measure single-CPU likelihood throughput (the BASELINE.md denominator),
3. dump golden fixtures (chi2/lnlike over a parameter grid and per-stage
   intermediates) to tests/fixtures/ for parity tests of the new framework.

Usage:  python tools/run_reference_baseline.py [--quick]
"""

import json
import os
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(__file__))
import refshim

refshim.install()

from victor import CCFFit  # noqa: E402  (the reference package)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, 'tests', 'fixtures')


def load_config():
    with open('/root/reference/config/boss_config.yaml') as f:
        cfg = yaml.safe_load(f)
    # make data paths absolute against the repo's copy of the data
    cfg['model']['dir'] = REPO
    cfg['data']['dir'] = REPO
    return cfg


def main():
    quick = '--quick' in sys.argv
    cfg = load_config()
    t0 = time.time()
    fit = CCFFit(cfg['model'], cfg['data'])
    t_init = time.time() - t0
    print(f'reference init: {t_init:.2f}s')

    ref_params = {'fsigma8': 0.47, 'beta': 0.37, 'sigma_v': 380, 'epsilon': 1.0}

    # --- golden checkpoints (notebook cell 22) ---
    results = {}
    lnl, chi2 = fit.log_likelihood(dict(ref_params))
    results['streaming'] = (float(chi2), float(lnl))
    lnl, chi2 = fit.log_likelihood(dict(ref_params), rsd_model='dispersion')
    results['dispersion'] = (float(chi2), float(lnl))
    lnl, chi2 = fit.log_likelihood(dict(ref_params), rsd_model='kaiser')
    results['kaiser'] = (float(chi2), float(lnl))
    lnl, chi2 = fit.log_likelihood(dict(ref_params), assume_isotropic=False)
    results['streaming_aniso'] = (float(chi2), float(lnl))
    lnl, chi2 = fit.log_likelihood(dict(ref_params), beta_interpolation='likelihood')
    results['beta_interp_likelihood'] = (float(chi2), float(lnl))

    expected = {'streaming': 65.01, 'dispersion': 65.03, 'kaiser': 103.90,
                'streaming_aniso': 64.39, 'beta_interp_likelihood': 64.80}
    print('--- golden checkpoints ---')
    ok = True
    for k, (chi2, lnl) in results.items():
        match = abs(chi2 - expected[k]) < 0.02
        ok &= match
        print(f'{k:28s} chi2={chi2:8.3f} lnL={lnl:8.3f}  expect chi2~{expected[k]:.2f} '
              f'{"OK" if match else "MISMATCH"}')
    if not ok:
        print('WARNING: shimmed reference does NOT reproduce notebook goldens!')

    # --- throughput measurement ---
    rng = np.random.default_rng(42)
    n = 5 if quick else 50
    pts = []
    for _ in range(n):
        pts.append({'fsigma8': float(rng.uniform(0.3, 0.6)),
                    'beta': float(rng.uniform(0.25, 0.55)),
                    'sigma_v': float(rng.uniform(250, 450)),
                    'epsilon': float(rng.uniform(0.9, 1.1))})
    t0 = time.time()
    vals = [fit.log_likelihood(dict(p)) for p in pts]
    dt = time.time() - t0
    evals_per_sec = n / dt
    print(f'reference throughput: {evals_per_sec:.2f} likelihood evals/sec '
          f'({dt/n*1000:.1f} ms/eval, single CPU)')

    # --- fixtures ---
    os.makedirs(FIXDIR, exist_ok=True)
    fix = {
        'ref_params': np.array([ref_params['fsigma8'], ref_params['beta'],
                                ref_params['sigma_v'], ref_params['epsilon']]),
        'golden_names': np.array(list(results.keys())),
        'golden_chi2': np.array([results[k][0] for k in results]),
        'golden_lnl': np.array([results[k][1] for k in results]),
        'grid_params': np.array([[p['fsigma8'], p['beta'], p['sigma_v'], p['epsilon']]
                                 for p in pts]),
        'grid_lnl': np.array([v[0] for v in vals]),
        'grid_chi2': np.array([v[1] for v in vals]),
    }

    # per-stage intermediates at the reference point for finer-grained parity tests
    th_vec = fit.theory_multipole_vector(fit.s, dict(ref_params), fit.poles_s)
    fix['theory_vector'] = th_vec
    fix['data_vector'] = fit.multipole_datavector(ref_params['beta'])
    fix['cov_interp'] = fit.get_interpolated_covariance(ref_params['beta'])
    fix['icov_interp'] = fit.get_interpolated_precision(ref_params['beta'])
    mults = fit.theory_multipoles(fit.s, dict(ref_params), [0, 2])
    fix['theory_mult_0'] = mults['0']
    fix['theory_mult_2'] = mults['2']
    s_grid, mu_grid = fit.s, np.linspace(0, 1, 100)
    fix['xi_smu'] = fit.theory_xi(s_grid, mu_grid, dict(ref_params))
    fix['xi_smu_dispersion'] = fit.theory_xi(s_grid, mu_grid, dict(ref_params),
                                             rsd_model='dispersion')
    fix['xi_smu_kaiser'] = fit.theory_xi(s_grid, mu_grid, dict(ref_params),
                                         rsd_model='kaiser')
    fix['xi_smu_euclid'] = fit.theory_xi(s_grid, mu_grid, dict(ref_params),
                                         rsd_model='euclid_special')
    fix['xi_smu_aniso'] = fit.theory_xi(s_grid, mu_grid, dict(ref_params),
                                        assume_isotropic=False)
    r31 = np.append([0.01], fit.r)
    vr, dvr = fit.velocity_terms(r31, dict(ref_params))
    fix['vel_r'] = r31
    fix['vel_vr'] = vr
    fix['vel_dvr'] = dvr
    delta, idelta = fit.delta_profiles(r31, dict(ref_params))
    fix['delta'] = delta
    fix['integrated_delta'] = idelta
    fix['real_mult_interp'] = fit.get_interpolated_real_multipoles(ref_params['beta'])
    fix['s_grid'] = s_grid
    fix['mu_grid'] = mu_grid

    # a few more option combos for wider coverage
    lnl, chi2 = fit.log_likelihood(dict(ref_params), rsd_model='euclid_special')
    fix['golden_euclid'] = np.array([chi2, lnl])
    lnl, chi2 = fit.log_likelihood({**ref_params, 'M': 1.1, 'Q': 0.9}, rsd_model='kaiser')
    fix['golden_kaiser_MQ'] = np.array([chi2, lnl])
    lnl, chi2 = fit.log_likelihood(dict(ref_params), kaiser_approximation=True,
                                   rsd_model='kaiser')
    fix['golden_kaiser_approx'] = np.array([chi2, lnl])
    lnl, chi2 = fit.log_likelihood(dict(ref_params), kaiser_coord_shift=False,
                                   rsd_model='kaiser')
    fix['golden_kaiser_noshift'] = np.array([chi2, lnl])
    for form in ['gaussian', 'hartlap', 'percival']:
        kw = {'likelihood': {'form': form, 'nmocks': 1000, 'nparams': 4}}
        lnl, chi2 = fit.log_likelihood(dict(ref_params), **kw)
        fix[f'golden_form_{form}'] = np.array([chi2, lnl])
    # empirical velocity correction
    lnl, chi2 = fit.log_likelihood({**ref_params, 'Av': 0.5}, empirical_corr=True)
    fix['golden_empirical_corr'] = np.array([chi2, lnl])

    np.savez_compressed(os.path.join(FIXDIR, 'reference_boss.npz'), **fix)
    print(f'fixtures written to {FIXDIR}/reference_boss.npz')

    baseline = {'evals_per_sec_cpu': evals_per_sec, 'ms_per_eval': dt / n * 1000,
                'init_seconds': t_init, 'goldens_ok': bool(ok), 'n_evals': n}
    with open(os.path.join(FIXDIR, 'reference_timing.json'), 'w') as f:
        json.dump(baseline, f, indent=2)
    print(json.dumps(baseline))


if __name__ == '__main__':
    main()
