#!/usr/bin/env python
"""End-to-end usage walkthrough (the victor_usage_demo.ipynb equivalent).

Covers: building a CCFFit from the shipped BOSS DR12 CMASS config, theory
evaluation under all four RSD models, likelihood checkpoints (notebook
cell-22 values), batched evaluation, and a full on-device posterior run.

Run from the repository root:  python examples/usage_demo.py [--sample]
"""

import argparse
import os
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sample', action='store_true',
                    help='also run the on-device ensemble sampler')
    args = ap.parse_args()

    import jax.numpy as jnp

    from victor_tpu import CCFFit
    from victor_tpu.likelihood.batched import make_batched_loglike
    from victor_tpu.utils.profiling import timed, phase_times, throughput

    with open(os.path.join(REPO, 'configs', 'boss_config.yaml')) as f:
        cfg = yaml.safe_load(f)
    cfg['model']['dir'] = REPO
    cfg['data']['dir'] = REPO

    with timed('init'):
        fit = CCFFit(cfg['model'], cfg['data'])

    params = {'fsigma8': 0.47, 'beta': 0.37, 'sigma_v': 380.0, 'epsilon': 1.0}
    print('\n--- likelihood checkpoints (victor_usage_demo cell 22) ---')
    for label, kw in [('streaming', {}), ('dispersion', {'rsd_model': 'dispersion'}),
                      ('kaiser', {'rsd_model': 'kaiser'}),
                      ('streaming anisotropic', {'assume_isotropic': False}),
                      ('beta-interp at likelihood level',
                       {'beta_interpolation': 'likelihood'})]:
        with timed(f'eval:{label}'):
            lnl, chi2 = fit.log_likelihood(params, **kw)
        print(f'{label:36s} chi2 = {chi2:7.2f}   lnL = {lnl:7.2f}')

    print('\n--- theory multipoles + 2D ccf ---')
    mult = fit.theory_multipoles(fit.s, params, poles=[0, 2])
    print('monopole at s =', np.round(fit.s[:3], 1), ':', np.round(mult['0'][:3], 4))
    xi2d = fit.theory_xi_2D(params, rmax=80)
    print('xi(5, 5) =', float(xi2d(5.0, 5.0)[0, 0]))

    print('\n--- batched throughput ---')
    batched = make_batched_loglike(fit.bundle,
                                   ['fsigma8', 'beta', 'sigma_v', 'epsilon'],
                                   chunk=128)
    import jax
    n = 1024 if jax.default_backend() != 'cpu' else 128
    rng = np.random.default_rng(0)
    theta = jnp.asarray(np.column_stack([
        rng.uniform(0.3, 0.6, n), rng.uniform(0.25, 0.55, n),
        rng.uniform(250, 450, n), rng.uniform(0.9, 1.1, n)]))
    _, calls_per_sec = throughput(batched, theta, reps=3)
    print(f'{n * calls_per_sec:,.0f} likelihood evals/sec '
          f'(reference victor: 11.8/sec on one CPU core)')

    if args.sample:
        print('\n--- posterior sampling (on device) ---')
        from victor_tpu.parallel import make_mesh
        from victor_tpu.sampling import run_mcmc
        block = yaml.safe_load(open(os.path.join(
            REPO, 'configs', 'boss_sampling_config.yaml')))['params']
        result = run_mcmc(fit.bundle, block, n_walkers=256, max_steps=1000,
                          check_every=250, rhat_stop=0.02,
                          mesh=make_mesh(('chains', 'walkers')))
        for name, stats in result.summary().items():
            print(f'{name:10s} = {stats["mean"]:.4f} +/- {stats["std"]:.4f} '
                  f'(R-hat {stats["rhat"]:.3f})')

    print('\nphase times:', {k: round(v['total_s'], 2)
                             for k, v in phase_times().items()})


if __name__ == '__main__':
    main()
