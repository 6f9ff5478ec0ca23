#!/usr/bin/env python
"""Posterior-level validation of the dispersion fast final stage.

`dispersion_final='fast'` approximates two of the three exact final-stage
spline passes (BASELINE.md anatomy): the jacobian reuses the final Picard
update's exact v_r and uses a degree-48 Chebyshev dv_r. Pointwise bounds
(xi <= 2e-5 abs, chi2 ~2e-3 — tests/test_golden.py) say it is accurate;
the operative question for a sampler-facing speed mode is whether the BOSS
POSTERIOR moves. This runs the full dense-mass HMC chain under the
dispersion model with exact vs fast final stages (same seed) and reports
the moment shifts in units of the posterior sigma. Acceptance: every
|Δmean| < 0.1 sigma and every |Δsigma|/sigma < 10%.

Run alone on the TPU:  python tools/validate_dispersion_fast.py
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import yaml
    from victor_tpu.io import build_tables
    from victor_tpu.sampling import run_hmc_mcmc
    from victor_tpu.utils.profiling import enable_persistent_cache
    enable_persistent_cache()

    with open(os.path.join(REPO, 'configs', 'boss_config.yaml')) as f:
        cfg = yaml.safe_load(f)
    cfg['model']['dir'] = REPO
    cfg['data']['dir'] = REPO
    with open(os.path.join(REPO, 'configs',
                           'boss_sampling_config.yaml')) as f:
        block = yaml.safe_load(f)['params']
    bundle = build_tables(cfg['model'], cfg['data'])

    runs = {}
    for mode in ('exact', 'fast'):
        # longer schedule than the streaming default: the dispersion
        # posterior needs more warmup for a converged dense mass matrix
        # (300/800 left a stuck chain with max R-1 > 2 in the first
        # attempt); the comparison below is meaningless unless BOTH chains
        # converge, so convergence is asserted as a precondition
        # 16 chains cost the same wall time as 8 (the per-step dispatch is
        # latency-bound at this batch size) and halve the R-hat noise
        res = run_hmc_mcmc(
            bundle, block, n_chains=16, n_warmup=600, n_samples=1500, seed=1,
            opts_kw={'rsd_model': 'dispersion', 'dispersion_final': mode})
        runs[mode] = res
        print(json.dumps({
            'mode': mode, 'acceptance': round(res.acceptance, 3),
            'max_rm1': round(float(np.max(res.rhat - 1)), 4),
            'elapsed_s': round(res.elapsed_s, 1),
            'summary': {k: {'mean': round(v['mean'], 5),
                            'std': round(v['std'], 5)}
                        for k, v in res.summary().items()},
        }), flush=True)

    for mode, res in runs.items():
        rm1 = float(np.max(res.rhat - 1))
        if rm1 > 0.05:
            print(json.dumps({'check': 'dispersion_fast_posterior_parity',
                              'ok': False,
                              'error': f'{mode} chain unconverged '
                                       f'(max R-1 = {rm1:.3f}) — comparison '
                                       'invalid, increase warmup/samples'}))
            sys.exit(2)

    ok = True
    report = {}
    se, sf = runs['exact'].summary(), runs['fast'].summary()
    for name in se:
        dm = abs(sf[name]['mean'] - se[name]['mean']) / se[name]['std']
        ds = abs(sf[name]['std'] - se[name]['std']) / se[name]['std']
        report[name] = {'dmean_over_sigma': round(dm, 4),
                        'dsigma_rel': round(ds, 4)}
        ok &= (dm < 0.1) and (ds < 0.1)
    print(json.dumps({'check': 'dispersion_fast_posterior_parity',
                      'ok': bool(ok), 'shifts': report}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
