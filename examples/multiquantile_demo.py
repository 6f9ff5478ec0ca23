#!/usr/bin/env python
"""Density-split multi-quantile joint fit walkthrough.

Density-split analyses fit several quantile-defined centre sets (DS1..DSn)
simultaneously: per-quantile model inputs and data vectors, one joint
cross-covariance over the stacked vector, and optional per-quantile
parameter overrides (`<name>__q<i>`). The reference package handles one
dataset per CCFFit instance and has no joint machinery (SURVEY.md §5
"long-context" analogue); victor_tpu's likelihood/multiquantile.py makes
the joint fit a first-class jit/vmap-able target accepted by every
estimation entry point (run/fit/scan/eval/forecast/analyze CLI, find_map,
run_smc, run_hmc_mcmc, fisher_forecast, ...).

Since the repository ships only the single BOSS CMASS dataset, this demo
builds a physically sensible stand-in: TWO "quantiles" that are both the
BOSS dataset, with a block-diagonal joint covariance assembled from the
per-dataset covariance at beta = 0.37 (the same construction the test
suite uses, tests/test_multiquantile.py). That makes the expected results
checkable in closed form: the joint chi2 is ~2x the single-dataset 65.01,
and every Fisher sigma shrinks by ~1/sqrt(2).

Run from the repository root:  python examples/multiquantile_demo.py
(~1 min on CPU; the joint graphs are small.)
"""

import os
import sys
import tempfile

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_joint_config(tmpdir):
    """A 2-quantile joint config from the shipped BOSS files + a
    block-diagonal joint covariance written to `tmpdir`."""
    import h5py
    import jax.numpy as jnp

    from victor_tpu.io import build_tables
    from victor_tpu.likelihood import core as lk

    with open(os.path.join(REPO, 'configs', 'boss_config.yaml')) as f:
        cfg = yaml.safe_load(f)
    cfg['model']['dir'] = REPO
    cfg['data']['dir'] = REPO

    single = build_tables(cfg['model'], cfg['data'])
    cov1 = np.asarray(lk.interpolated_covariance(
        single.tables, single.spec, jnp.asarray(0.37)))
    D = cov1.shape[0]
    joint_cov = np.zeros((2 * D, 2 * D))
    joint_cov[:D, :D] = cov1
    joint_cov[D:, D:] = cov1
    cov_fn = os.path.join(tmpdir, 'joint_cov.hdf5')
    with h5py.File(cov_fn, 'w') as f:
        f.create_dataset('covmat', data=joint_cov)

    quantile = {
        'model': cfg['model'],
        'data': {'redshift_space_ccf': cfg['data']['redshift_space_ccf'],
                 'dir': REPO},
    }
    return {
        'quantiles': [quantile, quantile],
        'covariance_matrix': {'data_file': cov_fn, 'cov_key': 'covmat',
                              'fixed_beta': True},
        'likelihood': {'form': 'sellentin', 'nmocks': 1000, 'nparams': 4},
    }, single


def main():
    import jax.numpy as jnp

    from victor_tpu.likelihood.multiquantile import (
        build_joint_tables, joint_log_likelihood, make_batched_joint_loglike)
    from victor_tpu.sampling.optimize import fisher_forecast
    from victor_tpu.utils.profiling import enable_persistent_cache
    enable_persistent_cache()

    with tempfile.TemporaryDirectory() as tmpdir:
        joint_cfg, single = build_joint_config(tmpdir)
        jb = build_joint_tables(joint_cfg)
        print(f'joint bundle: {len(jb.bundles)} quantiles, stacked data '
              f'vector length {jb.ndata}')

        # -- joint likelihood at the notebook golden point ----------------
        params = {k: jnp.asarray(v) for k, v in
                  {'fsigma8': 0.47, 'beta': 0.37, 'sigma_v': 380.0,
                   'epsilon': 1.0}.items()}
        lnl, chi2 = joint_log_likelihood(jb, params)
        print(f'joint lnL = {float(lnl):.2f}, chi2 = {float(chi2):.2f} '
              '(~2x the single-dataset 65.01: block-diagonal duplicate)')

        # -- per-quantile overrides: sigma_v for quantile 1 only ----------
        lnl_q, chi2_q = joint_log_likelihood(
            jb, {**params, 'sigma_v__q1': jnp.asarray(300.0)})
        print(f'with sigma_v__q1=300 override: chi2 = {float(chi2_q):.2f}')

        # -- batched joint evaluations (the sampler-facing form) ----------
        batched = make_batched_joint_loglike(
            jb, ['fsigma8', 'beta'],
            base_params={'sigma_v': 380.0, 'epsilon': 1.0}, chunk=16)
        theta = jnp.asarray([[0.45, 0.36], [0.47, 0.37], [0.50, 0.39]])
        lnl_b, _ = batched(theta)
        print('batched joint lnL over 3 points:',
              np.round(np.asarray(lnl_b), 2).tolist())

        # -- Fisher forecast: joint vs single ------------------------------
        fid = {'fsigma8': 0.47, 'beta': 0.37, 'sigma_v': 380.0,
               'epsilon': 1.0}
        names = ('fsigma8', 'epsilon')
        fj = fisher_forecast(jb, fid, names)
        fs = fisher_forecast(single, fid, names)
        for n in names:
            print(f'sigma({n}): single {fs.std[n]:.4f} -> joint '
                  f'{fj.std[n]:.4f} (expect /sqrt(2) = '
                  f'{fs.std[n] / np.sqrt(2):.4f})')


if __name__ == '__main__':
    main()
