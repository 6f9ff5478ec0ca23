#!/usr/bin/env python
"""Run the mesh-sharded program on the REAL TPU backend and check parity.

All mesh-sharded code paths are routinely tested on the virtual 8-device CPU
mesh (tests/test_sampling.py, __graft_entry__.dryrun_multichip); the real
chip normally runs unsharded programs. This probe closes the remaining gap
this environment permits: it builds a `Mesh` over the available TPU device(s)
(1-way on the single tunneled v5e chip), lowers the SAME sharded programs
through the TPU compiler, and

  1. runs the sharded batched BOSS likelihood vs the unsharded dispatch —
     asserting bit-parity and recording the sharded dispatch latency vs the
     unsharded floor (the input to BASELINE.md's multi-chip scaling bounds);
  2. runs a sharded HMC segment (chains axis on the mesh) vs the unsharded
     runner — asserting trajectory parity;
  3. runs the sharded BOSS tempered-SMC stage (particle axis on the mesh)
     vs the unsharded run at the same seed — the partitioned program whose
     plan carries the cross-module collective that hard-deadlocks the
     virtual CPU mesh on a 1-core box (CLAUDE.md rule 8); the REAL backend
     lowering is the one that matters for multi-chip, and this is the only
     place it can be exercised;
  4. the same for nested sampling (live-point axis on the mesh; its
     constrained-replacement scatter is the other collective-bearing
     sampler program);
  5. a sharded adaptive random-walk Metropolis segment (sampling/mh.py —
     the value-only program with no gradient graph) vs the unsharded
     runner, completing the sampler matrix on the real backend.

Prints one JSON line per check; exits non-zero if any check fails.
Run it alone (one TPU process at a time through the axon tunnel).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import yaml
    from victor_tpu.io import build_tables
    from victor_tpu.likelihood.batched import make_batched_loglike
    from victor_tpu.parallel import make_mesh
    from victor_tpu.sampling import run_hmc_mcmc
    from victor_tpu.utils.profiling import enable_persistent_cache
    enable_persistent_cache()

    backend = jax.default_backend()
    devices = jax.devices()
    print(json.dumps({'backend': backend, 'n_devices': len(devices),
                      'device0': str(devices[0])}), flush=True)

    with open(os.path.join(REPO, 'configs', 'boss_config.yaml')) as f:
        cfg = yaml.safe_load(f)
    cfg['model']['dir'] = REPO
    cfg['data']['dir'] = REPO
    bundle = build_tables(cfg['model'], cfg['data'])
    names = ['fsigma8', 'beta', 'sigma_v', 'epsilon']

    failures = 0

    # ---- 1. sharded batched likelihood ----------------------------------
    mesh = make_mesh(('batch',))
    n = int(os.environ.get('VICTOR_PROBE_BATCH', 8192))
    rng = np.random.default_rng(0)
    theta_h = np.column_stack([
        rng.uniform(0.3, 0.6, n), rng.uniform(0.25, 0.55, n),
        rng.uniform(250.0, 450.0, n), rng.uniform(0.9, 1.1, n)])
    batched = make_batched_loglike(bundle, names, chunk=64)

    theta = jnp.asarray(theta_h)
    lnl_ref = np.asarray(batched(theta)[0])           # unsharded warm-up
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        lnl_ref = np.asarray(batched(theta)[0])
    dt_unsharded = (time.perf_counter() - t0) / reps

    theta_sh = jax.device_put(theta, NamedSharding(mesh, P('batch')))
    lnl_sh = np.asarray(batched(theta_sh)[0])         # sharded warm-up
    t0 = time.perf_counter()
    for _ in range(reps):
        lnl_sh = np.asarray(batched(theta_sh)[0])
    dt_sharded = (time.perf_counter() - t0) / reps

    bit_equal = bool(np.array_equal(lnl_sh, lnl_ref))
    ok = bit_equal or np.allclose(lnl_sh, lnl_ref, rtol=1e-6)
    failures += 0 if ok else 1
    print(json.dumps({
        'check': 'sharded_batched_likelihood',
        'mesh': f"{dict(zip(mesh.axis_names, mesh.devices.shape))}",
        'batch': n, 'bit_equal': bit_equal, 'ok': bool(ok),
        'unsharded_ms_per_dispatch': round(1e3 * dt_unsharded, 1),
        'sharded_ms_per_dispatch': round(1e3 * dt_sharded, 1),
        'sharded_evals_per_sec': round(n / dt_sharded, 1),
    }), flush=True)

    # ---- 2. sharded HMC segment -----------------------------------------
    block = {
        'fsigma8': {'prior': {'dist': 'uniform', 'min': 0.05, 'max': 1.5},
                    'ref': {'dist': 'norm', 'loc': 0.47, 'scale': 0.02}},
        'beta': {'prior': {'dist': 'uniform', 'min': 0.2, 'max': 0.6},
                 'ref': {'dist': 'norm', 'loc': 0.4, 'scale': 0.02}},
        'sigma_v': 380.0, 'epsilon': 1.0,
    }
    cmesh = make_mesh(('chains',))
    t0 = time.perf_counter()
    r_mesh = run_hmc_mcmc(bundle, block, n_chains=8, n_warmup=50,
                          n_samples=50, n_leapfrog=8, seed=0, mesh=cmesh)
    dt_mesh = time.perf_counter() - t0
    t0 = time.perf_counter()
    r_none = run_hmc_mcmc(bundle, block, n_chains=8, n_warmup=50,
                          n_samples=50, n_leapfrog=8, seed=0)
    dt_none = time.perf_counter() - t0
    close = np.allclose(r_mesh.chain, r_none.chain, rtol=5e-5, atol=1e-6)
    failures += 0 if close else 1
    print(json.dumps({
        'check': 'sharded_hmc_segment',
        'mesh': f"{dict(zip(cmesh.axis_names, cmesh.devices.shape))}",
        'chains': 8, 'draws': 50, 'trajectories_match': bool(close),
        'acceptance_mesh': round(r_mesh.acceptance, 3),
        'acceptance_unsharded': round(r_none.acceptance, 3),
        'sharded_s': round(dt_mesh, 1), 'unsharded_s': round(dt_none, 1),
    }), flush=True)

    # ---- 3. sharded tempered SMC (collective-bearing program) ------------
    from victor_tpu.sampling import run_smc
    smc_block = {
        'fsigma8': {'prior': {'dist': 'uniform', 'min': 0.05, 'max': 1.5}},
        'beta': {'prior': {'dist': 'uniform', 'min': 0.2, 'max': 0.6}},
        'sigma_v': {'prior': {'dist': 'uniform', 'min': 150.0, 'max': 550.0}},
        'epsilon': {'prior': {'dist': 'uniform', 'min': 0.8, 'max': 1.2}},
    }
    pmesh = make_mesh(('particles',))
    t0 = time.perf_counter()
    s_mesh = run_smc(bundle, smc_block, n_particles=4096, n_moves=8,
                     seed=0, chunk=64, mesh=pmesh)
    dt_smesh = time.perf_counter() - t0
    t0 = time.perf_counter()
    s_none = run_smc(bundle, smc_block, n_particles=4096, n_moves=8,
                     seed=0, chunk=64)
    dt_snone = time.perf_counter() - t0
    dlz = abs(s_mesh.logz - s_none.logz)
    selz = float(np.hypot(s_mesh.logz_se, s_none.logz_se))
    mm, mn = s_mesh.summary(), s_none.summary()
    max_shift = max(abs(mm[k]['mean'] - mn[k]['mean']) / mn[k]['std']
                    for k in mn)
    # reduction order may differ under the partitioned program, so the
    # adaptive ladder can diverge at f32 rounding — compare statistically
    ok3 = bool(dlz < max(3 * selz, 0.3) and max_shift < 0.2
               and s_mesh.betas[-1] == 1.0)
    failures += 0 if ok3 else 1
    print(json.dumps({
        'check': 'sharded_smc_evidence',
        'mesh': f"{dict(zip(pmesh.axis_names, pmesh.devices.shape))}",
        'particles': 4096, 'ok': ok3,
        'ladder_identical': bool(len(s_mesh.betas) == len(s_none.betas)
                                 and np.array_equal(s_mesh.betas,
                                                    s_none.betas)),
        'logz_mesh': round(s_mesh.logz, 3),
        'logz_unsharded': round(s_none.logz, 3),
        'delta_logz': round(dlz, 4), 'combined_se': round(selz, 3),
        'max_mean_shift_sigma': round(max_shift, 4),
        'sharded_s': round(dt_smesh, 1), 'unsharded_s': round(dt_snone, 1),
    }), flush=True)

    # ---- 4. sharded nested sampling (constrained-replacement scatter) ----
    from victor_tpu.sampling import run_nested
    t0 = time.perf_counter()
    n_mesh = run_nested(bundle, smc_block, n_live=1024, n_batch=256,
                        n_steps=24, dlogz=0.05, chunk=64, seed=0,
                        mesh=pmesh)
    dt_nmesh = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_none = run_nested(bundle, smc_block, n_live=1024, n_batch=256,
                        n_steps=24, dlogz=0.05, chunk=64, seed=0)
    dt_nnone = time.perf_counter() - t0
    dlz_ns = abs(n_mesh.logz - n_none.logz)
    selz_ns = float(np.hypot(n_mesh.logz_se, n_none.logz_se))
    ok4 = bool(dlz_ns < max(3 * selz_ns, 0.3)
               and np.isfinite(n_mesh.logz) and np.isfinite(n_none.logz))
    failures += 0 if ok4 else 1
    print(json.dumps({
        'check': 'sharded_nested_sampling',
        'mesh': f"{dict(zip(pmesh.axis_names, pmesh.devices.shape))}",
        'n_live': 1024, 'ok': ok4,
        'logz_mesh': round(float(n_mesh.logz), 3),
        'logz_unsharded': round(float(n_none.logz), 3),
        'delta_logz': round(dlz_ns, 4), 'combined_se': round(selz_ns, 3),
        'bit_identical': bool(np.array_equal(
            np.asarray(n_mesh.particles), np.asarray(n_none.particles))),
        'sharded_s': round(dt_nmesh, 1), 'unsharded_s': round(dt_nnone, 1),
    }), flush=True)

    # ---- 5. sharded random-walk Metropolis segment ------------------------
    # MH shares run_hmc_mcmc's mesh plumbing but lowers a different program
    # (value-only, no vjp); chains must reproduce the unsharded run exactly
    # up to partitioned-reduction rounding, like HMC's check 2
    t0 = time.perf_counter()
    m_mesh = run_hmc_mcmc(bundle, block, n_chains=8, n_warmup=100,
                          n_samples=100, seed=0, algorithm='mh', mesh=cmesh)
    dt_mmesh = time.perf_counter() - t0
    t0 = time.perf_counter()
    m_none = run_hmc_mcmc(bundle, block, n_chains=8, n_warmup=100,
                          n_samples=100, seed=0, algorithm='mh')
    dt_mnone = time.perf_counter() - t0
    close5 = np.allclose(m_mesh.chain, m_none.chain, rtol=5e-5, atol=1e-6)
    failures += 0 if close5 else 1
    print(json.dumps({
        'check': 'sharded_mh_segment',
        'mesh': f"{dict(zip(cmesh.axis_names, cmesh.devices.shape))}",
        'chains': 8, 'draws': 100, 'trajectories_match': bool(close5),
        'acceptance_mesh': round(m_mesh.acceptance, 3),
        'acceptance_unsharded': round(m_none.acceptance, 3),
        'sharded_s': round(dt_mmesh, 1), 'unsharded_s': round(dt_mnone, 1),
    }), flush=True)

    sys.exit(1 if failures else 0)


if __name__ == '__main__':
    main()
