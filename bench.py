#!/usr/bin/env python
"""Headline benchmark: batched BOSS CMASS likelihood throughput on TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline denominator: the reference victor implementation measured at 11.8
likelihood evals/sec single-CPU on this machine (BASELINE.md, streaming RSD
model, Sellentin likelihood, beta-varying D covariance — the exact
victor_usage_demo.ipynb configuration). We evaluate the same likelihood,
vmapped over a large batch of parameter points in one jitted dispatch.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

REFERENCE_EVALS_PER_SEC = 11.8   # BASELINE.md, measured on this machine

import threading                                             # noqa: E402
_DONE = threading.Event()   # set once a terminal JSON line has been printed:
                            # the watchdog must never re-exec after that (a
                            # near-boundary fire would emit a SECOND line,
                            # breaking the one-JSON-line contract)


def main():
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    # float64 on CPU for exactness; float32 on TPU (no native f64 MXU path)
    if platform == 'cpu':
        jax.config.update('jax_enable_x64', True)

    import yaml
    from victor_tpu.io import build_tables
    from victor_tpu.likelihood.batched import make_batched_loglike
    from victor_tpu.utils.profiling import enable_persistent_cache
    enable_persistent_cache()

    with open(os.path.join(REPO, 'configs', 'boss_config.yaml')) as f:
        cfg = yaml.safe_load(f)
    cfg['model']['dir'] = REPO
    cfg['data']['dir'] = REPO

    bundle = build_tables(cfg['model'], cfg['data'])
    names = ['fsigma8', 'beta', 'sigma_v', 'epsilon']
    # chunk/batch from the measured throughput-vs-size curve (BASELINE.md):
    # saturation needs >=16k points; chunk 48-64 peaks (VMEM-resident
    # intermediates without map-iteration overhead dominating)
    chunk = int(os.environ.get('VICTOR_BENCH_CHUNK', 64))
    batched = make_batched_loglike(bundle, names, chunk=chunk)

    # correctness spot-check at the notebook cell-22 golden point
    golden = jnp.asarray([[0.47, 0.37, 380.0, 1.0]])
    lnl, chi2 = batched(golden)
    chi2_err = abs(float(chi2[0]) - 65.01)
    if chi2_err > 0.2:
        print(json.dumps({'metric': 'likelihood_evals_per_sec', 'value': 0.0,
                          'unit': 'evals/s', 'vs_baseline': 0.0,
                          'error': f'chi2 parity failure: {float(chi2[0]):.4f}'}),
              flush=True)
        _DONE.set()
        # exit NONZERO: this is the regression this gate exists to catch
        # (lost precision pins read chi2 ~66.3 — CLAUDE.md rule 6); exiting 0
        # would let CI/automation treat the run as green
        sys.exit(2)

    # batch of realistic parameter draws around the posterior
    rng = np.random.default_rng(0)
    n = int(os.environ.get('VICTOR_BENCH_BATCH', 32768))
    theta = np.column_stack([
        rng.uniform(0.3, 0.6, n),      # fsigma8
        rng.uniform(0.25, 0.55, n),    # beta
        rng.uniform(250.0, 450.0, n),  # sigma_v
        rng.uniform(0.9, 1.1, n),      # epsilon
    ])
    theta = jnp.asarray(theta)

    # warm-up / compile; forced host transfer so no execution tail leaks into
    # the timed region (block_until_ready can resolve early through the
    # remote-device tunnel)
    np.asarray(batched(theta)[0])

    reps = int(os.environ.get('VICTOR_BENCH_REPS', 5))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = batched(theta)
        # force a host transfer each rep: through remote-device tunnels,
        # block_until_ready alone can resolve before execution finishes
        np.asarray(out[0])
    dt = time.perf_counter() - t0

    evals_per_sec = reps * n / dt
    print(json.dumps({
        'metric': 'likelihood_evals_per_sec',
        'value': round(evals_per_sec, 1),
        'unit': 'evals/s',
        'vs_baseline': round(evals_per_sec / REFERENCE_EVALS_PER_SEC, 1),
    }), flush=True)
    _DONE.set()


def _arm_watchdog(seconds: int):
    """Guards against the axon tunnel hanging SILENTLY (no error, no
    progress) on the first device touch after another process released the
    chip — observed twice on 2026-08-17 (>14 min with zero log output; a
    fresh process immediately succeeded).

    Watchdog THREAD (not SIGALRM): the stall this guards against blocks
    the main thread inside a native tunnel RPC, where a Python-level signal
    handler would never run (handlers only execute between bytecodes — the
    same reason Ctrl-C cannot interrupt an XLA compile). A daemon timer
    thread acts regardless of what the main thread is stuck in: it re-execs
    a fresh process until VICTOR_BENCH_ATTEMPTS is exhausted, then exits
    nonzero with a machine-readable error record."""
    def _on_stall():
        if _DONE.is_set():
            # main() completed between the timer firing and cancel():
            # never re-exec (or exit) after the result line was printed
            return
        attempt = int(os.environ.get('VICTOR_BENCH_ATTEMPT', 1))
        max_attempts = int(os.environ.get('VICTOR_BENCH_ATTEMPTS', 3))
        sys.stderr.write(f'bench.py: watchdog fired after {seconds}s with '
                         f'no completion (silent tunnel stall, attempt '
                         f'{attempt}/{max_attempts}); ')
        sys.stderr.flush()
        if attempt >= max_attempts:
            sys.stderr.write('giving up\n')
            sys.stderr.flush()
            # leave a machine-readable record of WHY there is no number
            print(json.dumps({'metric': 'likelihood_evals_per_sec',
                              'value': 0.0, 'unit': 'evals/s',
                              'vs_baseline': 0.0,
                              'error': 'silent tunnel stall: no completion '
                                       f'in {max_attempts} attempts '
                                       '(watchdog)'}),
                  flush=True)
            os._exit(3)
        sys.stderr.write('re-executing in a fresh process\n')
        sys.stderr.flush()
        os.environ['VICTOR_BENCH_ATTEMPT'] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])

    t = threading.Timer(seconds, _on_stall)
    t.daemon = True
    t.start()
    return t


def _is_transient_backend_error(e: Exception) -> bool:
    """Only TPU-backend/tunnel failures warrant a fresh-process retry.

    Deterministic failures (parity-gate assertions, import errors, bad
    configs) must surface immediately — retrying them just doubles
    time-to-failure for genuine regressions.
    """
    if type(e).__name__ in ('XlaRuntimeError', 'JaxRuntimeError'):
        return True
    msg = str(e)
    return any(code in msg for code in
               ('FAILED_PRECONDITION', 'UNAVAILABLE', 'DEADLINE_EXCEEDED',
                'ABORTED', 'RESOURCE_EXHAUSTED'))


def _main_with_retry():
    """Clean-process retries on transient TPU-backend failures.

    The remote-device tunnel occasionally surfaces a FAILED_PRECONDITION on
    the first touch after another process released the chip (observed
    2026-08-16); the backend state is process-wide, so the only clean retry
    is a fresh process. VICTOR_BENCH_ATTEMPTS bounds the total attempts
    (default 3 — a tunnel outage on 2026-08-18 outlasted two 900 s
    watchdog windows).
    """
    # generous bound: a legitimately cold compile of the big likelihood
    # graph takes ~300-400 s through the tunnel; the silent stall this
    # guards against showed >840 s with zero progress
    dog = _arm_watchdog(int(os.environ.get('VICTOR_BENCH_WATCHDOG', 900)))
    try:
        main()
        dog.cancel()
    except Exception as e:                      # noqa: BLE001
        dog.cancel()    # a late fire mid-retry would skip the clean path
        attempt = int(os.environ.get('VICTOR_BENCH_ATTEMPT', 1))
        if attempt >= int(os.environ.get('VICTOR_BENCH_ATTEMPTS', 3)) or \
                not _is_transient_backend_error(e):
            raise
        sys.stderr.write(f'bench.py: attempt {attempt} failed ({e!r}); '
                         'retrying in a fresh process\n')
        os.environ['VICTOR_BENCH_ATTEMPT'] = str(attempt + 1)
        time.sleep(10)
        os.execv(sys.executable, [sys.executable,
                                  os.path.abspath(__file__)])


if __name__ == '__main__':
    _main_with_retry()
