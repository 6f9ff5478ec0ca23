"""Tracing / profiling hooks (SURVEY §5: absent in the reference).

- `timed(name)`: wall-clock phase timer — use around init/compile/eval/
  sample phases; register device outputs via the yielded handle to force
  completion (see docstring); results accumulate in `phase_times()` and
  log at DEBUG.
- `trace(logdir)`: context manager around `jax.profiler.trace` for a full
  device trace viewable in TensorBoard/Perfetto.
- `throughput(fn, args, reps)`: compile-excluded evals/sec measurement, the
  BASELINE.md metric.
- `debug_nans(enable)`: toggles jax_debug_nans (the jit-era equivalent of a
  sanitizer: any NaN produced under jit raises at the producing op).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax

from .logging import get_logger

log = get_logger('profiling')
_PHASES: Dict[str, float] = defaultdict(float)
_COUNTS: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def timed(name: str):
    """Accumulating wall-clock timer.

    For host-synchronous work (table builds, api calls returning Python
    floats) just wrap the block. For async-dispatched device work, register
    the outputs so the timer can force completion before stopping the
    clock — there is NO global barrier for pure jitted computations
    (jax.effects_barrier only waits on effectful runtime tokens)::

        with timed('eval') as watch:
            out = fn(theta)
            watch(out)        # device->host transfer barrier at exit
    """
    outs = []
    t0 = time.perf_counter()
    try:
        yield outs.append
    finally:
        for o in outs:
            _force_host_transfer(o)
        dt = time.perf_counter() - t0
        _PHASES[name] += dt
        _COUNTS[name] += 1
        log.debug('phase %s: %.3fs (total %.3fs over %d)', name, dt,
                  _PHASES[name], _COUNTS[name])


def phase_times() -> Dict[str, Dict[str, float]]:
    return {k: {'total_s': _PHASES[k], 'count': _COUNTS[k]}
            for k in sorted(_PHASES)}


def reset_phase_times() -> None:
    _PHASES.clear()
    _COUNTS.clear()


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profile into `logdir` (TensorBoard 'profile' plugin
    or Perfetto can open it)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info('profiler trace written to %s', logdir)


def _force_host_transfer(out):
    """Pull EVERY device array of `out` to host: the per-rep completion
    barrier.

    Through the axon remote-device tunnel jax.block_until_ready can resolve
    BEFORE device execution finishes, inflating repeat-dispatch timings by
    orders of magnitude (CLAUDE.md measurement trap); a device->host
    transfer of an output is the reliable barrier, so every timed rep
    forces one (as bench.py does). All leaves are transferred, not just the
    first: a host-scalar first leaf would be a no-op barrier, and outputs
    assembled from several dispatches need each dispatch synchronized."""
    import numpy as np
    for leaf in jax.tree_util.tree_leaves(out):
        if isinstance(leaf, jax.Array):
            np.asarray(leaf)


def throughput(fn, *args, reps: int = 5, warmup: int = 1):
    """(result, evals_per_sec_per_call) excluding compile: runs `fn(*args)`
    `warmup` times, then times `reps` calls, each rep synchronized by a
    device->host transfer of an output (see _force_host_transfer)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _force_host_transfer(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _force_host_transfer(out)
    dt = (time.perf_counter() - t0) / reps
    return out, 1.0 / dt


def debug_nans(enable: bool = True) -> None:
    jax.config.update('jax_debug_nans', enable)


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 1.0,
                            force: bool = False) -> None:
    """Enable JAX's on-disk compilation cache (accelerator backends only).

    Cold compiles of the big theory/HMC graphs take minutes (especially via
    remote-device tunnels); the persistent cache makes them once-per-machine
    instead of once-per-process. Call before the first jit execution.

    On a CPU backend this is a deliberate no-op (unless force=True): CPU
    compiles are fast, and XLA:CPU caches AOT machine code keyed loosely
    enough that an entry written on a host with wider vector features loads
    on a narrower host with a SIGILL warning — observed when a virtual-mesh
    dry run shared the cache directory with earlier runs.
    """
    import os
    if not force and jax.default_backend() == 'cpu':
        log.info('persistent compilation cache skipped (cpu backend)')
        return
    path = path or os.environ.get(
        'VICTOR_TPU_CACHE', os.path.expanduser('~/.cache/victor_tpu/xla'))
    os.makedirs(path, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', path)
    try:
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          min_compile_secs)
    except Exception:
        pass
    log.info('persistent compilation cache at %s', path)
