"""Silent-stall watchdog + fresh-process retry for TPU benchmark entries.

The axon tunnel can hang SILENTLY (no error, zero progress, >14 min
observed) on the first device touch after another process released the
chip, and can surface transient FAILED_PRECONDITION/UNAVAILABLE errors on
first touch; the backend state is process-wide, so the only clean retry is
a fresh process. tools/bench_variants.py (and any future probe) uses this
module so every benchmark entry has the same protection (a stall can hit
any probe). bench.py keeps its own driver-validated inline copy — its
_DONE event is set at each terminal-JSON-print site, a finer guarantee
than "main returned" that its one-JSON-line contract depends on; don't
consolidate without preserving that.

Env knobs (shared across entries so a driver can set them once):
  VICTOR_BENCH_WATCHDOG  seconds before the watchdog declares a stall (900)
  VICTOR_BENCH_ATTEMPTS  total fresh-process attempts (3)
  VICTOR_BENCH_ATTEMPT   internal: current attempt number
"""

from __future__ import annotations

import os
import sys
import threading
import time
from typing import Callable, Optional


def is_transient_backend_error(e: Exception) -> bool:
    """Only TPU-backend/tunnel failures warrant a fresh-process retry.

    Deterministic failures (parity-gate assertions, import errors, bad
    configs) must surface immediately — retrying them just multiplies
    time-to-failure for genuine regressions. XlaRuntimeError /
    JaxRuntimeError alone do NOT qualify: those types also cover
    deterministic INVALID_ARGUMENT compile/shape errors, so a transient
    status code must be present in the message regardless of type.
    """
    msg = str(e)
    return any(code in msg for code in
               ('FAILED_PRECONDITION', 'UNAVAILABLE', 'DEADLINE_EXCEEDED',
                'ABORTED', 'RESOURCE_EXHAUSTED'))


def run_with_retry(main: Callable[..., None], name: str,
                   on_giveup: Optional[Callable[[str], None]] = None) -> None:
    """Run `main()` under a STALL watchdog with fresh-process retries.

    Watchdog THREAD (not SIGALRM): the stall this guards against blocks the
    main thread inside a native tunnel RPC, where a Python-level signal
    handler would never run (handlers only execute between bytecodes — the
    same reason Ctrl-C cannot interrupt an XLA compile). A daemon thread
    acts regardless of what the main thread is stuck in: it re-execs
    a fresh process (preserving sys.argv) until VICTOR_BENCH_ATTEMPTS is
    exhausted, then calls `on_giveup(reason)` (to leave a machine-readable
    record of why there is no number) and exits nonzero.

    The watchdog measures STALL, not total runtime: if `main` accepts an
    argument it is called with a zero-arg `heartbeat` callable, and each
    heartbeat() re-arms the timeout. A legitimately slow cold multi-variant
    run (several minutes of compile per variant is normal through the
    tunnel) stays alive as long as each unit of progress lands inside the
    window; a caller should also heartbeat at its terminal-print site so a
    late fire cannot re-exec after the result was emitted (the `done` check
    narrows that window further).
    """
    done = threading.Event()
    seconds = int(os.environ.get('VICTOR_BENCH_WATCHDOG', 900))
    argv = [sys.executable] + [os.path.abspath(sys.argv[0])] + sys.argv[1:]
    last_progress = [time.monotonic()]

    def heartbeat() -> None:
        last_progress[0] = time.monotonic()

    def _giveup(reason: str) -> None:
        if on_giveup is not None:
            on_giveup(reason)
        os._exit(3)

    def _on_stall():
        attempt = int(os.environ.get('VICTOR_BENCH_ATTEMPT', 1))
        max_attempts = int(os.environ.get('VICTOR_BENCH_ATTEMPTS', 3))
        sys.stderr.write(f'{name}: watchdog fired after {seconds}s with '
                         f'no progress (silent tunnel stall, attempt '
                         f'{attempt}/{max_attempts}); ')
        sys.stderr.flush()
        if attempt >= max_attempts:
            sys.stderr.write('giving up\n')
            sys.stderr.flush()
            _giveup(f'silent tunnel stall: no progress in '
                    f'{max_attempts} attempts (watchdog)')
            return
        sys.stderr.write('re-executing in a fresh process\n')
        sys.stderr.flush()
        os.environ['VICTOR_BENCH_ATTEMPT'] = str(attempt + 1)
        os.execv(sys.executable, argv)

    def _watch():
        while True:
            stall = time.monotonic() - last_progress[0]
            if done.is_set():
                # main() completed: never re-exec (or exit) after the
                # result was printed
                return
            if stall >= seconds:
                _on_stall()
                return
            # short poll so a heartbeat-re-armed deadline is honored
            time.sleep(min(10.0, seconds - stall))

    dog = threading.Thread(target=_watch, daemon=True)
    dog.start()
    try:
        try:
            import inspect
            takes_heartbeat = len(
                inspect.signature(main).parameters) >= 1
        except (TypeError, ValueError):
            takes_heartbeat = False
        main(heartbeat) if takes_heartbeat else main()
        done.set()
    except Exception as e:                      # noqa: BLE001
        done.set()      # a late fire mid-retry would skip the clean path
        attempt = int(os.environ.get('VICTOR_BENCH_ATTEMPT', 1))
        if attempt >= int(os.environ.get('VICTOR_BENCH_ATTEMPTS', 3)) or \
                not is_transient_backend_error(e):
            raise
        sys.stderr.write(f'{name}: attempt {attempt} failed ({e!r}); '
                         'retrying in a fresh process\n')
        os.environ['VICTOR_BENCH_ATTEMPT'] = str(attempt + 1)
        time.sleep(10)
        os.execv(sys.executable, argv)
