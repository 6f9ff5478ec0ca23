"""utils.watchdog: stall detection (not total-runtime), heartbeat re-arm,
transient-error classification (see ADVICE round 4: the broad
XlaRuntimeError type match retried deterministic compile errors, and the
total-elapsed timer killed legitimately slow cold multi-variant runs)."""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestTransientClassification:
    def test_status_code_required_even_for_xla_error_types(self):
        from victor_tpu.utils.watchdog import is_transient_backend_error

        class XlaRuntimeError(Exception):
            pass

        # deterministic compile/shape error: same type, no transient code —
        # must NOT be retried (3 fresh processes triple time-to-failure)
        assert not is_transient_backend_error(
            XlaRuntimeError('INVALID_ARGUMENT: shapes (3,) and (4,)'))
        # genuine tunnel transients carry a transient status code
        assert is_transient_backend_error(
            XlaRuntimeError('FAILED_PRECONDITION: device busy'))
        assert is_transient_backend_error(
            RuntimeError('UNAVAILABLE: tunnel reset'))
        assert not is_transient_backend_error(ValueError('bad config'))


def _run(script, env_extra, timeout=60):
    env = dict(os.environ, **env_extra)
    env.pop('VICTOR_BENCH_ATTEMPT', None)
    return subprocess.run([sys.executable, '-c', script], env=env,
                          capture_output=True, text=True, timeout=timeout,
                          cwd=REPO)


class TestStallWatchdog:
    def test_heartbeat_rearms_past_the_window(self):
        """Total runtime 3x the watchdog window, but each heartbeat lands
        inside it: the run must complete (the old total-elapsed timer
        killed it)."""
        script = textwrap.dedent("""
            import sys, time
            sys.path.insert(0, '.')
            from victor_tpu.utils.watchdog import run_with_retry

            def main(heartbeat):
                for _ in range(6):
                    time.sleep(0.5)
                    heartbeat()
                print('COMPLETED', flush=True)

            run_with_retry(main, 'test')
        """)
        r = _run(script, {'VICTOR_BENCH_WATCHDOG': '1',
                          'VICTOR_BENCH_ATTEMPTS': '1'})
        assert r.returncode == 0, r.stderr
        assert 'COMPLETED' in r.stdout
        assert 'watchdog fired' not in r.stderr

    def test_stall_without_heartbeat_gives_up(self):
        """No heartbeat inside the window on the last attempt: on_giveup
        runs (machine-readable record) and the process exits 3."""
        script = textwrap.dedent("""
            import sys, time
            sys.path.insert(0, '.')
            from victor_tpu.utils.watchdog import run_with_retry

            def main(heartbeat):
                time.sleep(30)

            run_with_retry(main, 'test',
                           on_giveup=lambda r: print('GIVEUP:' + r,
                                                     flush=True))
        """)
        r = _run(script, {'VICTOR_BENCH_WATCHDOG': '1',
                          'VICTOR_BENCH_ATTEMPTS': '1'})
        assert r.returncode == 3
        assert 'GIVEUP:' in r.stdout
        assert 'watchdog fired' in r.stderr

    def test_zero_arg_main_still_supported(self):
        """Callers that don't take the heartbeat (bench.py keeps its own
        inline copy; third-party probes may not) keep working."""
        script = textwrap.dedent("""
            import sys
            sys.path.insert(0, '.')
            from victor_tpu.utils.watchdog import run_with_retry

            def main():
                print('COMPLETED', flush=True)

            run_with_retry(main, 'test')
        """)
        r = _run(script, {'VICTOR_BENCH_WATCHDOG': '5'})
        assert r.returncode == 0, r.stderr
        assert 'COMPLETED' in r.stdout
