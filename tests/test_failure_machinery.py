'''Tests for the device-failure machinery (VERDICT r3 weak item 7).

The tunneled-TPU sandbox flakes in two distinct ways — transient
remote-compile drops mid-run and indefinite hangs at backend init — and the
repo grew untested defenses for both: ``Predictor._retry`` and bench.py's
device-init watchdog + CPU-fallback re-exec. These tests pin their behavior
with no device in the loop.
'''
import subprocess
import sys
import types

import pytest

sys.path.insert(0, '/root/repo')

import bench
from moseq2_detectron_extract_tpu.models.predictor import Predictor


class _Dummy:
    '''Stand-in self: _retry uses no Predictor state.'''


def _retry(fn, attempts=3):
    return Predictor._retry(_Dummy(), fn, attempts=attempts)


class TestPredictorRetry:
    def test_transient_error_retries_then_succeeds(self, monkeypatch):
        monkeypatch.setattr('time.sleep', lambda s: None)
        calls = {'n': 0}

        def fn():
            calls['n'] += 1
            if calls['n'] < 3:
                raise RuntimeError(
                    'INTERNAL: http://127.0.0.1:8093/remote_compile: 500')
            return 'ok'

        assert _retry(fn) == 'ok'
        assert calls['n'] == 3

    def test_transient_error_exhausts_attempts(self, monkeypatch):
        monkeypatch.setattr('time.sleep', lambda s: None)
        calls = {'n': 0}

        def fn():
            calls['n'] += 1
            raise RuntimeError('remote_compile connection dropped')

        with pytest.raises(RuntimeError, match='remote_compile'):
            _retry(fn, attempts=3)
        assert calls['n'] == 3

    def test_non_transient_error_raises_immediately(self):
        calls = {'n': 0}

        def fn():
            calls['n'] += 1
            raise ValueError('shape mismatch (64,) vs (32,)')

        with pytest.raises(ValueError):
            _retry(fn)
        assert calls['n'] == 1  # no retry for real bugs

    def test_success_needs_no_retry(self):
        assert _retry(lambda: 42) == 42


class TestDeviceInitWatchdog:
    def _patch_run(self, monkeypatch, *, returncode=None, timeout=False):
        def fake_run(cmd, capture_output=True, timeout=None):
            if timeout is not None and returncode is None:
                raise subprocess.TimeoutExpired(cmd, timeout)
            return types.SimpleNamespace(returncode=returncode)

        if timeout:
            monkeypatch.setattr(subprocess, 'run', fake_run)
        else:
            monkeypatch.setattr(
                subprocess, 'run',
                lambda cmd, capture_output=True, timeout=None:
                types.SimpleNamespace(returncode=returncode))

    def test_hang_detected_on_probe_timeout(self, monkeypatch):
        self._patch_run(monkeypatch, timeout=True)
        assert bench._device_init_hangs() is True

    def test_hang_detected_on_probe_failure(self, monkeypatch):
        self._patch_run(monkeypatch, returncode=1)
        assert bench._device_init_hangs() is True

    def test_healthy_probe_passes(self, monkeypatch):
        self._patch_run(monkeypatch, returncode=0)
        assert bench._device_init_hangs() is False


class TestCpuFallbackEnv:
    def test_fallback_env_shape(self):
        env = {'BENCH_MODEL': '/some/model', 'BENCH_FRAMES': '3000'}
        bench._apply_cpu_fallback_env(env)
        assert env['BENCH_CPU_FALLBACK'] == '1'
        assert env['JAX_PLATFORMS'] == 'cpu'
        assert env['BENCH_TINY'] == '1'
        assert 'BENCH_MODEL' not in env          # R50 weights can't run on CPU
        assert env['BENCH_FRAMES'] == '3000'     # explicit settings survive
        assert env['BENCH_NO_EXTRAS'] == '1'

    def test_fallback_env_defaults(self):
        env = {}
        bench._apply_cpu_fallback_env(env)
        assert env['BENCH_FRAMES'] == '300'
        assert env['BENCH_WARM_FRAMES'] == '100'
        assert env['BENCH_BATCH'] == '20'
