"""Backend-preflight behavior (aline_tpu/utils/preflight.py).

The probe itself runs a subprocess matmul; these tests cover the policy
around it — pin short-circuits, success, retry-then-recover, and budget
exhaustion — by stubbing subprocess.run (and, for probe-path tests,
neutralizing the host-pin check, which fires under the CPU-pinned test
session).
"""
import subprocess

import pytest

from aline_tpu.utils import preflight


def test_env_pin_short_circuits(monkeypatch):
    monkeypatch.setenv("ALINE_PLATFORM", "cpu")
    assert preflight._host_pinned() is True
    monkeypatch.setattr(preflight.subprocess, "run",
                        lambda *a, **k: pytest.fail("probe ran under pin"))
    assert preflight.wait_for_backend() is True


def test_jax_config_pin_short_circuits(monkeypatch):
    # the test session itself pins cpu via jax.config (conftest), and an
    # empty ALINE_PLATFORM means "no env pin" — the config pin must win
    monkeypatch.setenv("ALINE_PLATFORM", "")
    assert preflight._host_pinned() is True


@pytest.mark.parametrize("pin", [None, "", "axon"])
def test_env_value_alone_does_not_pin(monkeypatch, pin):
    if pin is None:
        monkeypatch.delenv("ALINE_PLATFORM", raising=False)
    else:
        monkeypatch.setenv("ALINE_PLATFORM", pin)
    monkeypatch.setattr(preflight.sys, "modules",
                        {k: v for k, v in preflight.sys.modules.items()
                         if k != "jax"})
    assert preflight._host_pinned() is False


def test_probe_success_returns_true(monkeypatch):
    monkeypatch.setattr(preflight, "_host_pinned", lambda: False)
    calls = []
    monkeypatch.setattr(preflight.subprocess, "run",
                        lambda *a, **k: calls.append(1))
    assert preflight.wait_for_backend(budget_s=5) is True
    assert calls == [1]


def test_retry_then_recover(monkeypatch):
    monkeypatch.setattr(preflight, "_host_pinned", lambda: False)
    monkeypatch.setattr(preflight.time, "sleep", lambda s: None)
    attempts = iter([
        subprocess.TimeoutExpired("probe", 1),
        subprocess.CalledProcessError(1, "probe"),
        None,
    ])
    def fake_run(*a, **k):
        exc = next(attempts)
        if exc is not None:
            raise exc
    monkeypatch.setattr(preflight.subprocess, "run", fake_run)
    msgs = []
    assert preflight.wait_for_backend(budget_s=60,
                                      log=lambda *a: msgs.append(a)) is True
    assert any("recovered" in m[0] for m in msgs)


def test_budget_exhaustion_returns_false(monkeypatch):
    monkeypatch.setattr(preflight, "_host_pinned", lambda: False)
    monkeypatch.setattr(preflight.time, "sleep", lambda s: None)
    t = iter(range(0, 10_000, 100))  # fake clock: +100s per call
    monkeypatch.setattr(preflight.time, "time", lambda: float(next(t)))
    def fail(*a, **k):
        raise subprocess.TimeoutExpired("probe", 1)
    monkeypatch.setattr(preflight.subprocess, "run", fail)
    assert preflight.wait_for_backend(budget_s=300,
                                      log=lambda *a: None) is False
