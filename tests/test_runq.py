"""Unit tests for the queue runner's step semantics (scripts/runq.py).

``run_step`` is the automation that executes every chip workload: it owns
the done-marker protocol (skip on re-run), the hard timeout, the
stall watchdog, and the round-end deadline drain. Round 3's advisor
found a real bug here (a deadline-capped timeout wrote a done-marker,
permanently skipping an unfinished training step), so the contract is
pinned by tests:

- success writes an ``ok`` marker; an existing marker skips the step;
- a TIMEOUT kill leaves NO marker (the step resumes on a later re-run);
- a deadline with too little room skips the step WITHOUT a marker;
- a stalled step (no log growth, no CPU) is killed and retried; if every
  retry stalls the marker records ``failed``;
- a persistently failing command is retried ``retries`` times and the
  marker records ``failed``.

The 30 s poll / 60 s retry sleeps are monkeypatched down so the suite
runs in seconds; subprocess behavior is real.
"""
import importlib.util
import os
import sys
import time

import pytest

_spec = importlib.util.spec_from_file_location(
    "runq", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "runq.py"))
runq = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and runq)


@pytest.fixture
def fast_runq(tmp_path, monkeypatch):
    """runq with markers in a tmp dir and fast poll/retry sleeps.

    Step logs still go to /tmp/runq_<name>.log (hardcoded in run_step);
    the s_* names used here don't collide with real lane steps.
    """
    marker_dir = tmp_path / "markers"
    marker_dir.mkdir()
    monkeypatch.setattr(runq, "MARKER_DIR", str(marker_dir))
    real_sleep = time.sleep
    monkeypatch.setattr(runq.time, "sleep",
                        lambda s: real_sleep(min(s, 0.05)))
    monkeypatch.delenv("RUNQ_DEADLINE", raising=False)
    # keep the REAL /tmp/runq_deadline (a live queue's drain time) out of
    # the tests — point the override file into the tmp tree
    monkeypatch.setattr(runq, "DEADLINE_FILE",
                        str(tmp_path / "runq_deadline"))
    return marker_dir


def marker(marker_dir, name):
    p = marker_dir / f"{name}.done"
    return p.read_text().strip() if p.exists() else None


class TestRunStep:
    def test_success_writes_ok_marker(self, fast_runq, tmp_path):
        out = tmp_path / "ran"
        runq.run_step("s_ok", f"touch {out}", timeout=30)
        assert marker(fast_runq, "s_ok") == "ok"
        assert out.exists()

    def test_existing_marker_skips(self, fast_runq, tmp_path):
        (fast_runq / "s_skip.done").write_text("ok\n")
        out = tmp_path / "ran"
        runq.run_step("s_skip", f"touch {out}", timeout=30)
        assert not out.exists()

    def test_timeout_kills_and_leaves_no_marker(self, fast_runq):
        t0 = time.time()
        runq.run_step("s_to", "sleep 60", timeout=1, watch=False)
        assert time.time() - t0 < 30  # killed, not waited out
        assert marker(fast_runq, "s_to") is None

    def test_deadline_skip_leaves_no_marker(self, fast_runq, tmp_path,
                                            monkeypatch):
        monkeypatch.setenv("RUNQ_DEADLINE", str(time.time() + 10))
        out = tmp_path / "ran"
        runq.run_step("s_dl", f"touch {out}", timeout=30, min_room=900)
        assert not out.exists()
        assert marker(fast_runq, "s_dl") is None

    def test_small_min_room_lets_quick_step_run(self, fast_runq,
                                                tmp_path, monkeypatch):
        # preserve_models-style steps pass min_room=90 so they still run
        # inside the drain window that skips ordinary steps
        monkeypatch.setenv("RUNQ_DEADLINE", str(time.time() + 120))
        out = tmp_path / "ran"
        runq.run_step("s_room", f"touch {out}", timeout=30, watch=False,
                      min_room=90)
        assert out.exists()
        assert marker(fast_runq, "s_room") == "ok"

    def test_failing_step_retries_then_marks_failed(self, fast_runq,
                                                    tmp_path):
        counter = tmp_path / "attempts"
        runq.run_step(
            "s_fail", f"echo x >> {counter}; exit 3", timeout=30,
            retries=2)
        assert marker(fast_runq, "s_fail") == "failed"
        assert len(counter.read_text().splitlines()) == 2

    def test_stalled_step_is_killed_and_retried(self, fast_runq,
                                                tmp_path):
        counter = tmp_path / "attempts"
        t0 = time.time()
        # silent sleep: no log growth and ~no CPU -> watchdog stall
        runq.run_step("s_stall", f"echo x >> {counter}; sleep 300",
                      timeout=600, stall=1, retries=2)
        assert time.time() - t0 < 120
        assert len(counter.read_text().splitlines()) == 2  # retried once
        assert marker(fast_runq, "s_stall") == "failed"


class TestDeadlineFile:
    def test_file_overrides_env_to_skip(self, fast_runq, tmp_path,
                                        monkeypatch):
        # env says plenty of room; the file (written mid-round to pull
        # the drain earlier) says none -> the step must skip
        monkeypatch.setenv("RUNQ_DEADLINE", str(time.time() + 10_000))
        (tmp_path / "runq_deadline").write_text(str(time.time() + 10))
        out = tmp_path / "ran"
        runq.run_step("s_fdl", f"touch {out}", timeout=30, min_room=900)
        assert not out.exists()
        assert marker(fast_runq, "s_fdl") is None

    def test_file_overrides_env_to_extend(self, fast_runq, tmp_path,
                                          monkeypatch):
        monkeypatch.setenv("RUNQ_DEADLINE", str(time.time() + 10))
        (tmp_path / "runq_deadline").write_text(
            str(time.time() + 10_000))
        out = tmp_path / "ran"
        runq.run_step("s_fex", f"touch {out}", timeout=30, min_room=900,
                      watch=False)
        assert out.exists()
        assert marker(fast_runq, "s_fex") == "ok"

    def test_garbage_file_falls_back_to_env(self, fast_runq, tmp_path,
                                            monkeypatch):
        monkeypatch.delenv("RUNQ_DEADLINE", raising=False)
        (tmp_path / "runq_deadline").write_text("not-a-number\n")
        out = tmp_path / "ran"
        runq.run_step("s_fgb", f"touch {out}", timeout=30, watch=False)
        assert out.exists()
        assert marker(fast_runq, "s_fgb") == "ok"


class TestWaitForRun:
    def test_returns_immediately_without_live_train(self, tmp_path):
        import subprocess
        script = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "wait_for_run.py")
        t0 = time.time()
        r = subprocess.run([sys.executable, script, "outputs/nope_run"],
                           capture_output=True, text=True)
        assert r.returncode == 0
        assert "no live train" in r.stdout
        assert time.time() - t0 < 30


class TestCpuSeconds:
    def test_counts_own_process_group(self):
        # burn a little CPU so the group's utime is nonzero
        x = 0
        for i in range(200000):
            x += i * i
        total = runq.cpu_seconds(os.getpgid(0))
        assert total >= 0.0
        assert isinstance(total, float)

    def test_unknown_pgid_is_zero(self):
        assert runq.cpu_seconds(2 ** 22 - 7) == 0.0
