"""bench.py's self-supervision: a wedged-tunnel attempt (timeout) or a
crashed attempt retries; a clean attempt returns 0 (docs/benchmark.md +
CLAUDE.md: the tunneled client can block forever in a futex wait)."""

import subprocess

import bench


def test_supervisor_retries_after_timeout(monkeypatch):
    calls = []

    def fake_run(cmd, timeout):
        calls.append(cmd)
        if len(calls) == 1:
            raise subprocess.TimeoutExpired(cmd, timeout)
        return subprocess.CompletedProcess(cmd, 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._supervised([]) == 0
    assert len(calls) == 2
    assert "--inner" in calls[0]


def test_supervisor_gives_up_after_three_failures(monkeypatch):
    calls = []

    def fake_run(cmd, timeout):
        calls.append(cmd)
        return subprocess.CompletedProcess(cmd, 3)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._supervised(["--train"]) == 1
    assert len(calls) == 3
    assert all("--train" in c for c in calls)
