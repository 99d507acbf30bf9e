"""bench.py's self-supervision: a wedged-tunnel attempt (timeout) or a
crashed attempt retries; a clean attempt returns 0 (docs/benchmark.md +
CLAUDE.md: the tunneled client can block forever in a futex wait)."""

import subprocess

import bench


def test_supervisor_retries_after_timeout(monkeypatch):
    calls = []

    def fake_run(cmd, timeout, env=None):
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

    def fake_run(cmd, timeout, env=None):
        calls.append(cmd)
        return subprocess.CompletedProcess(cmd, 3)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._supervised(["--train"]) == 1
    assert len(calls) == 3
    assert all("--train" in c for c in calls)


def test_supervisor_stamps_uncontended_env(monkeypatch):
    """A clean lock acquisition tells the inner process contended=0 (the
    JSON line stamps 'contended': false from it — VERDICT r4 #2)."""
    envs = []

    def fake_run(cmd, timeout, env=None):
        envs.append(env)
        return subprocess.CompletedProcess(cmd, 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._supervised([]) == 0
    assert envs[0]["SF_BENCH_CONTENDED"] == "0"


def test_contended_is_tristate(monkeypatch):
    """_contended() stamps False ONLY on an explicit supervisor
    certificate; a bare `bench.py --inner` / imported bench_train() (no
    lock ever held) stamps 'unknown' — never a laundered false."""
    monkeypatch.delenv("SF_BENCH_CONTENDED", raising=False)
    assert bench._contended() == "unknown"
    monkeypatch.setenv("SF_BENCH_CONTENDED", "0")
    assert bench._contended() is False
    monkeypatch.setenv("SF_BENCH_CONTENDED", "1")
    assert bench._contended() is True
    # any unrecognized value (stale wrapper exports like "true"/"yes")
    # must neither launder as clean nor assert unobserved contention
    for garbage in ("true", "yes", "", "2"):
        monkeypatch.setenv("SF_BENCH_CONTENDED", garbage)
        assert bench._contended() == "unknown", garbage


def test_unopenable_lock_stamps_unknown(monkeypatch, tmp_path):
    """A lock file that cannot even be opened observes NO contention —
    the artifact must stamp 'unknown', not a positive contention claim."""
    monkeypatch.setenv(
        "SF_TPU_LOCK", str(tmp_path / "no_such_dir" / "lock"))
    fd, contended = bench._acquire_tpu_lock()
    assert fd is None and contended == "unknown"


def test_lock_outwaits_holder_by_default(monkeypatch, tmp_path):
    """With no SF_TPU_LOCK_WAIT, _acquire_tpu_lock refuses to proceed while
    another fd holds the lock — it waits until release (no 900s give-up)."""
    import fcntl

    path = str(tmp_path / "lock")
    monkeypatch.setenv("SF_TPU_LOCK", path)
    monkeypatch.delenv("SF_TPU_LOCK_WAIT", raising=False)
    holder = open(path, "w")
    fcntl.flock(holder, fcntl.LOCK_EX)
    sleeps = []

    def fake_sleep(s):
        sleeps.append(s)
        if len(sleeps) == 3:  # holder releases on the third poll
            fcntl.flock(holder, fcntl.LOCK_UN)

    monkeypatch.setattr(bench.time, "sleep", fake_sleep)
    fd, contended = bench._acquire_tpu_lock()
    assert contended is False
    assert len(sleeps) >= 3
    fd.close()
    holder.close()


def test_lock_escape_hatch_marks_contended(monkeypatch, tmp_path):
    """SF_TPU_LOCK_WAIT (test-only escape) expiring flags the measurement
    contended instead of silently recording it as clean."""
    import fcntl

    path = str(tmp_path / "lock")
    monkeypatch.setenv("SF_TPU_LOCK", path)
    monkeypatch.setenv("SF_TPU_LOCK_WAIT", "0.01")
    holder = open(path, "w")
    fcntl.flock(holder, fcntl.LOCK_EX)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    fd, contended = bench._acquire_tpu_lock()
    assert contended is True
    fd.close()
    holder.close()
