"""bench.py outage resilience (VERDICT r3 #1).

The round's perf artifact is whatever ONE JSON line bench.py prints; when
the axon tunnel is down the line must be a machine-readable
``{"error": "tpu_unavailable"}`` record, never a bare traceback (the
round-3 driver artifact was a rc=1 null for exactly this reason).
"""

import json
import subprocess

import bench


def _fake_run(rc=0, stderr=""):
    def run(cmd, capture_output, text, timeout):
        return subprocess.CompletedProcess(cmd, rc, stdout="", stderr=stderr)

    return run


def test_probe_success(monkeypatch):
    monkeypatch.setattr(bench.subprocess, "run", _fake_run(rc=0))
    assert bench.probe_backend(timeout_s=1, attempts=1, backoff_s=0) is None


def test_probe_failure_returns_last_stderr_line(monkeypatch):
    calls = []

    def run(cmd, capture_output, text, timeout):
        calls.append(cmd)
        return subprocess.CompletedProcess(
            cmd, 1, stdout="", stderr="boom\nUnable to initialize backend 'axon'"
        )

    monkeypatch.setattr(bench.subprocess, "run", run)
    detail = bench.probe_backend(timeout_s=1, attempts=3, backoff_s=0)
    assert "Unable to initialize backend 'axon'" in detail
    assert "attempt 3/3" in detail
    assert len(calls) == 3  # bounded retry, all attempts consumed


def test_probe_timeout_is_caught(monkeypatch):
    def run(cmd, capture_output, text, timeout):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(bench.subprocess, "run", run)
    detail = bench.probe_backend(timeout_s=7, attempts=2, backoff_s=0)
    assert "timed out after 7s" in detail


def test_main_emits_structured_error_when_probe_fails(monkeypatch, capsys):
    monkeypatch.setattr(bench, "probe_backend", lambda **kw: "tunnel down")
    bench.main()
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 1  # still exactly ONE JSON line
    rec = json.loads(lines[0])
    assert rec["error"] == "tpu_unavailable"
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert rec["detail"] == "tunnel down"
    assert rec["metric"].startswith("train_images_per_sec_per_chip_")


def test_main_catches_midrun_backend_death(monkeypatch, capsys):
    monkeypatch.setattr(bench, "probe_backend", lambda **kw: None)
    monkeypatch.setattr(
        bench,
        "_run",
        lambda: (_ for _ in ()).throw(
            RuntimeError("Unable to initialize backend 'axon'")
        ),
    )
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["error"] == "tpu_unavailable"
    assert "mid-run" in rec["detail"]
