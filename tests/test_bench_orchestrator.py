"""bench.py orchestrator plumbing (VERDICT r4 next #1).

The benchmark runs each section (headline/int8/train) in a subprocess
with a hard deadline, polls for worker recovery between attempts, and
emits a merged JSON line after every completed section so a mid-run
kill still leaves the most complete record on stdout. These tests pin
the pure-host logic with stubbed subprocess/probe — no device needed.
"""

import importlib.util
import json
import subprocess
import time

import pytest


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_merged_line_headline(bench):
    line = bench.merged_line(
        {"headline": {"value": 790.0, "stages_ms": {"full_ms": 40.5},
                      "backend_version": "tfrt tpu v5"},
         "int8": {"int8_fps": 1100.0},
         "train": {"train_fps": 290.0}}, {})
    assert line["metric"] == bench.METRIC
    assert line["value"] == 790.0
    assert line["vs_baseline"] == round(790.0 / bench.BASELINE_FPS, 3)
    assert line["stages_ms"] == {"full_ms": 40.5}
    assert line["int8_fps"] == 1100.0 and line["train_fps"] == 290.0
    assert line["versions"]["backend_version"] == "tfrt tpu v5"
    assert "section_errors" not in line
    json.dumps(line)  # machine-readable


def test_merged_line_partial(bench):
    """One faulted section must not zero the others' metrics."""
    line = bench.merged_line(
        {"int8": {"int8_fps": 1100.0}},
        {"headline": "section headline timed out after 1800s"})
    assert line["value"] is None and line["vs_baseline"] is None
    assert line["int8_fps"] == 1100.0
    assert "timed out" in line["section_errors"]["headline"]


def test_wait_for_worker_recovers(bench, monkeypatch):
    calls = {"n": 0}

    def fake_probe():
        calls["n"] += 1
        return "" if calls["n"] >= 3 else "worker hung"

    monkeypatch.setattr(bench, "probe_backend", fake_probe)
    monkeypatch.setattr(bench, "PROBE_POLL_S", 1)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    assert bench.wait_for_worker(time.time() + 3600) == ""
    assert calls["n"] == 3


def test_wait_for_worker_gives_up_at_deadline(bench, monkeypatch):
    monkeypatch.setattr(bench, "probe_backend", lambda: "still down")
    monkeypatch.setattr(bench, "PROBE_POLL_S", 10)
    # deadline closer than one poll interval -> single probe, then out
    assert bench.wait_for_worker(time.time() + 5) == "still down"


def _result(rc=0, stdout="", stderr=""):
    r = subprocess.CompletedProcess(args=[], returncode=rc)
    r.stdout, r.stderr = stdout, stderr
    return r


def test_run_section_parses_tagged_line(bench, monkeypatch):
    payload = {"value": 5.0, "stages_ms": {}}
    out = ("compile noise\n" + bench._SECTION_TAG + json.dumps(payload)
           + "\n")
    monkeypatch.setattr(bench.subprocess, "run",
                        lambda *a, **k: _result(stdout=out))
    got, err = bench.run_section("headline", time.time() + 1000)
    assert got == payload and err == ""


def test_run_section_reports_failure_tail(bench, monkeypatch):
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **k: _result(rc=1, stderr="boom\nXlaRuntimeError: x"))
    got, err = bench.run_section("int8", time.time() + 1000)
    assert got == {} and "XlaRuntimeError" in err


def test_run_section_hard_deadline(bench, monkeypatch):
    def raise_timeout(*a, **k):
        raise subprocess.TimeoutExpired(cmd="x", timeout=k["timeout"])

    monkeypatch.setattr(bench.subprocess, "run", raise_timeout)
    got, err = bench.run_section("train", time.time() + 1000)
    assert got == {} and "timed out" in err


def test_run_section_timeout_respects_budget(bench, monkeypatch):
    """Section timeout is capped by the remaining global budget."""
    seen = {}

    def capture(*a, **k):
        seen["timeout"] = k["timeout"]
        raise subprocess.TimeoutExpired(cmd="x", timeout=k["timeout"])

    monkeypatch.setattr(bench.subprocess, "run", capture)
    bench.run_section("headline", time.time() + 120)
    assert seen["timeout"] <= 121
    # ...but never below the 60s floor
    bench.run_section("headline", time.time() + 5)
    assert seen["timeout"] == 60


def test_section_worker_emits_tagged_json():
    """The --section CLI contract: a stub section registered in the
    dispatch table prints one tagged JSON line run_section can parse."""
    src = (
        "import importlib.util, sys;"
        "spec = importlib.util.spec_from_file_location('b','bench.py');"
        "m = importlib.util.module_from_spec(spec);"
        "spec.loader.exec_module(m);"
        "m._emit({'value': 7.5})"
    )
    r = subprocess.run(["python", "-c", src], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines()
             if ln.startswith("TSCD_BENCH_SECTION_JSON:")]
    assert len(lines) == 1
    assert json.loads(lines[0].split(":", 1)[1]) == {"value": 7.5}
