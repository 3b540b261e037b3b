"""Unit tests for bench.py's quiet-host gate (r11, VERDICT r10 item 2).

Pure driver-side logic -- no Spark session. The gate's contract: a
sweep only starts on a quiet 1-min loadavg (or after a bounded wait),
and the artifact records the gate's own verdict in host_state so drift
adjudication never again needs someone watching uptime live.
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_loadavg_returns_triple_or_none():
    got = bench._loadavg()
    # On this Linux box it must be a real reading; the None branch is
    # for platforms without getloadavg (covered below by monkeypatch).
    assert got is None or (len(got) == 3 and all(x >= 0 for x in got))


def test_loadavg_none_when_platform_lacks_it(monkeypatch):
    def boom():
        raise OSError("no loadavg here")

    monkeypatch.setattr(bench.os, "getloadavg", boom)
    assert bench._loadavg() is None


def test_quiet_host_passes_immediately_when_quiet(monkeypatch):
    monkeypatch.setattr(bench, "_loadavg", lambda: [0.2, 0.5, 0.5])
    monkeypatch.setattr(bench, "QUIET_LOAD_THRESHOLD", 1.0)
    load, state = bench._await_quiet_host()
    assert load == [0.2, 0.5, 0.5]
    assert state == "quiet"


def test_quiet_host_waits_then_passes(monkeypatch):
    readings = iter([[3.0, 2.0, 1.0], [2.0, 2.0, 1.0], [0.4, 1.0, 1.0]])
    monkeypatch.setattr(bench, "_loadavg", lambda: next(readings))
    monkeypatch.setattr(bench, "QUIET_LOAD_THRESHOLD", 1.0)
    monkeypatch.setattr(bench, "QUIET_MAX_WAIT_SEC", 100)
    monkeypatch.setattr(bench, "_QUIET_POLL_SEC", 1)
    slept = []
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    load, state = bench._await_quiet_host()
    assert load == [0.4, 1.0, 1.0]
    assert state == "quiet_after_2s_wait"
    assert slept == [1, 1]


def test_quiet_host_gives_up_loudly_after_bounded_wait(monkeypatch):
    """No quiet window -> run anyway (the driver's per-round run must
    never be blocked forever) but the artifact says DEGRADED."""
    monkeypatch.setattr(bench, "_loadavg", lambda: [5.0, 5.0, 5.0])
    monkeypatch.setattr(bench, "QUIET_LOAD_THRESHOLD", 1.0)
    monkeypatch.setattr(bench, "QUIET_MAX_WAIT_SEC", 3)
    monkeypatch.setattr(bench, "_QUIET_POLL_SEC", 1)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    load, state = bench._await_quiet_host()
    assert load == [5.0, 5.0, 5.0]
    assert state.startswith("DEGRADED_no_quiet_window_within_")


def test_quiet_host_null_loadavg_degrades_to_unavailable(monkeypatch):
    monkeypatch.setattr(bench, "_loadavg", lambda: None)
    load, state = bench._await_quiet_host()
    assert load is None
    assert state == "loadavg_unavailable"


def test_cpu_probe_returns_positive_wall():
    got = bench._cpu_probe_sec(reps=1)
    assert 0 < got < 60


def test_cpu_times_reads_proc_stat_on_linux():
    got = bench._cpu_times()
    assert got is None or (len(got) >= 8 and all(x >= 0 for x in got))


def test_steal_pct_from_snapshots():
    start = [100, 0, 50, 800, 0, 0, 0, 50]
    end = [200, 0, 100, 1500, 0, 0, 0, 100]  # delta total 900, steal 50
    assert bench._steal_pct(start, end) == round(100 * 50 / 900, 2)
    assert bench._steal_pct(None, end) is None
    assert bench._steal_pct(start, None) is None
    assert bench._steal_pct(start, start) is None  # zero window
    assert bench._steal_pct([1, 2], [3, 4]) is None  # short (no steal field)
