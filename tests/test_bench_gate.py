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


# --- r12: window classification (VERDICT r11 item 3) -----------------
# Thresholds calibrated from the two stamped committed r11 artifacts;
# the cases below replay those artifacts' stamps verbatim so the
# classifier provably reproduces the judge's manual adjudication.


def test_classify_quiet_replays_committed_r11_quiet_sweep():
    cls, reasons = bench._classify_window(
        "quiet", 0.62, 0.2569, [0.28, 1.19, 2.22], [2.06, 3.27, 3.48],
        0.888, 0,
    )
    assert cls == "quiet"
    assert reasons == []


def test_classify_contended_replays_driver_r11_sweep():
    # Passed the loadavg gate (host_state quiet_after_60s_wait) yet
    # contaminated: steal 2.18%, 5-min start loadavg 3.61, end 8.75,
    # drift 1.12 with 13 outliers. Multiple independent signals fire.
    cls, reasons = bench._classify_window(
        "quiet_after_60s_wait", 2.18, 0.2736, [0.8, 3.61, 3.74],
        [8.75, 5.88, 5.49], 1.12, 13,
    )
    assert cls == "contended"
    assert any(r.startswith("steal_") for r in reasons)
    assert any(r.startswith("loadavg5_start_") for r in reasons)
    assert any(r.startswith("loadavg1_end_") for r in reasons)


def test_classify_contended_when_gate_gave_up():
    cls, reasons = bench._classify_window(
        "DEGRADED_no_quiet_window_within_600s", 0.3, 0.26,
        [5.0, 2.0, 1.0], [2.0, 2.0, 2.0], 0.95, 0,
    )
    assert cls == "contended"
    assert "no_quiet_window" in reasons


def test_classify_slow_mode_on_hard_probe_reading():
    cls, reasons = bench._classify_window(
        "quiet", 0.4, 0.35, [0.1, 0.2, 0.2], [2.0, 2.0, 2.0], 1.0, 0,
    )
    assert cls == "slow_mode"
    assert any(r.startswith("cpu_probe_") for r in reasons)


def test_classify_slow_mode_on_uniform_drift_many_outliers():
    # The r11 shape the old >1.3 cut missed: moderate median, many
    # simultaneous outliers, all external signals quiet (the documented
    # bimodal-VM mode at loadavg 0.01 / steal 0.4%).
    cls, reasons = bench._classify_window(
        "quiet", 0.4, 0.26, [0.01, 0.1, 0.1], [2.0, 2.0, 2.0], 1.12, 13,
    )
    assert cls == "slow_mode"
    assert any(r.startswith("uniform_drift_") for r in reasons)


def test_classify_contended_outranks_slow_mode():
    cls, _ = bench._classify_window(
        "quiet", 5.0, 0.40, [0.1, 0.1, 0.1], [1.0, 1.0, 1.0], 1.4, 20,
    )
    assert cls == "contended"


def test_classify_unknown_when_no_signals():
    cls, reasons = bench._classify_window(
        "loadavg_unavailable", None, None, None, None, None, 0,
    )
    assert cls == "unknown"
    assert reasons == ["no_host_signals_readable"]


def test_classify_quiet_tolerates_partial_nulls():
    # Off-Linux: no /proc/stat (steal None) but loadavg + probe fine.
    cls, _ = bench._classify_window(
        "quiet", None, 0.26, [0.2, 0.3, 0.3], [2.0, 2.0, 2.0], 0.98, 1,
    )
    assert cls == "quiet"


def test_uniform_drift_matches_motivating_incidents():
    assert bench._uniform_drift(1.294, 24)   # r10 contaminated sweep
    assert bench._uniform_drift(1.12, 13)    # r11 driver sweep
    assert bench._uniform_drift(1.169, 8)    # r11 session slow-mode
    assert not bench._uniform_drift(0.888, 0)   # r11 quiet sweep
    assert not bench._uniform_drift(1.12, 3)    # few outliers: re-pin them
    assert not bench._uniform_drift(None, 50)   # no prior detail


def test_drift_stats_median_and_outliers():
    prev = {"a": 1.0, "b": 2.0, "c": 0.01, "d": 4.0}
    timings = {"a": 1.0, "b": 4.0, "c": 5.0, "d": 4.0}
    med, outliers = bench._drift_stats(timings, prev)
    # c excluded (prev under 50ms); ratios [1.0, 2.0, 1.0] -> median 1.0
    assert med == 1.0
    assert outliers == [(2.0, "b")]
    assert bench._drift_stats({}, prev) == (None, [])


def test_steal_pct_excludes_guest_fields():
    # guest (field 9) is already folded into user by the kernel; a
    # denominator summing it double-counts guest time (ADVICE r11).
    start = [100, 0, 50, 800, 0, 0, 0, 50, 0, 0]
    end = [200, 0, 100, 1500, 0, 0, 0, 100, 100, 0]
    assert bench._steal_pct(start, end) == round(100 * 50 / 900, 2)


def test_prev_detail_rejects_cross_sf_snapshot(tmp_path, monkeypatch):
    # A subset probe at sf0.01 must not compute "drift" against the
    # committed sf0.1 detail (observed r12: 1.337x phantom drift
    # misclassified a quiet probe window as slow_mode).
    import json
    detail = {"sf": 0.1, "queries": {"q1": 1.0}}
    (tmp_path / "BENCH_DETAIL.json").write_text(json.dumps(detail))
    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    assert bench._prev_detail(0.1) == {"q1": 1.0}
    assert bench._prev_detail(0.01) == {}


# --- r13: sweep-retry wall budget (VERDICT r12 item 1) ----------------
# The r12 driver's 32-core run hit rc 124 mid-retry: a non-quiet first
# attempt triggered a second full 87-query sweep plus quiet-waits, and
# the round lost its official bench number entirely. Termination of the
# driver's run is now a tested property: one attempt by default, and
# even an opted-in retry must fit the wall budget.


def test_retry_default_is_single_attempt():
    # Driver invocation (no env): a non-quiet window must NOT retry --
    # it stamps retry_skipped_single_attempt and terminates.
    got = bench._retry_decision(1, "contended", 120.0,
                                max_attempts=1, budget_sec=900.0)
    assert got == "retry_skipped_single_attempt"


def test_retry_quiet_window_always_done():
    assert bench._retry_decision(1, "quiet", 0.0,
                                 max_attempts=2, budget_sec=900.0) == "done"
    assert bench._retry_decision(1, "quiet", 1e9,
                                 max_attempts=1, budget_sec=900.0) == "done"


def test_retry_opted_in_within_budget():
    got = bench._retry_decision(1, "contended", 500.0,
                                max_attempts=2, budget_sec=900.0)
    assert got == "retry"


def test_retry_opted_in_but_budget_exhausted():
    # Replays the r12 failure shape: attempt 1 finished non-quiet after
    # the budget was already gone -- the old code retried and died to
    # the caller's timeout; now it stamps and terminates.
    got = bench._retry_decision(1, "slow_mode", 1200.0,
                                max_attempts=2, budget_sec=900.0)
    assert got.startswith("retry_skipped_budget_")


def test_retry_second_attempt_terminates_regardless():
    assert bench._retry_decision(2, "contended", 100.0,
                                 max_attempts=2, budget_sec=900.0) == "done"


def test_retry_env_defaults_guarantee_termination():
    # The module-level defaults the driver runs with: MAX_SWEEP_ATTEMPTS
    # must be 1 unless the builder exported the opt-in env var.
    if "USHAS_BENCH_MAX_ATTEMPTS" not in os.environ:
        assert bench.MAX_SWEEP_ATTEMPTS == 1
    assert bench.RETRY_BUDGET_SEC > 0
    assert bench.REPIN_BUDGET_SEC > 0


def test_classify_retry_ignores_self_inflicted_loadavg5():
    # Replays the r12 retry sweep's stamps: attempt 2 ran at steal
    # 0.11% / probe 0.2626 / drift 0.654, but the 5-min start loadavg
    # (3.37) still carried attempt 1's own 32 threads. A retry must
    # not classify contended from its own prior attempt.
    args = ("quiet_after_60s_wait", 0.11, 0.2626, [0.86, 3.37, 3.87],
            [2.17, 3.78, 4.02], 0.654, 0)
    assert bench._classify_window(*args)[0] == "contended"  # first attempt
    cls, reasons = bench._classify_window(*args, retried=True)
    assert cls == "quiet"
    assert reasons == []
