"""Unit coverage for bench.py's wait-until-idle gate (VERDICT r6 #4):
the capture must not start while the 1-min loadavg sits above the
threshold, and a decaying load that misses the first bounded wait gets
exactly one extra settle cycle — never an unbounded spin."""

from __future__ import annotations

import bench


def _run_gate(monkeypatch, loads: list[float]) -> tuple[float, int]:
    """Drive wait_until_idle against a scripted loadavg sequence (the
    last value repeats); returns (gate-open loadavg, sleeps taken)."""
    seq = iter(loads)
    last = loads[-1]
    state = {"sleeps": 0, "now": 0.0}

    def fake_loadavg():
        return (next(seq, last), 0.0, 0.0)

    def fake_sleep(s):
        state["sleeps"] += 1
        state["now"] += s

    monkeypatch.setattr(bench.os, "getloadavg", fake_loadavg)
    monkeypatch.setattr(bench.time, "sleep", fake_sleep)
    monkeypatch.setattr(bench.time, "monotonic", lambda: state["now"])
    return bench.wait_until_idle(), state["sleeps"]


def test_gate_opens_immediately_when_idle(monkeypatch):
    load, sleeps = _run_gate(monkeypatch, [0.8])
    assert load == 0.8 and sleeps == 0


def test_gate_threshold_is_tightened(monkeypatch):
    """r6's capture opened at loadavg 2.07 under the old 2.0 gate; the
    r7 threshold must hold the run until the load clears 1.5."""
    assert bench.IDLE_LOADAVG_MAX == 1.5
    load, sleeps = _run_gate(monkeypatch, [2.07, 1.9, 1.6, 1.4])
    assert load == 1.4 and sleeps == 3


def test_gate_grants_one_extra_settle_cycle(monkeypatch):
    """A load still above threshold when the first bounded wait expires
    gets a second bounded wait (IDLE_RETRY_CYCLES=1) — a decaying load
    that clears in that window yields a clean capture."""
    # first cycle: 20 sleeps x 15 s exhaust the 300 s budget while the
    # load decays but stays > 1.5; the retry cycle then sees it clear.
    loads = [5.0] + [5.0 - 0.1 * i for i in range(20)] + [1.2]
    load, sleeps = _run_gate(monkeypatch, loads)
    assert load == 1.2, load


def test_gate_is_bounded_under_sustained_load(monkeypatch):
    """A genuinely loaded host exits after 1 + IDLE_RETRY_CYCLES
    bounded waits — the gate must never spin forever."""
    load, sleeps = _run_gate(monkeypatch, [9.9])
    max_sleeps_per_cycle = bench.IDLE_MAX_WAIT_SEC / 15
    assert load == 9.9
    assert sleeps <= (1 + bench.IDLE_RETRY_CYCLES) * (max_sleeps_per_cycle + 1)


def test_contended_verdict_keys_off_gate_open_load():
    """VERDICT r7 #4: the contended verdict must read the GATE-OPEN
    loadavg (pre-Spark) and the anchor ratio — never the post-warm-up
    sample, which the warm-up queries self-inflate. Exercises the
    function bench.main builds load_check with."""
    contended = bench.contended_verdict

    # r7's real readings: gate opened at 0.94, post-warm-up read 2.0 —
    # the verdict must be CLEAN regardless of the post-warm-up value
    assert contended(0.972, 0.94) is False
    # a gate forced open by bounded-wait expiry IS contention
    assert contended(0.9, 5.0) is True
    # uniform timing inflation flags contention even with a clean gate
    assert contended(1.8, 0.5) is True
    # no anchor ratios available (non-sf0.1 run): gate load decides
    assert contended(None, 0.5) is False
    assert contended(None, 2.2) is True


def test_summary_line_fits_tail_capture_with_real_shapes():
    """VERDICT r8 'What's wrong' #4: the driver keeps only the last
    ~2 KB of bench stdout, and r6-r8's fat single line truncated
    mid-JSON ("parsed": null). The compact final line must fit the
    window whole at the real headline-suite shape — build it with
    every HEADLINE query timed and ratio'd at worst-case widths."""
    import json

    timings = {q: 123.456 for q in bench.HEADLINE}
    ratios = {q: 12.345 for q in bench.HEADLINE}
    line = bench.compact_summary_line(
        total=12345.678,
        timings=timings,
        tpch_total=12345.678,
        llm_total=12345.678,
        ratios=ratios,
        load_check={
            "loadavg_gate_open": 10.55,
            "loadavg_post_warmup": 10.55,
            "median_ratio_vs_anchor": 12.345,
            "contended": False,
        },
        sf=0.1,
    )
    assert len(line) <= bench.SUMMARY_LINE_BUDGET, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_suite_total"
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert "ratio_vs_anchor" in parsed and "load_check" in parsed


def test_summary_line_degrades_rather_than_overruns():
    """If the suite ever grows past the budget, the ratio echo drops
    (keeping the median inside load_check) — the line never exceeds
    the capture window and the headline figure always survives."""
    import json

    many = {f"q_padded_query_name_{i:03d}": 123.456 for i in range(60)}
    line = bench.compact_summary_line(
        total=1.0,
        timings=many,
        tpch_total=1.0,
        llm_total=1.0,
        ratios=dict(many),
        load_check={
            "loadavg_gate_open": 1.0,
            "loadavg_post_warmup": 1.0,
            "median_ratio_vs_anchor": 0.987,
            "contended": False,
        },
        sf=0.1,
    )
    parsed = json.loads(line)
    assert parsed["ratio_vs_anchor"] == {"dropped_for_size_median": 0.987}
    assert parsed["value"] == 1.0
