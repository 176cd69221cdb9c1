"""The bench harness's streaming-curve SHAPE gate (pure logic — no
Spark): a real pacing regression must fail it; host-noise-level swings
in the absolute numbers must not."""

from __future__ import annotations

from bench import curve_shape_gate


def _pts(*rates):
    return [
        {"files_per_trigger": f, "rows_per_sec": r}
        for f, r in zip((4, 8, 16), rates)
    ]


def test_healthy_curves_pass():
    # the observed driver run and the clean builder run
    assert curve_shape_gate(_pts(1249, 6948, 12291))["pass"]
    assert curve_shape_gate(_pts(3000, 7600, 13500))["pass"]
    # a noisy-but-healthy run: low head, strong scaling
    assert curve_shape_gate(_pts(1100, 4500, 9000))["pass"]
    # the measured end-of-bench saturated-host run: tiny tail inversion
    # (5674 -> 5573, -1.8%) on pacing whose isolated re-probe scaled
    # 3.6-7.1x — must NOT cry wolf
    assert curve_shape_gate(_pts(3088, 5674, 5573))["pass"]


def test_flat_curve_fails_scaling():
    # pacing broke: throughput no longer rises with files_per_trigger
    g = curve_shape_gate(_pts(6000, 6500, 7000))
    assert not g["scaling_ok"] and not g["pass"]


def test_non_monotonic_curve_fails():
    # a real inversion (>10%), not saturation jitter
    g = curve_shape_gate(_pts(3000, 9000, 7000))
    assert not g["monotonic"] and not g["pass"]


def test_collapsed_throughput_fails_floor():
    g = curve_shape_gate(_pts(300, 900, 2500))
    assert not g["last_point_ok"] and not g["pass"]


# ---------------------------------------------------------------------------
# Self-defending re-probe (pure logic)
# ---------------------------------------------------------------------------

from bench import reprobe_curve, suspect_points


def test_suspect_points_identifies_the_stall():
    # a stalled MIDDLE point (the BENCH_r12 shape) implicates itself
    assert suspect_points(_pts(3801, 2334, 7112)) == [1]
    # a stalled TAIL implicates the endpoints (scaling + floor)
    assert suspect_points(_pts(3000, 7000, 3500)) == [0, 2]
    # healthy curves implicate nothing
    assert suspect_points(_pts(3000, 7600, 13500)) == []


def test_reprobe_rescues_a_host_stall():
    """The r12 artifact case: one stalled middle point on healthy
    pacing.  The re-probe returns the clean measurement; the gate
    passes and records BOTH measurements."""
    stalled = _pts(3801, 2334, 7112)
    clean = {"files_per_trigger": 8, "rows_per_sec": 6575, "seconds": 1.0}
    final, gate = reprobe_curve(stalled, lambda fpt: dict(clean))
    assert gate["pass"]
    assert final[1]["rows_per_sec"] == 6575
    assert gate["first_attempt"]["pass"] is False
    assert gate["retries"]["8"]["first"]["rows_per_sec"] == 2334
    assert gate["retries"]["8"]["reprobe"]["rows_per_sec"] == 6575


def test_reprobe_confirms_a_real_regression():
    """A genuinely flat curve re-probes to the same flat numbers — the
    gate still fails, with both measurements on record."""
    flat = _pts(6000, 6500, 7000)

    def same(fpt):
        return next(p for p in flat if p["files_per_trigger"] == fpt)

    final, gate = reprobe_curve(flat, same)
    assert not gate["pass"]
    assert gate["retries"]  # the re-probe happened and is recorded


def test_reprobe_never_slows_a_point():
    """Host noise only ever SLOWS a drain — a re-probe that lands
    slower than the first measurement must not replace it."""
    pts = _pts(3801, 2334, 7112)
    worse = {"files_per_trigger": 8, "rows_per_sec": 1500}
    final, gate = reprobe_curve(pts, lambda fpt: dict(worse))
    assert final[1]["rows_per_sec"] == 2334  # first kept
    assert not gate["pass"]  # still honestly failing


def test_passing_curve_skips_the_reprobe():
    calls = []

    def boom(fpt):
        calls.append(fpt)
        raise AssertionError("must not re-probe a passing curve")

    final, gate = reprobe_curve(_pts(3000, 7600, 13500), boom)
    assert gate["pass"] and calls == [] and "retries" not in gate


def test_head_anomaly_decision():
    """head_anomalous: fires only when the first point sits under
    HEAD_REPROBE_FACTOR x the previous round's same-fixture rate;
    missing history or an empty curve never fires."""
    from bench import head_anomalous

    pts = _pts(1264, 5679, 11370)  # the literal r13 artifact shape
    assert head_anomalous(pts, 3802)        # r12 head: 1264 < 0.5*3802
    assert not head_anomalous(pts, 2400)    # 1264 >= 0.5*2400
    assert not head_anomalous(pts, None)    # no history -> never
    assert not head_anomalous([], 3802)     # no curve  -> never
    assert not head_anomalous(pts, 0.0)     # degenerate history


def test_prev_head_rate_parses_truncated_artifact(tmp_path):
    """prev_head_rate takes the MAX same-files_per_trigger rate over
    the newest HEAD_BASELINE_ROUNDS BENCH_r*.json artifacts (one
    recorded stall must not poison the baseline), regex-parsed out of
    the driver's truncated `tail` string (artifacts do not carry a
    parsed JSON document)."""
    import json as _json

    from bench import prev_head_rate

    tail13 = (
        '..."streaming": {"rows": 99000, "files": 16, "points": '
        '[{"seconds": 78.333, "rows_per_sec": 1263.8, '
        '"micro_batches": 4, "files_per_trigger": 4}, '
        '{"seconds": 17.434, "rows_per_sec": 5678.5, '
        '"micro_batches": 2, "files_per_trigger": 8}]}}'
    )
    tail12 = tail13.replace("1263.8", "3801.7")
    (tmp_path / "BENCH_r12.json").write_text(
        _json.dumps({"rc": 0, "tail": tail12})
    )
    (tmp_path / "BENCH_r13.json").write_text(
        _json.dumps({"rc": 0, "tail": tail13})
    )
    # MAX over the recent window: r13's stalled 1263.8 cannot poison
    # the baseline while r12's healthy 3801.7 is in the window
    assert prev_head_rate(str(tmp_path), 4) == 3801.7
    assert prev_head_rate(str(tmp_path), 8) == 5678.5
    assert prev_head_rate(str(tmp_path), 16) is None   # point absent
    assert prev_head_rate(str(tmp_path / "nope"), 4) is None
    # an artifact OUTSIDE the window no longer anchors the baseline
    from bench import HEAD_BASELINE_ROUNDS

    for r in range(14, 14 + HEAD_BASELINE_ROUNDS):
        (tmp_path / f"BENCH_r{r}.json").write_text(
            _json.dumps({"rc": 0, "tail": tail13})
        )
    assert prev_head_rate(str(tmp_path), 4) == 1263.8
