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
