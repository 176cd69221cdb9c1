"""Unit semantics of the time-series join operators (asof_join /
interval_join_bucketed) on hand-built fixtures: tie-breaking,
unmatched-left nulls, inclusive interval bounds, bucket-boundary
crossings."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from evmtrace_etl_spark.operators.relational import (
    asof_join,
    interval_join_bucketed,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "L1"),
         (1, _ts("2024-01-01T12:00:00"), "L2"),
         (2, _ts("2024-01-01T09:00:00"), "L3")],
        "k long, t timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:30:00"), 100),
         (1, _ts("2024-01-01T11:59:00"), 101),
         (2, _ts("2024-01-01T09:30:00"), 102)],  # after L3 — no match
        "k long, t timestamp, rid long",
    )
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="t",
        right_payload=["rid"], right_tiebreak="rid",
    )
    got = {r.lbl: r.asof_rid for r in out.collect()}
    assert got == {"L1": 100, "L2": 101, "L3": None}


def test_asof_equal_time_is_inclusive_and_tiebreaks_high(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "L")], "k long, t timestamp, lbl string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 7),
         (1, _ts("2024-01-01T10:00:00"), 9),
         (1, _ts("2024-01-01T09:00:00"), 8)],
        "k long, t timestamp, rid long",
    )
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="t",
        right_payload=["rid"], right_tiebreak="rid",
    )
    assert out.collect()[0].asof_rid == 9  # same-instant match, max rid


def test_interval_join_inclusive_bounds_and_bucket_crossing(spark):
    # interval spans multiple 30-min buckets; points at the exact
    # bounds must match (BETWEEN is inclusive), outside must not
    iv = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T12:00:00"), "S")],
        "k long, s timestamp, e timestamp, sid string",
    )
    pts = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "at-start"),
         (1, _ts("2024-01-01T12:00:00"), "at-end"),
         (1, _ts("2024-01-01T11:17:00"), "inside"),
         (1, _ts("2024-01-01T09:59:59"), "before"),
         (1, _ts("2024-01-01T12:00:01"), "after"),
         (2, _ts("2024-01-01T11:00:00"), "other-key")],
        "k long, t timestamp, lbl string",
    )
    out = interval_join_bucketed(
        iv, pts, on=["k"], start="s", end="e", point_time="t"
    )
    assert {r.lbl for r in out.collect()} == {"at-start", "at-end", "inside"}
    # each matching point appears exactly once (no bucket-fanout dupes)
    assert out.count() == 3


def test_asof_tiebreak_keeps_native_string_type(spark):
    """A string tiebreak column must order lexicographically, not be
    cast-nulled into nondeterminism."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "L")], "k long, t timestamp, lbl string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), "0xaa"),
         (1, _ts("2024-01-01T09:00:00"), "0xff"),
         (1, _ts("2024-01-01T09:00:00"), "0x0b")],
        "k long, t timestamp, h string",
    )
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="t",
        right_payload=["h"], right_tiebreak="h",
    )
    assert out.collect()[0].asof_h == "0xff"  # greatest, lexicographic
