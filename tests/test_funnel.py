"""Sequential-constraint semantics of the ordered funnel: each stage
counts only at-or-after the FIRST completion of the previous stage."""

from __future__ import annotations

import datetime as dt

from evmtrace_etl_spark.plans.inventory import funnel_stages


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, ts, u, t, 1.0, "{}") for i, (u, t, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_funnel_sequential_constraint(spark, tmp_path):
    t = lambda s: dt.datetime.fromisoformat(f"2024-01-01T{s}")
    rows = [
        # user 1: full ordered funnel
        (1, "view", t("10:00")), (1, "click", t("10:05")),
        (1, "purchase", t("10:10")),
        # user 2: clicked BEFORE ever viewing -> click doesn't count;
        # purchase without a counted click doesn't count either
        (2, "click", t("09:00")), (2, "view", t("09:30")),
        (2, "purchase", t("09:45")),
        # user 3: view then click, purchase BEFORE the click -> stage 2
        (3, "view", t("08:00")), (3, "purchase", t("08:10")),
        (3, "click", t("08:20")),
        # user 4: never viewed -> not in the funnel at all
        (4, "click", t("07:00")), (4, "purchase", t("07:30")),
        # user 5: same-instant view and click (>= is inclusive)
        (5, "view", t("06:00")), (5, "click", t("06:00")),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {r.user_id: r for r in funnel_stages(spark, sf_dir).collect()}
    assert set(got) == {1, 2, 3, 5}
    assert got[1].stages_completed == 3
    assert got[2].stages_completed == 1  # early click+purchase discarded
    assert got[3].stages_completed == 2  # early purchase discarded
    assert got[5].stages_completed == 2  # same-instant click counts
