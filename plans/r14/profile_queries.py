"""Per-query profiling for the r14 optimization round: wall time via
the noop sink (guide §1.4), Spark JOB COUNT per query (extra jobs =
extra passes / driver round-trips), and optional plan capture.

Usage: python plans/r14/profile_queries.py [out.json] [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     SPARK_GRAFT_PROFILE_PASSES (default 2, min-over-passes like bench.py).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile_r14.json"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from evmtrace_etl_spark.session import get_spark
    from evmtrace_etl_spark import registry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    extra = json.loads(os.environ.get("SPARK_GRAFT_EXTRA_CONF", "{}"))
    spark = get_spark(
        app_name="profile_r14",
        cpus=cpus,
        shuffle_partitions=cpus,
        extra_conf=extra or None,
    )
    qs = registry.queries()
    if not names:
        names = sorted(qs)

    # same warmups as bench.py so pass-1 numbers are comparable
    try:
        qs["inv_props_selector"](spark, sf_dir).count()
        spark.range(cpus * 4).repartition(cpus).mapInPandas(
            lambda it: it, "id long"
        ).count()
        from evmtrace_etl_spark.plans.sink_parity import _replay_batches

        _replay_batches(spark)
    except Exception as exc:
        print(f"warmup failed: {exc}", file=sys.stderr)

    tracker = spark.sparkContext.statusTracker()
    passes = int(os.environ.get("SPARK_GRAFT_PROFILE_PASSES", "2"))
    prof: dict[str, dict] = {}
    for p in range(passes):
        for name in names:
            fn = qs[name]
            jobs0 = tracker.getJobIdsForGroup(None)
            nj0 = max(jobs0) if jobs0 else -1
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                t = round(time.perf_counter() - t0, 4)
            except Exception as exc:
                prof.setdefault(name, {})["error"] = str(exc)
                spark.catalog.clearCache()
                continue
            finally:
                spark.sparkContext.setJobDescription(None)
            jobs1 = tracker.getJobIdsForGroup(None)
            nj1 = max(jobs1) if jobs1 else -1
            row = prof.setdefault(name, {"secs": [], "jobs": []})
            row.setdefault("secs", []).append(t)
            row.setdefault("jobs", []).append(nj1 - nj0)
            spark.catalog.clearCache()
        print(f"pass {p + 1}/{passes} done", file=sys.stderr)

    for name, row in prof.items():
        if "secs" in row and row["secs"]:
            row["min_sec"] = min(row["secs"])
    with open(out_path, "w") as fh:
        json.dump(prof, fh, indent=1, sort_keys=True)
    ranked = sorted(
        (r.get("min_sec", -1), n) for n, r in prof.items()
    )[::-1]
    for s, n in ranked[:40]:
        print(f"{s:8.3f}  jobs={prof[n].get('jobs')}  {n}")


if __name__ == "__main__":
    main()
