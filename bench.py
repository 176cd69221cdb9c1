"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full
materialization, no driver collect overhead). Timings are per-query wall
clock after a shared SparkSession warm-up.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)

    from evmtrace_etl_spark.session import get_spark

    spark = get_spark(app_name="evmtrace_bench", cpus=cpus,
                      shuffle_partitions=cpus)

    from evmtrace_etl_spark import registry

    qs = registry.queries()

    # Warm up the JVM + parquet footer caches with the cheapest query.
    try:
        qs["inv_props_selector"](spark, sf_dir).count()
    except Exception:
        pass

    # Warm up the Python/Arrow worker pool too — daemon workers spawn
    # lazily on the first Python-involving stage (~5-7 s for a full
    # local[32] pool), which would otherwise be billed to whichever
    # Arrow query happens to run first instead of the harness.
    try:
        from pyspark.sql import functions as F

        (
            spark.range(cpus * 4)
            .repartition(cpus)
            .mapInPandas(lambda it: it, "id long")
            .count()
        )
    except Exception:
        pass

    timings: dict[str, float] = {}
    for name in sorted(qs):
        fn = qs[name]
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # pragma: no cover
            timings[name] = -1.0
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
        # Intra-plan persists (ZkParts, LSH signatures) are useful within a
        # query but would pile up across the suite — drop them between runs.
        spark.catalog.clearCache()

    # Streaming throughput probe (rows/sec through the paced file-stream
    # + foreachBatch zk pipeline) — reported alongside, NOT added to the
    # query total, so cross-round query-set comparisons stay clean.
    try:
        from evmtrace_etl_spark.plans.sink_parity import stream_throughput

        rep = int(os.environ.get("SPARK_GRAFT_STREAM_REP", "3000"))
        streaming = stream_throughput(spark, replicate=rep)
    except Exception as exc:  # pragma: no cover
        streaming = {"error": str(exc)}
        print(f"bench: stream_throughput failed: {exc}", file=sys.stderr)

    ok = {k: v for k, v in timings.items() if v >= 0}
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(sum(ok.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "streaming": streaming,
    }))


if __name__ == "__main__":
    main()
