"""Child writer for the cross-PROCESS two-writer test: its own
SparkSession (separate JVM, separate driver — the in-process _log_lock
cannot help), appending batches to a shared lake table through the
snapshot log with bounded conflict retries.

Usage: python lake_two_process_script.py <table> <lo> <n_batches>
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from evmtrace_etl_spark.sinks import append_files, retry_on_conflict


def main() -> None:
    tbl, lo, n_batches = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("lake-two-process-child")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "1g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for b in range(n_batches):
        batch = spark.range(lo + b * 100, lo + b * 100 + 100).select(
            F.col("id").alias("k"), F.lit(-2).cast("long").alias("v")
        )
        led = retry_on_conflict(
            lambda: append_files(spark, batch, tbl), attempts=10
        )
        print(
            f"CHILD_COMMIT v{led['version']} rows={led['rows']} "
            f"files={led['files_added']} rebased={led.get('rebased', 0)}",
            flush=True,
        )
    spark.stop()
    print("CHILD_DONE", flush=True)


if __name__ == "__main__":
    main()
