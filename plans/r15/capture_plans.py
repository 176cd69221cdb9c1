"""Capture .explain('formatted') for named registry queries into
plans/r15/<query>_<tag>.txt (judge evidence for the optimization round).

Usage: python plans/r15/capture_plans.py <tag> <query> [<query> ...]
       python plans/r15/capture_plans.py <tag> --all
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "plans", "r15")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from evmtrace_etl_spark.session import get_spark
    from evmtrace_etl_spark import registry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark(app_name="capture_plans", cpus=cpus, shuffle_partitions=cpus)
    qs = registry.queries()
    if names == ["--all"]:
        names = sorted(qs)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:
            text = f"ERROR capturing plan: {exc}\n"
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(text)
        print(f"captured {name}_{tag}.txt ({len(text)} chars)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
