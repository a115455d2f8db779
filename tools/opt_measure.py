"""Optimization-round measurement harness (guide §1).

For each named query: capture `.explain("formatted")` to
plans/<tag>/<name>_<suffix>.txt, then time `fn(spark, sf_dir)` followed by a
noop-sink write (guide §1.4 — computes every column of every row, no
collect-to-driver cost) N times and report each run + the min.

Usage:
  python tools/opt_measure.py [--tag r18] [--suffix before] [--runs 3] \
      [--no-explain] [--no-time] name [name ...]

SF dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_data_warehouse_and_analytics_project_spark.registry import all_queries
from sql_data_warehouse_and_analytics_project_spark.session import get_spark


def explain_str(df) -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="r18")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-explain", action="store_true")
    ap.add_argument("--no-time", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt_measure")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.tag
    )
    os.makedirs(out_dir, exist_ok=True)

    # same warmup discipline as bench.py: touch footers + data pages untimed
    from pyspark.sql import functions as F

    from sql_data_warehouse_and_analytics_project_spark.sources import tpch

    for t in tpch.TABLES:
        df = tpch.load(spark, sf_dir, t)
        df.agg(F.count(F.xxhash64(*df.columns)).alias("_touch")).collect()

    for name in args.names:
        rq = qs[name]
        if not args.no_explain:
            spark.catalog.clearCache()
            df = rq.fn(spark, sf_dir)
            with open(os.path.join(out_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(explain_str(df))
            print(f"{name}: explain -> plans/{args.tag}/{name}_{args.suffix}.txt", flush=True)
        if args.no_time:
            continue
        spark.sparkContext.setJobDescription(f"opt_measure warm: {name}")
        spark.catalog.clearCache()
        rq.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"opt_measure run{i}: {name}")
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            rq.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"TIME {name}: min={min(runs)} runs={runs}", flush=True)


if __name__ == "__main__":
    main()
