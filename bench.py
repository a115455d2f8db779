"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is materialized with a count() after a cold plan build; the
timing includes scan + shuffle + aggregation (what a user pays), not
collect-to-driver serialization of full results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql_data_warehouse_and_analytics_project_spark.registry import all_queries
from sql_data_warehouse_and_analytics_project_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    qs = all_queries()
    headline = {n: rq for n, rq in qs.items() if rq.headline}

    # Warm the JVM + filesystem metadata once so per-query timings measure
    # query execution, not session startup / first-touch parquet footers.
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name, rq in sorted(headline.items()):
        t0 = time.perf_counter()
        df = rq.fn(spark, sf_dir)
        df.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
