"""Scale crossover measurement: the two-pass partition-safe folds
(`abstats._value_cumsums`, `olap_extras._dist_ntile`) vs the
single-partition `Window.orderBy` they replaced (VERDICT r17 ask #2).

Methodology: synthetic tables at count-table cardinalities spanning
sf0.1-equivalent (~1e6 distinct unit values) through sf1 (~1e7) and 3x
beyond, materialized to parquet so both variants read identical input.
Each variant runs REPS times interleaved (A,B,A,B,...) and reports the
median wall-clock; both variants' forced aggregates are asserted equal,
so the timing run doubles as a bit-identity check at every scale.

Usage: python tools/crossover_sf1.py [out.json]
"""
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators.abstats import (
    _value_cumsums,
)
from sql_data_warehouse_and_analytics_project_spark.operators.olap_extras import (
    _dist_ntile,
)
from sql_data_warehouse_and_analytics_project_spark.session import get_spark

SIZES = [1_000_000, 3_000_000, 10_000_000, 30_000_000]
REPS = 3

# Unique-by-construction scrambled sort key: (id mod 8191) in the high
# bits, id in the low 30 bits (all SIZES < 2^30). Strict uniqueness
# matters: a duplicate v would make the ROWS-frame cumsum tie-order
# dependent and the cross-variant equality assert flaky; the 8191-way
# block interleave defeats the nearly-sorted-input advantage a plain
# monotone key would hand the single-task sort.
def _scrambled():
    return ((F.col("id") % 8191) * F.lit(1 << 30) + F.col("id")).cast("bigint")


def _counts(spark, n, base):
    """(v, c1, c0, c) count table with all-distinct v — the shape the
    MWU fold consumes (unit-cardinality for a continuous metric)."""
    path = f"{base}/counts_{n}.parquet"
    try:
        return spark.read.parquet(path)
    except Exception:
        pass
    df = spark.range(n).select(
        _scrambled().alias("v"),
        (F.col("id") % 2).cast("decimal(38,0)").alias("c1"),
        (1 - F.col("id") % 2).cast("decimal(38,0)").alias("c0"),
        F.lit(1).cast("decimal(38,0)").alias("c"),
    )
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _metric(spark, n, base):
    """(ckey, metric) per-customer table — the shape the NTILE queries
    rank."""
    path = f"{base}/metric_{n}.parquet"
    try:
        return spark.read.parquet(path)
    except Exception:
        pass
    df = spark.range(n).select(
        F.col("id").alias("ckey"),
        _scrambled().alias("metric"),
    )
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def mwu_two_pass(counts):
    stepped, _tot = _value_cumsums(counts, ["c"])
    return stepped.agg(
        F.sum(F.col("cum_c") * F.col("c1")).cast("decimal(38,0)").alias("chk")
    ).collect()[0]["chk"]


def mwu_single_window(counts):
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stepped = counts.withColumn("cum_c", F.sum("c").over(w))
    return stepped.agg(
        F.sum(F.col("cum_c") * F.col("c1")).cast("decimal(38,0)").alias("chk")
    ).collect()[0]["chk"]


def ntile_two_pass(df):
    tiled = _dist_ntile(df, ["metric", "ckey"], 10, "tile")
    return tiled.agg(
        F.sum(F.col("tile") * (F.col("ckey") % 97)).cast("decimal(38,0)").alias("chk")
    ).collect()[0]["chk"]


def ntile_single_window(df):
    w = Window.orderBy("metric", "ckey")
    tiled = df.withColumn("tile", F.ntile(10).over(w))
    return tiled.agg(
        F.sum(F.col("tile") * (F.col("ckey") % 97)).cast("decimal(38,0)").alias("chk")
    ).collect()[0]["chk"]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/crossover_sf1.json"
    base = "/tmp/crossover_inputs"
    spark = get_spark("crossover")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for n in SIZES:
        counts = _counts(spark, n, base)
        metric = _metric(spark, n, base)
        row = {"n": n}
        for label, fns in (
            ("mwu", (mwu_two_pass, mwu_single_window)),
            ("ntile", (ntile_two_pass, ntile_single_window)),
        ):
            two_pass_fn, single_fn = fns
            src = counts if label == "mwu" else metric
            times = {"two_pass": [], "single_window": []}
            checks = set()
            for _ in range(REPS):
                for name, fn in (("two_pass", two_pass_fn), ("single_window", single_fn)):
                    t0 = time.time()
                    chk = fn(src)
                    times[name].append(round(time.time() - t0, 3))
                    checks.add(str(chk))
            assert len(checks) == 1, (label, n, checks)  # bit-identical at scale
            row[f"{label}_two_pass_med"] = statistics.median(times["two_pass"])
            row[f"{label}_single_window_med"] = statistics.median(times["single_window"])
            row[f"{label}_runs"] = times
        results.append(row)
        print(json.dumps(row), flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
