"""Scale-visible measurement for the heavy dedup/ER pipelines (VERDICT r18
ask #2): sf0.1 is driver-latency-bound (all 25 headliner 8-vs-32-core ratios
≈1), so parallel fraction is measured HERE, on synthetic corpora at 3× and
10× the sf0.1 row counts (≈ sf0.3 / sf1 equivalents).

Corpora are deterministic expansions of the sf0.1 tables, written once to
parquet (untimed setup) in a layout the registry fns accept as a `sf_dir`:
  documents: each source doc replicated K× with distinct doc_ids; even
    copies keep the text verbatim (exact-dup collapse work), odd copies
    append a copy-marker token (near-dup verify work).
  customer: replicated K× with distinct custkeys; odd copies flip the last
    name character (deletion-variant / levenshtein verify work).

Each pipeline runs on local[$SPARK_GRAFT_CPUS]; run this script once with
SPARK_GRAFT_CPUS=32 and once with 8 and compare (the orchestrator below does
both when invoked with --both). A count+hash checksum is recorded per run so
the 8- and 32-core executions are asserted identical.

Usage:
  python tools/crossover_pipelines.py --both [--sizes 3,10] [--out out.json]
  (or single-process: SPARK_GRAFT_CPUS=8 python tools/crossover_pipelines.py)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/crossover_pipelines"
SRC = "/root/testdata/sf0.1"


def _gen(spark, k: int) -> str:
    """Expand sf0.1 into a synthetic sf-dir at k× rows. Deterministic."""
    from pyspark.sql import functions as F

    out = f"{BASE}/sfx{k}"
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_docs = 10_000_000
    copies = spark.range(k).select(F.col("id").alias("_c"))
    (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("_c") * n_docs).alias("doc_id"),
            F.when(F.col("_c") % 2 == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" copyv"), F.col("_c")))
            .alias("text"),
            "lang",
            *[c for c in docs.columns if c not in ("doc_id", "text", "lang")],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    n_cust = 10_000_000
    (
        cust.crossJoin(copies)
        .select(
            (F.col("c_custkey") + F.col("_c") * n_cust).alias("c_custkey"),
            F.when(F.col("_c") % 2 == 0, F.col("c_name"))
            .otherwise(F.concat(F.expr("substring(c_name, 1, length(c_name)-1)"), F.lit("X")))
            .alias("c_name"),
            *[c for c in cust.columns if c not in ("c_custkey", "c_name")],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/customer.parquet")
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out


def _checksum(df):
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return [int(row["n"]), int(row["h"] or 0)]


def run_one(sizes: list[int], reps: int) -> dict:
    from sql_data_warehouse_and_analytics_project_spark.operators import dedup as D
    from sql_data_warehouse_and_analytics_project_spark.operators import er as E
    from sql_data_warehouse_and_analytics_project_spark.operators import multimodal as M
    from sql_data_warehouse_and_analytics_project_spark.registry import all_queries
    from sql_data_warehouse_and_analytics_project_spark.session import get_spark

    qs = all_queries()
    spark = get_spark("crossover_pipelines")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = spark.sparkContext.defaultParallelism
    res = {"cpus": cpus, "scales": {}}
    for k in sizes:
        sf_dir = _gen(spark, k)
        # warm footers + pages once, untimed
        for t in ("documents", "customer"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        row = {}
        for name in (
            "dedup_minhash_lsh",
            "dedup_cdc_chunks",
            "er_fuzzy_customer_pairs",
            "dedup_image_phash",
        ):
            fn = qs[name].fn
            times, chk = [], None
            for r in range(reps):
                spark.sparkContext.setJobDescription(f"{name} k={k} run{r}")
                t0 = time.time()
                df = fn(spark, sf_dir)
                chk = _checksum(df)
                times.append(round(time.time() - t0, 3))
            row[name] = {"times": times, "min": min(times), "checksum": chk}
            print(f"cpus={cpus} k={k} {name}: {times} chk={chk}", flush=True)
        res["scales"][str(k)] = row
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--both", action="store_true")
    ap.add_argument("--sizes", default="3,10")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="/tmp/crossover_pipelines.json")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    if args.both:
        results = {}
        for cpus in ("32", "8"):
            env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--sizes", args.sizes,
                 "--reps", str(args.reps), "--out", f"{args.out}.c{cpus}"],
                env=env,
            )
            assert p.returncode == 0, f"cpus={cpus} run failed"
            with open(f"{args.out}.c{cpus}") as f:
                results[cpus] = json.load(f)
        # equality across core counts + ratio table
        table = {}
        for k in results["32"]["scales"]:
            for name, r32 in results["32"]["scales"][k].items():
                r8 = results["8"]["scales"][k][name]
                assert r32["checksum"] == r8["checksum"], (k, name, "checksum mismatch")
                table.setdefault(k, {})[name] = {
                    "t32": r32["min"],
                    "t8": r8["min"],
                    "ratio_8_over_32": round(r8["min"] / r32["min"], 2),
                }
        out = {"per_core": results, "ratios": table}
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(table, indent=1))
        return
    res = run_one(sizes, args.reps)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
