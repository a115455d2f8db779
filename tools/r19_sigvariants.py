"""r19 experiment: per-task CPU variants of the minhash / simhash signature
projections (guide §1.2 step 2 — per-task work, after the r18 round fixed
the job shapes).

Hypotheses:
  * minhash V1: ``aggregate(base, P, least(acc, pmod(a*x+b, P)))`` avoids the
    per-sig intermediate array that ``array_min(transform(base, ...))``
    allocates per row (64 transform arrays/doc in the interpreted HOF
    evaluator).
  * simhash S1: 48 independent ``aggregate(base, 0, acc + (x>>i)&1)`` ones
    counters (bit set iff 2*ones > n) avoid the per-ELEMENT 48-long vote
    array + zip_with allocation of the current form.

Each variant is asserted bit-identical to the current signatures on the full
sf distribution, then timed interleaved (noop sink) over N rounds.

Usage: python tools/r19_sigvariants.py [--runs 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators import dedup as D
from sql_data_warehouse_and_analytics_project_spark.operators.text import tokens_col
from sql_data_warehouse_and_analytics_project_spark.session import get_spark


def minhash_v1(docs):
    """aggregate-fold form of minhash_signatures (no transform array per sig)."""
    def fold(a, b):
        return lambda acc, x: F.least(acc, F.pmod(F.lit(a) * x + F.lit(b), F.lit(D._P)))

    sigs = [
        F.aggregate(F.col("_base"), F.lit(D._P).cast("bigint"), fold(a, b)).alias(f"sig_{i}")
        for i, (a, b) in enumerate(D._HASH_AB)
    ]
    return (
        docs.select("doc_id", tokens_col(F.col("text")).alias("_t"))
        .filter(F.size("_t") >= 3)
        .select(
            "doc_id",
            F.transform(
                D.shingles_from(F.col("_t")), lambda s: F.pmod(D._md5_long(s, 15), F.lit(D._P))
            ).alias("_base"),
        )
        .select("doc_id", *sigs)
    )


def simhash_s1(docs):
    """48 ones-count folds; bit i set iff 2*ones_i > n (== vote sum > 0)."""
    bits = D._SIMHASH_BITS
    n = F.size("_base").cast("bigint")
    def onesfold(i):
        return lambda acc, x: acc + F.shiftright(x, i).bitwiseAND(F.lit(1).cast("bigint"))

    ones = [
        F.aggregate(F.col("_base"), F.lit(0).cast("bigint"), onesfold(i))
        for i in range(bits)
    ]
    sim = None
    for i, o in enumerate(ones):
        term = F.when(o * 2 > n, F.lit(1 << i).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        sim = term if sim is None else sim + term
    return (
        docs.select("doc_id", tokens_col(F.col("text")).alias("_t"))
        .filter(F.size("_t") >= 3)
        .select(
            "doc_id",
            F.transform(D.shingles_from(F.col("_t")), lambda s: D._md5_long(s, 12)).alias("_base"),
        )
        .select("doc_id", sim.alias("simhash"))
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r19_sigvariants")
    spark.sparkContext.setLogLevel("ERROR")

    docs = D._docs(spark, sf_dir)
    # warm data pages
    docs.agg(F.count(F.xxhash64(*docs.columns))).collect()

    cur_mh = D.minhash_signatures(docs, spread=True)
    new_mh = minhash_v1(docs.repartition(spark.sparkContext.defaultParallelism))
    cur_sh = D.simhash_signatures(docs, spread=True)
    new_sh = simhash_s1(docs.repartition(spark.sparkContext.defaultParallelism))

    # --- equality gates (exact, full distribution) ---
    mh_diff = cur_mh.exceptAll(new_mh).count() + new_mh.exceptAll(cur_mh).count()
    print(f"minhash V1 exceptAll diff rows: {mh_diff}")
    assert mh_diff == 0, "minhash V1 NOT bit-identical"
    sh_diff = cur_sh.exceptAll(new_sh).count() + new_sh.exceptAll(cur_sh).count()
    print(f"simhash S1 exceptAll diff rows: {sh_diff}")
    assert sh_diff == 0, "simhash S1 NOT bit-identical"

    variants = {
        "minhash_V0_cur": cur_mh,
        "minhash_V1_agg": new_mh,
        "simhash_S0_cur": cur_sh,
        "simhash_S1_agg": new_sh,
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    for k, df in variants.items():  # warm codegen
        noop(df)
    for r in range(args.runs):
        for k, df in variants.items():
            spark.sparkContext.setJobDescription(f"{k} run{r}")
            t0 = time.time()
            noop(df)
            times[k].append(time.time() - t0)
    for k, ts in times.items():
        print(f"{k:18s} min={min(ts):.3f} runs={[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
