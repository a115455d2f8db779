"""Skew- and shuffle-management operators for the 100 TB path.

The reference's physical design (columnstore + year partitioning,
ref: scripts/silver/ddl_silver.sql:83-85, scripts/gold/ddl_gold.sql:78-103)
delegates data movement to a single node; on a cluster the analogous design
levers are *where the shuffle happens and whether a hot key melts one
executor*. Three tools, in preference order:

1. **AQE skew-join** (config, free): ``spark.sql.adaptive.skewJoin.enabled``
   splits oversized post-shuffle partitions at runtime — the session builder
   enables AQE; no code shape needed.
2. **Salting** (:func:`salted_join`): when one side of a shuffle join has a
   hot key that AQE can't split (e.g. the skewed side also aggregates), add
   a salt column to the big side and replicate the small side per salt —
   the hot key fans out over ``n_salts`` reducers.
3. **Bucketing** (:func:`write_bucketed`): pre-shuffle both sides of a
   repeated join at write time; subsequent joins on the bucket key read
   co-located buckets and skip the exchange entirely — the lakehouse analog
   of the reference's partition-aligned FK indexes
   (ref: scripts/gold/ddl_gold.sql:136-140).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi join with the big side salted and the small side replicated.

    Semantics are identical to ``big.join(small, on, how)`` for
    ``inner``/``left`` (each big row carries exactly one salt, and exactly
    one replica of each matching small row carries that salt). The join key
    becomes (key, salt), so a key that previously hashed to one reducer now
    spreads over ``n_salts`` of them. Cost: the small side is materialized
    ``n_salts``× — use only when the small side is genuinely small and AQE's
    skew split doesn't apply.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt = (F.rand(seed=42) * n_salts).cast("int")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [on, "_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 32, sort: bool = True
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``key``.

    Joins/aggregations on ``key`` between tables bucketed with the same
    bucket count then skip their shuffles (and, if sorted, their sorts) —
    the one-time write shuffle is amortized over every downstream join, the
    right trade for dimension↔fact keys queried daily at 100 TB.

    Thin wrapper over the canonical implementation in
    ``warehouse/bucketing.py`` (which also enforces the one-file-per-bucket
    layout that makes the sortBy metadata usable)."""
    from ..warehouse.bucketing import write_bucketed as _write

    _write(df, table, key, n_buckets=n_buckets, sort=sort)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables with a merge hint: bucketed scans feed
    the sort-merge join directly — zero Exchange in the plan."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.hint("merge").join(rt, on, how)


_SALTED_SQL = """
SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY mktsegment
"""


@query("etl_salted_join_orders", oracle=_SALTED_SQL, defer=True)
def etl_salted_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders×customer revenue by market segment computed through
    :func:`salted_join` — the oracle (a plain join) proves salting is
    semantics-preserving while changing only the shuffle layout."""
    orders = tpch.load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    customer = tpch.load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    return (
        salted_join(orders, customer, "o_custkey", n_salts=8)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
        .orderBy("mktsegment")
    )
