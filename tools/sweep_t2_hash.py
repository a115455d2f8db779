"""Pair-heavy sweep: count + engine-side md5 multiset hash (VERDICT r16
ask #8). Both engines hash each row's canonical '|'-joined integer string
with md5, take the first 15 hex chars as a 60-bit int, and SUM exactly
(decimal(38,0) / HUGEINT) — an order-independent multiset hash with the
same guarantee as the row-multiset compare at near-zero compare cost."""
import sys, time
sys.path.insert(0, "/root/repo")
from sql_data_warehouse_and_analytics_project_spark.session import get_spark
from pyspark.sql import functions as F
import duckdb

spark = get_spark("t2sweep")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
con = duckdb.connect()
con.execute("PRAGMA temp_directory='/tmp/duck_spill'")
for t in ("customer",):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
import __spark_entry__ as e
q, o = e.queries(), e.oracle_sql()
name = "er_fuzzy_pairs_t2"
cols = ["c_custkey_1", "c_custkey_2", "c_name_1", "c_name_2", "dist"]
t0 = time.time()
sdf = q[name](spark, SF)
assert sorted(sdf.columns) == sorted(cols), sdf.columns
row = sdf.agg(
    F.count(F.lit(1)).alias("n"),
    F.sum(
        F.expr(
            "cast(conv(substring(md5(concat_ws('|', "
            + ", ".join(cols)
            + ")), 1, 15), 16, 10) as decimal(38,0))"
        )
    ).alias("h"),
).collect()[0]
sn, sh = row["n"], int(row["h"])
t1 = time.time()
dq = (
    "SELECT COUNT(*) AS n, SUM(('0x' || substr(md5("
    + " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    + "), 1, 15))::BIGINT::HUGEINT) AS h FROM (" + o[name] + ")"
)
dn, dh = con.execute(dq).fetchone()
t2 = time.time()
ok = (sn, sh) == (dn, int(dh))
print(f"{name}: {'MATCH' if ok else 'MISMATCH'} rows={sn}/{dn} hash={sh}/{dh} spark={t1-t0:.1f}s oracle={t2-t1:.1f}s total={t2-t0:.1f}s")
