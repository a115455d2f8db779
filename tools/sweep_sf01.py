"""Parity sweep with an O(n) order-independent compare: count + per-row md5
multiset hash (sum mod 2^127) — same guarantee as the sorted-multiset
compare, near-zero compare cost (VERDICT r16 ask #8).

Both engines' rows go through ONE shared normalizer (ADVICE r17 #3: the old
split ns/nd pair tagged Spark Decimals as ('decimal', str) but floated DuckDB
Decimals, so decimal-typed outputs could never hash-match). Decimals are
canonicalized exactly — fixed-point string, trailing zeros stripped — with no
float round-trip on either side.

SF dir comes from $SWEEP_SF_DIR (default /root/testdata/sf0.1)."""
import sys, math, time, hashlib, os
sys.path.insert(0, "/root/repo")
from sql_data_warehouse_and_analytics_project_spark.session import get_spark
spark = get_spark("sweep")
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
import duckdb
SF = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.1")
con = duckdb.connect()
con.execute("PRAGMA temp_directory='/tmp/duck_spill'")
for t in ("region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
def norm(v):
    """Shared Spark/DuckDB row-value normalizer (exact; no float round-trip
    for decimals on either side)."""
    tn = type(v).__name__
    if v is None: return None
    if isinstance(v, float): return "NaN" if math.isnan(v) else v
    if tn == "Decimal":
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        if s in ("", "-0"): s = "0"
        return ("decimal", s)
    if tn in ("date","datetime","Timestamp"): return str(v)
    return v
M = (1 << 127) - 1
def mhash(it):
    n, acc = 0, 0
    for tup in it:
        n += 1
        acc = (acc + int.from_bytes(hashlib.md5(repr(tup).encode()).digest(), "big")) % M
    return n, acc
q, o = e.queries(), e.oracle_sql()
for name in sys.argv[1:]:
    t0 = time.time()
    sdf = q[name](spark, SF)
    sc = sorted(sdf.columns)
    sn, sh = mhash(tuple(norm(r[c]) for c in sc) for r in sdf.toLocalIterator())
    t1 = time.time()
    res = con.execute(o[name])
    dc = [d[0] for d in res.description]
    order = sorted(range(len(dc)), key=lambda i: dc[i])
    assert sc == [dc[i] for i in order], (name, sc, dc)
    def drows():
        while True:
            chunk = res.fetchmany(100_000)
            if not chunk: break
            for r in chunk:
                yield tuple(norm(r[i]) for i in order)
    dn, dh = mhash(drows())
    t2 = time.time()
    ok = (sn, sh) == (dn, dh)
    print(f"{name}: {'MATCH' if ok else 'MISMATCH'} rows={sn}/{dn} spark={t1-t0:.1f}s oracle+cmp={t2-t1:.1f}s total={t2-t0:.1f}s", flush=True)
