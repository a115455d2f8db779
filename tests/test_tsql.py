"""Property tests for the cross-dialect scalar helpers (SURVEY §7.4.1).

The T-SQL semantics these helpers pin (boundary-count DATEDIFF, guarded
int-date parse, NULL-slot-preserving row hash) are exactly the places a
silent mapping error would corrupt every downstream KPI, so each is tested
against an independent pure-Python reference over hypothesis-generated
inputs — evaluated vectorized (one DataFrame per example batch, not one
Spark job per case)."""

from __future__ import annotations

import datetime as dt
import hashlib

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark import tsql

DATES = st.dates(min_value=dt.date(1753, 1, 1), max_value=dt.date(2999, 12, 31))


def _py_datediff_month(a: dt.date, b: dt.date) -> int:
    return (b.year - a.year) * 12 + (b.month - a.month)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(DATES, DATES), min_size=1, max_size=300))
def test_datediff_boundary_count(spark, pairs):
    df = spark.createDataFrame(pairs, "a date, b date")
    got = df.select(
        tsql.datediff_month("a", "b").alias("m"), tsql.datediff_year("a", "b").alias("y")
    ).collect()
    for (a, b), row in zip(pairs, got):
        assert row["m"] == _py_datediff_month(a, b), (a, b)
        assert row["y"] == b.year - a.year, (a, b)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=99_999_999),
            DATES.map(lambda d: d.year * 10000 + d.month * 100 + d.day),
        ),
        min_size=1,
        max_size=300,
    )
)
def test_yyyymmdd_guarded_parse(spark, ints):
    df = spark.createDataFrame([(i,) for i in ints], "v int")
    got = df.select(tsql.yyyymmdd_to_date("v").alias("d")).collect()
    for i, row in zip(ints, got):
        s = str(i)
        if i == 0 or len(s) != 8:
            expected = None
        else:
            try:
                expected = dt.datetime.strptime(s, "%Y%m%d").date()
            except ValueError:
                expected = None
        assert row["d"] == expected, (i, row["d"], expected)


TEXTS = st.one_of(st.none(), st.text(alphabet=st.characters(codec="utf-8", exclude_characters="\x00"), max_size=20))


def _py_row_hash(cols: tuple) -> str:
    joined = "|".join("" if c is None else str(c) for c in cols)
    return hashlib.sha256(joined.encode("utf-8")).hexdigest()


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(TEXTS, TEXTS, TEXTS), min_size=1, max_size=200))
def test_row_hash_matches_reference_and_preserves_null_slots(spark, rows):
    df = spark.createDataFrame(rows, "a string, b string, c string")
    got = df.select(tsql.row_hash("a", "b", "c").alias("h")).collect()
    for r, row in zip(rows, got):
        assert row["h"] == _py_row_hash(r), r


def test_row_hash_null_slot_no_collision(spark):
    """('a|b', NULL) and ('a', 'b') must hash differently — bare concat_ws
    would collide them by skipping the null element."""
    df = spark.createDataFrame([("a|b", None), ("a", "b")], "x string, y string")
    h = [r["h"] for r in df.select(tsql.row_hash("x", "y").alias("h")).collect()]
    assert h[0] != h[1]


def test_sql_row_hash_duckdb_parity(spark, duck):
    """The oracle-side twin produces byte-identical hashes in DuckDB."""
    rows = [("x", None, "z"), (None, None, None), ("a|b", "", "c")]
    df = spark.createDataFrame(rows, "a string, b string, c string")
    got = [r["h"] for r in df.select(tsql.row_hash("a", "b", "c").alias("h")).collect()]
    expr = tsql.sql_row_hash("a", "b", "c")
    duck_rows = duck.execute(
        f"SELECT {expr} AS h FROM (VALUES ('x', NULL, 'z'), (NULL, NULL, NULL), ('a|b', '', 'c')) t(a, b, c)"
    ).fetchall()
    assert got == [r[0] for r in duck_rows]


def test_sql_datediff_duckdb_parity(duck):
    rows = duck.execute(
        "SELECT "
        + tsql.sql_datediff_month("DATE '2024-01-31'", "DATE '2024-02-01'")
        + " AS m, "
        + tsql.sql_datediff_year("DATE '2023-12-31'", "DATE '2024-01-01'")
        + " AS y"
    ).fetchone()
    assert rows == (1, 1)  # boundary-count, not elapsed-time
