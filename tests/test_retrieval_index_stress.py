"""Planted 10x scale stress for the persisted inverted index (r11).

tests/test_retrieval_index.py pins the SHAPES (bucket PartitionFilters,
path equivalence); this module drives them at a 50k-doc synthetic corpus
(~10x the sf0.1 documents table) with a planted hot term (in ~20% of
docs — the worst-case posting list) and fixed-df query terms (planted in
an absolute id range, so their posting lists do NOT grow with the
corpus) and asserts the contracts the layout exists for:

1. the queried buckets hold a bounded fraction of the postings table —
   an indexed query's scan cost is the queried posting lists, not the
   corpus;
2. serving a fixed-df query from the quarter-size index and the
   full-size index costs about the same wall-clock (the ratio idiom of
   the other stress tests): a 4x corpus must NOT make the query ~4x
   slower, because the query never touches the corpus — only its
   (constant-size) posting lists plus bucket-pruned overhead;
3. the full-size indexed answer equals the in-memory postings path,
   hot posting list included.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators import retrieval as rt

_N = 50_000
_BUCKETS = 64
_FIXED_DF_QUERY = ("alphaq", "betaq")  # planted in id<400 / 400<=id<800
_FULL_QUERY = ("alphaq", "hotterm", "betaq")


def _corpus(spark, n: int):
    """Deterministic synthetic docs, generated distributed: 16 md5-derived
    4-hex tokens per doc (65k-term space -> natural df spread), 'hotterm'
    planted in every 5th doc (posting list grows with n), 'alphaq'/'betaq'
    planted in absolute id ranges (posting lists FIXED at any n >= 800)."""
    md5 = F.md5(F.col("id").cast("string"))
    base = F.concat_ws(" ", *[F.substring(md5, 1 + 2 * j, 4) for j in range(16)])
    text = F.concat_ws(
        " ",
        base,
        F.when(F.col("id") % 5 == 0, F.lit("hotterm")).otherwise(F.lit("filler")),
        F.when(F.col("id") < 400, F.lit("alphaq"))
        .when(F.col("id") < 800, F.lit("betaq"))
        .otherwise(F.lit("pad")),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang"), text.alias("text")
    )


def _median_serve_secs(spark, path, terms, runs: int = 3) -> float:
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        rt.bm25_search_indexed(spark, path, terms).collect()
        out.append(time.perf_counter() - t0)
    return sorted(out)[runs // 2]


@pytest.mark.slow
def test_inverted_index_survives_planted_scale(spark, tmp_path):
    docs_full = _corpus(spark, _N).localCheckpoint()
    path_full = str(tmp_path / "invidx_full")
    rt.build_inverted_index(docs_full, path_full, n_buckets=_BUCKETS)
    path_quarter = str(tmp_path / "invidx_quarter")
    rt.build_inverted_index(_corpus(spark, _N // 4), path_quarter, n_buckets=_BUCKETS)

    # 1 — bucket scan bound: md5 spreads the 65k-term space evenly, so the
    # queried buckets hold roughly len(buckets)/64 of all postings; 2x slack
    posts = spark.read.parquet(f"{path_full}/postings")
    total = posts.count()
    want_buckets = sorted({rt._term_bucket_py(t, _BUCKETS) for t in _FULL_QUERY})
    in_buckets = posts.filter(F.col("bucket").isin(want_buckets)).count()
    assert in_buckets <= 2 * total * len(want_buckets) / _BUCKETS, (
        in_buckets,
        total,
        want_buckets,
    )

    # 3 — correctness at 10x, hot posting list included; planted hot df
    # survives the layout exactly
    got = rt.bm25_search_indexed(spark, path_full, _FULL_QUERY).collect()
    want = rt.bm25_postings_topk(docs_full, _FULL_QUERY).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == rt._BM25_K
    hot_df = (
        spark.read.parquet(f"{path_full}/terms")
        .filter(F.col("term") == "hotterm")
        .first()["df"]
    )
    assert hot_df == _N // 5, hot_df

    # 2 — fixed-df serving cost is ~flat in corpus size (median-of-3 each,
    # measured back-to-back): 4x the corpus, same posting lists. A linear
    # dependence on corpus size would show ~4x; allow 2x for pruned-scan
    # overhead (more files listed/skipped) and ambient noise.
    _median_serve_secs(spark, path_quarter, _FIXED_DF_QUERY, runs=1)  # warm plans
    t_quarter = _median_serve_secs(spark, path_quarter, _FIXED_DF_QUERY)
    t_full = _median_serve_secs(spark, path_full, _FIXED_DF_QUERY)
    assert t_full <= 2.0 * t_quarter + 0.5, (t_full, t_quarter)
