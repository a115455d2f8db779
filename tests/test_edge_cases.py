"""Degenerate-input robustness: empty and uniform corpora through the
near-dup pipelines. An empty delta load and a mass-duplicate crawl batch are
both routine at 100 TB — neither may throw or mis-pair."""

from __future__ import annotations

from sql_data_warehouse_and_analytics_project_spark.operators import dedup

_SCHEMA = "doc_id long, lang string, text string"


def test_dedup_pipelines_handle_empty_corpus(spark):
    empty = spark.createDataFrame([], _SCHEMA)
    caches = []
    assert dedup.minhash_lsh_pairs(empty, _caches=caches).count() == 0
    assert dedup.simhash_pairs(empty, _caches=caches).count() == 0
    assert dedup.ngram_jaccard_candidates(empty, _caches=caches).count() == 0
    for c in caches:
        c.unpersist()


def test_dedup_pipelines_handle_uniform_corpus(spark):
    """10 byte-identical docs: the exact-dup collapse reduces LSH to ONE
    representative (no band bucket ever sees the mass), and the member
    expansion must still emit every C(10,2) pair at Jaccard exactly 1.0."""
    uniform = spark.createDataFrame(
        [(i, "en", "alpha beta gamma delta epsilon zeta") for i in range(10)], _SCHEMA
    )
    caches = []
    rows = dedup.minhash_lsh_pairs(uniform, _caches=caches).collect()
    assert len(rows) == 45
    assert all(r["jaccard"] == 1.0 for r in rows)
    assert all(r["doc_id_1"] < r["doc_id_2"] for r in rows)

    sim = dedup.simhash_pairs(uniform, _caches=caches).collect()
    assert len(sim) == 45
    assert all(r["hamming"] == 0 for r in sim)
    for c in caches:
        c.unpersist()


def test_ivf_training_handles_empty_embeddings(spark, tmp_path):
    """An empty embeddings delta must not crash k-means training OR the
    composed index build/search path (r4 review fixes: the seed sampler
    indexed pts[0] before its degenerate guard; build_ivf_index couldn't
    type an empty centroid literal; a zero-row partitioned write left
    nothing ivf_search could infer a schema from)."""
    from sql_data_warehouse_and_analytics_project_spark.operators import similarity as sim

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    assert sim.train_ivf_centroids(empty, n_lists=8, iters=2) == []
    path = str(tmp_path / "ivf")
    assert sim.build_ivf_index(empty, path, n_lists=8, iters=2) == []
    assert sim.ivf_search(spark, path, [0.0] * 64, k=5, n_probes=3).count() == 0


def test_phash_pipeline_handles_empty_and_uniform_signatures(spark):
    """phash_pairs edge cases: an empty signature frame yields no pairs; a
    frame where every image shares one phash collapses to a single rep and
    expands to exactly C(n,2) hamming-0 member pairs (no band self-join
    blowup — bands see ONE distinct hash)."""
    from sql_data_warehouse_and_analytics_project_spark.operators import multimodal as mm

    empty = spark.createDataFrame([], "media_id bigint, phash bigint")
    assert mm.phash_pairs(empty).count() == 0

    uniform = spark.createDataFrame([(i, 12345) for i in range(10)], "media_id bigint, phash bigint")
    rows = mm.phash_pairs(uniform).collect()
    assert len(rows) == 45
    assert all(r.hamming == 0 for r in rows)
