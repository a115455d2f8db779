"""Encoder plug-through seam (operators/encode.py).

Proves the mapInPandas seam itself — the contract every externally
produced vector must satisfy before the ANN / k-means / near-dup chain
will consume it:

* seam faithfulness: stub-through-mapInPandas == the same numpy math
  replayed driver-side (bit-for-bit after the float32 cast);
* partition/batch independence: 1 partition vs 7 partitions, identical;
* normalization + fixed-point quantization contract: unit L2 norm,
  6 dp rounding survives ``similarity.quantize`` identically;
* loud failure on malformed encoders (wrong shape, NaN);
* composition: encoded vectors drive brute-force cosine top-k,
  ``kmeans_fixed``, and exact-duplicate detection unchanged.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators.encode import (
    as_vectors,
    encode_documents,
    encode_reference,
    stub_encoder,
)
from sql_data_warehouse_and_analytics_project_spark.operators.similarity import (
    cosine_q,
    dot_q,
    quantize,
)

DIM = 16

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the quick brown fox jumps over the lazy dog",  # exact dup of doc 0
    "sphinx of black quartz judge my vow",
    "",  # zero-norm document
    "quick brown fox",  # partial overlap with doc 0
]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, t) for i, t in enumerate(TEXTS)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def encoded(spark, docs):
    out = encode_documents(docs, stub_encoder(DIM), DIM).orderBy("doc_id").collect()
    return {r["doc_id"]: list(r["embedding"]) for r in out}


def test_seam_matches_driver_side_reference(encoded):
    ref = encode_reference(TEXTS, stub_encoder(DIM), DIM)
    assert len(encoded) == len(TEXTS)
    for i, want in enumerate(ref):
        assert encoded[i] == pytest.approx(want, abs=0.0), f"doc {i}"


def test_partition_and_batch_independence(spark, docs):
    one = encode_documents(docs.coalesce(1), stub_encoder(DIM), DIM)
    many = encode_documents(docs.repartition(7), stub_encoder(DIM), DIM)
    a = {r["doc_id"]: list(r["embedding"]) for r in one.collect()}
    b = {r["doc_id"]: list(r["embedding"]) for r in many.collect()}
    assert a == b


def test_schema_matches_embeddings_table(spark, docs):
    enc = encode_documents(docs, stub_encoder(DIM), DIM)
    assert [(f.name, f.dataType.simpleString()) for f in enc.schema.fields] == [
        ("doc_id", "bigint"),
        ("embedding", "array<float>"),
    ]
    vecs = as_vectors(enc, label=7)
    assert vecs.columns == ["vec_id", "embedding", "label"]
    assert vecs.filter(F.col("label") != 7).count() == 0


def test_unit_norm_and_zero_doc(encoded):
    for i, vec in encoded.items():
        n = math.sqrt(sum(x * x for x in vec))
        if i == 4:  # empty text -> all-zero vector, not NaN
            assert vec == [0.0] * DIM
        else:
            assert n == pytest.approx(1.0, abs=1e-4), f"doc {i} norm {n}"


def test_fixed_point_quantization_contract(spark, docs):
    """6 dp rounding before the float32 cast keeps quantize() (x1e7
    floor -> int64) reproducible from the rounded decimal alone."""
    enc = encode_documents(docs, stub_encoder(DIM), DIM)
    rows = enc.select("doc_id", quantize(F.col("embedding")).alias("q")).collect()
    ref = encode_reference(TEXTS, stub_encoder(DIM), DIM)
    for r in rows:
        want = [math.floor(float(x) * 10_000_000.0) for x in ref[r["doc_id"]]]
        assert list(r["q"]) == want


def test_malformed_encoder_fails_loudly(spark, docs):
    def wrong_shape(texts):
        import numpy as np

        return np.zeros((len(texts), DIM + 1))

    def has_nan(texts):
        import numpy as np

        out = np.zeros((len(texts), DIM))
        out[0, 0] = float("nan")
        return out

    from py4j.protocol import Py4JJavaError

    for bad in (wrong_shape, has_nan):
        with pytest.raises(Exception) as ei:
            encode_documents(docs, bad, DIM).collect()
        assert isinstance(ei.value, Py4JJavaError) or "encoder" in str(ei.value)

    with pytest.raises(ValueError):
        encode_documents(docs, stub_encoder(DIM), 0)


def test_composes_with_brute_force_cosine_topk(spark, docs):
    """Exact dup of the query doc ranks first with cosine 1; the partial
    overlap ranks above the unrelated pangrams."""
    vecs = as_vectors(encode_documents(docs, stub_encoder(DIM), DIM))
    normed = vecs.select(
        "vec_id", quantize(F.col("embedding")).alias("q")
    ).withColumn("nq", dot_q(F.col("q"), F.col("q")))
    qv = F.broadcast(
        normed.filter(F.col("vec_id") == 0).select(
            F.col("q").alias("qq"), F.col("nq").alias("nqq")
        )
    )
    top = (
        normed.filter((F.col("vec_id") != 0) & (F.col("nq") > 0))
        .crossJoin(qv)
        .select(
            "vec_id",
            cosine_q(F.col("q"), F.col("qq"), F.col("nq"), F.col("nqq")).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .collect()
    )
    assert top[0]["vec_id"] == 2 and top[0]["cosine"] == pytest.approx(1.0, abs=1e-6)
    assert top[1]["vec_id"] == 5  # partial token overlap beats the pangrams
    assert top[1]["cosine"] > top[2]["cosine"]


def test_composes_with_kmeans_fixed(spark, docs):
    from sql_data_warehouse_and_analytics_project_spark.operators.kmeans import (
        assign_final,
        kmeans_fixed,
    )

    vecs = as_vectors(encode_documents(docs, stub_encoder(DIM), DIM)).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    cents = kmeans_fixed(vecs, k=2, iters=3)
    assert len(cents) == 2 and all(len(c) == DIM for c in cents)
    assigned = {r["vec_id"]: r["cluster"] for r in assign_final(vecs, cents).collect()}
    assert assigned[0] == assigned[2]  # exact dups land in the same cluster


def test_exact_dup_detection_on_encoded_vectors(spark, docs):
    """Identical text -> identical quantized vector: groupBy the quantized
    signature finds the planted dup pair and nothing else."""
    enc = encode_documents(docs, stub_encoder(DIM), DIM)
    groups = (
        enc.select("doc_id", quantize(F.col("embedding")).alias("q"))
        .groupBy("q")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .collect()
    )
    assert [list(g["ids"]) for g in groups] == [[0, 2]]
