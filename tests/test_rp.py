"""Random-projection dim reduction: JL recall, exactness, plan shape.

Oracle parity for ``ann_rp_topk`` runs in tests/test_oracle_parity.py
like every registered query.
"""

from __future__ import annotations

from conftest import SF_DIR
from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators import pq, rp
from sql_data_warehouse_and_analytics_project_spark.sources import tpch


def _emb(spark):
    return tpch.load(spark, SF_DIR, "embeddings")


def test_rp_signs_deterministic_and_balanced():
    s1, s2 = rp.rp_signs(), rp.rp_signs()
    assert s1 == s2
    assert len(s1) == rp._RP_K and all(len(r) == rp._RP_D for r in s1)
    flat = [v for r in s1 for v in r]
    assert set(flat) == {-1, 1}
    # md5 parity is a fair coin: the 1024-entry matrix should be roughly
    # balanced (a degenerate all-ones matrix would project onto one axis)
    frac_pos = sum(1 for v in flat if v > 0) / len(flat)
    assert 0.40 < frac_pos < 0.60, frac_pos


def test_rp_shortlist_recalls_exact_topk(spark):
    """The JL contract on the UNSTRUCTURED fixture (near-random vectors —
    the worst case for any ANN; the semantic-dedup family's 2-probe
    recall 0.64 vs given-label 0.05 is the same regime): a top-50 RP
    shortlist must beat the 50/490 ~ 10% random baseline by an order of
    magnitude, and top-100 must recall >= 0.6 of the exact top-10.
    Measured grid (k=16/24/32, shortlist 50/100) showed k=16 dominates —
    more dims don't help when there is no structure to preserve."""
    emb = _emb(spark)
    qrow = pq._quantized(emb).filter(F.col("vec_id") == 0).select("q").first()
    qcol = F.array(*[F.lit(int(v)) for v in qrow["q"]])
    exact = [
        r["vec_id"]
        for r in pq._quantized(emb)
        .filter(F.col("vec_id") != 0)
        .select("vec_id", pq._sqdist_q(F.col("q"), qcol).alias("d"))
        .orderBy(F.asc("d"), F.asc("vec_id"))
        .limit(10)
        .collect()
    ]
    top50 = {r["vec_id"] for r in rp.rp_topk(emb, k=50).collect()}
    top100 = {r["vec_id"] for r in rp.rp_topk(emb, k=100).collect()}
    assert len(set(exact) & top50) / len(exact) >= 0.3  # ~3x the 10% baseline
    assert len(set(exact) & top100) / len(exact) >= 0.6


def test_rp_preserves_planted_structure_exactly(spark):
    """Where real neighbor structure EXISTS, RP must keep it: plant 5
    near-copies of the query among 200 decoys — all 5 must fill the top-5
    RP slots (JL distorts distances, it cannot swap a 0.01-radius
    neighbor past a unit-distance decoy at k=16)."""
    import random

    rnd = random.Random(7)
    dim = rp._RP_D
    qv = [rnd.uniform(-1, 1) for _ in range(dim)]
    rows = [(0, 0, qv)]
    for i in range(1, 6):  # planted: query + tiny noise
        rows.append((i, 0, [x + rnd.uniform(-0.01, 0.01) for x in qv]))
    for i in range(6, 206):  # decoys: fresh random vectors
        rows.append((i, 1, [rnd.uniform(-1, 1) for _ in range(dim)]))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<double>"
    )
    got = [r["vec_id"] for r in rp.rp_topk(emb, k=5).collect()]
    assert sorted(got) == [1, 2, 3, 4, 5], got


def test_rp_projection_is_linear_and_exact(spark):
    """y(a) + y(b) == y(a+b) row-wise for the fixed-point inputs — the
    projection is an exact integer linear map, so distances in RP space
    are reproducible bit-for-bit anywhere."""
    emb = _emb(spark).limit(3)
    rows = {r["vec_id"]: r["y"] for r in rp.rp_project(emb).collect()}
    raw = {
        r["vec_id"]: [int(v) for v in r["q"]]
        for r in pq._quantized(emb).collect()
    }
    signs = rp.rp_signs()
    for vid, y in rows.items():
        want = [
            sum(q * s for q, s in zip(raw[vid], srow)) for srow in signs
        ]
        assert [int(v) for v in y] == want, vid


def test_rp_topk_plan_is_shuffle_free(spark):
    """Scale shape: projection + broadcast query row +
    TakeOrderedAndProject — the only Exchange allowed is the broadcast."""
    out = rp.rp_topk(_emb(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    import re

    shuffles = re.findall(r"Exchange \w+partitioning", plan)
    assert not shuffles, plan
