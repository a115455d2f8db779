"""Int8 scalar-quantization calibration: hand-computed codes, the
half-step error bound, constant-dimension degenerate case. Cross-engine
parity for the registered query runs in test_oracle_parity.py."""


from __future__ import annotations

import pytest

from sql_data_warehouse_and_analytics_project_spark.operators import quant


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_quant_calibration_hand_computed(spark):
    """dim0 spans [0, 1]: v=0.5 codes to round(0.5*255)=128, dequantizes
    to round(128*1e7/255)=5019608 fixed-point -> |err| = 19608/1e7.
    dim1 is constant: zero range, zero error, mn=mx."""
    rows = [
        (1, [0.0, 0.25], 0),
        (2, [0.5, 0.25], 0),
        (3, [1.0, 0.25], 0),
    ]
    got = {r["pos"]: r for r in quant.quant_calibration(_emb(spark, rows)).collect()}
    d0 = got[0]
    assert (d0["mn_val"], d0["mx_val"], d0["n_rows"]) == (0.0, 1.0, 3)
    # endpoints reconstruct exactly; the midpoint pays |5019608-5000000|/1e7
    assert d0["max_abs_err"] == round(19608 / 1e7, 6)
    assert d0["mean_abs_err"] == round(19608 / (3 * 1e7), 6)
    d1 = got[1]
    assert d1["mn_val"] == d1["mx_val"]
    assert d1["mean_abs_err"] == 0.0 and d1["max_abs_err"] == 0.0


def test_quant_calibration_half_step_bound(spark):
    """Round-to-nearest coding can never miss by more than half a step:
    max_abs_err <= (mx-mn)/(2*255) + one fixed-point ulp, every dim."""
    sf = "/root/testdata/sf0.001"
    from sql_data_warehouse_and_analytics_project_spark.sources import tpch

    out = quant.quant_calibration(tpch.load(spark, sf, "embeddings")).collect()
    assert len(out) >= 8
    for r in out:
        half_step = (r["mx_val"] - r["mn_val"]) / (2 * quant._LEVELS)
        assert r["max_abs_err"] <= half_step + 2e-6, (r["pos"], r["max_abs_err"], half_step)
        assert 0.0 <= r["mean_abs_err"] <= r["max_abs_err"] + 1e-9


def _emb_sf(spark):
    from sql_data_warehouse_and_analytics_project_spark.sources import tpch

    return tpch.load(spark, "/root/testdata/sf0.001", "embeddings")


def _qvec(emb):
    row = emb.filter(emb.vec_id == 0).select("embedding").collect()[0]
    return [float(x) for x in row["embedding"]]


def test_sq_topk_recall_vs_exact(spark):
    """SQ8 is the near-lossless 4x tier: asymmetric int8 top-10 must agree
    with the exact fixed-point squared-L2 top-10 on >= 8/10 ids."""
    import math

    from pyspark.sql import functions as F

    from sql_data_warehouse_and_analytics_project_spark.operators.similarity import (
        _SCALE,
        quantize,
    )

    emb = _emb_sf(spark)
    bounds = sorted(
        (r["pos"], int(r["mn"]), int(r["mx"])) for r in quant._dim_bounds(emb).collect()
    )
    mn = [b[1] for b in bounds]
    rng = [b[2] - b[1] for b in bounds]
    query_q = [math.floor(x * _SCALE) for x in _qvec(emb)]
    got = [
        r["vec_id"]
        for r in quant.sq_adc_topk(
            quant.sq_encode(emb.filter(F.col("vec_id") != 0), mn, rng),
            query_q, mn, rng, k=10,
        ).collect()
    ]
    q_l = F.array(*[F.lit(int(v)) for v in query_q])
    exact_d = F.aggregate(
        F.zip_with(quantize(F.col("embedding")), q_l, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    exact = [
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") != 0)
        .select("vec_id", exact_d.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    ]
    recall = len(set(got) & set(exact)) / len(exact)
    assert recall >= 0.8, (recall, got, exact)


@pytest.mark.slow
def test_ivfsq_layout_probe_and_append(spark, tmp_path):
    """The composed IVF-SQ8 layout: a full-width probe answers exactly like
    the flat SQ scan (coarse partitioning is pure layout); a narrow probe
    carries a list_id PartitionFilter and never reads the embedding
    column; appending against the STORED models (clamped coding) equals
    one-pass encoding of the whole corpus under those models."""
    from pyspark.sql import functions as F

    from sql_data_warehouse_and_analytics_project_spark.plans import audit

    emb = _emb_sf(spark)
    path = str(tmp_path / "ivfsq")
    quant.build_ivfsq_index(emb, path, n_lists=4)
    qvec = _qvec(emb)
    mn, rng = quant.load_sq_calib(spark, path)
    import math

    from sql_data_warehouse_and_analytics_project_spark.operators.similarity import _SCALE

    query_q = [math.floor(x * _SCALE) for x in qvec]

    full = quant.ivfsq_search(spark, path, qvec, k=11, n_probes=4)
    flat = quant.sq_adc_topk(quant.sq_encode(emb, mn, rng), query_q, mn, rng, k=11)
    assert [tuple(r) for r in full.collect()] == [tuple(r) for r in flat.collect()]

    narrow = quant.ivfsq_search(spark, path, qvec, k=11, n_probes=2)
    plan = audit.executed_plan(narrow)
    assert "PartitionFilters" in plan and "list_id" in plan.split("PartitionFilters")[1][:120], plan
    fplan = audit.formatted_plan(narrow)
    for cols in audit.scan_columns(fplan):
        assert "embedding" not in cols, fplan
    assert narrow.count() == 11

    # incremental: build on evens, append odds under the stored calibration
    path2 = str(tmp_path / "ivfsq_inc")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    quant.build_ivfsq_index(even, path2, n_lists=4)
    quant.append_ivfsq_index(odd, path2)
    assert spark.read.parquet(f"{path2}/codes").count() == emb.count()
    mn2, rng2 = quant.load_sq_calib(spark, path2)
    got = quant.ivfsq_search(spark, path2, qvec, k=10, n_probes=4)
    flat2 = quant.sq_adc_topk(
        quant.sq_encode(emb, mn2, rng2), query_q, mn2, rng2, k=10
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in flat2.collect()]
