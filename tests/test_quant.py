"""Int8 scalar-quantization calibration: hand-computed codes, the
half-step error bound, constant-dimension degenerate case. Cross-engine
parity for the registered query runs in test_oracle_parity.py."""

from __future__ import annotations

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
