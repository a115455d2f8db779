"""CUPED A/B readout semantics: a correlated pre-period covariate cuts
post-metric variance without moving the treatment effect; an
uncorrelated covariate leaves everything untouched (theta ~ 0)."""

from __future__ import annotations

from datetime import datetime as dt, timedelta as td

from sql_data_warehouse_and_analytics_project_spark.operators.abtest import (
    cuped_ab_readout,
)

T0 = dt(2024, 3, 1)
T_PRE = T0 + td(hours=1)
T_POST = T0 + td(hours=150)  # strictly inside period 2 (midpoint = 100h)
T_END = T0 + td(hours=200)


def _events(spark, users, effect=5.0, correlated=True, seed=3):
    """Per user: a pre-period click whose value is the user's latent
    activity a_u, and a post-period purchase = a_u (+ effect on arm 1)
    + small deterministic noise. With correlated=False the click value
    is a constant (no variance to remove)."""
    import hashlib

    rows, eid = [], 0

    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:13], 16) % 2

    rows.append((eid, T0, 10**6, "view", 1.0, "{}")); eid += 1
    rows.append((eid, T_END, 10**6 + 1, "view", 1.0, "{}")); eid += 1
    if not correlated:
        # keep the covariate truly constant: the range-marker users get
        # the same pre-period click as everyone else
        for mu in (10**6, 10**6 + 1):
            rows.append((eid, T_PRE, mu, "click", 50.0, "{}")); eid += 1
    for u in users:
        a = 10.0 + (u * 37 % 100)  # latent activity, high variance
        noise = ((u * 7919 + seed) % 13) / 13.0
        pre = a if correlated else 50.0
        post = a + noise + (effect if arm(u) == 1 else 0.0)
        rows.append((eid, T_PRE, u, "click", pre, "{}")); eid += 1
        rows.append((eid, T_POST, u, "purchase", post, "{}")); eid += 1
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )


def test_cuped_cuts_variance_and_keeps_effect(spark):
    users = list(range(400))
    out = {r["treatment"]: r for r in cuped_ab_readout(_events(spark, users)).collect()}
    assert set(out) == {0, 1}
    for t in (0, 1):
        assert out[t]["var_reduction"] > 0.9  # covariate explains ~all variance
        assert out[t]["var_post_cuped"] < out[t]["var_post"] * 0.1
    raw_effect = out[1]["mean_post"] - out[0]["mean_post"]
    adj_effect = out[1]["mean_post_cuped"] - out[0]["mean_post_cuped"]
    assert abs(adj_effect - 5.0) < 0.5
    # the adjusted estimate is at least as close to truth as the raw one
    assert abs(adj_effect - 5.0) <= abs(raw_effect - 5.0) + 0.25


def test_cuped_noop_on_uncorrelated_covariate(spark):
    users = list(range(300))
    out = {
        r["treatment"]: r
        for r in cuped_ab_readout(_events(spark, users, correlated=False)).collect()
    }
    for t in (0, 1):
        assert abs(out[t]["theta"]) < 1e-6  # constant covariate -> var(X)=0 path
        assert abs(out[t]["mean_post_cuped"] - out[t]["mean_post"]) < 1e-6
