"""mSPRT sequential monitor: pure-python reference replay, planted-effect
rejection, and the always-valid invariants (nonincreasing p, degenerate-hour
NULLs)."""

from __future__ import annotations

import hashlib
import math
from datetime import datetime as dt, timedelta

from sql_data_warehouse_and_analytics_project_spark.operators.msprt import (
    _ALPHA,
    _TAU2,
    msprt_boundary,
    msprt_counts,
)

SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _arm(u: int) -> int:
    return int(hashlib.md5(str(u).encode()).hexdigest()[:13], 16) % 2


def _python_boundary(events):
    """(hr, n1, n0, x1, x0, theta, log_lambda, p_av) replayed with the
    module's exact formula — the textbook reference the engine must match."""
    hourly = {}
    for ts, user, etype in events:
        hr = (int(ts.timestamp()) * 1_000_000) // 3_600_000_000
        t = _arm(user)
        n1, n0, x1, x0 = hourly.get(hr, (0, 0, 0, 0))
        s = 1 if etype == "purchase" else 0
        if t == 1:
            hourly[hr] = (n1 + 1, n0, x1 + s, x0)
        else:
            hourly[hr] = (n1, n0 + 1, x1, x0 + s)
    out, c1 = [], [0, 0, 0, 0]
    p_min = None
    for hr in sorted(hourly):
        c1 = [a + b for a, b in zip(c1, hourly[hr])]
        n1, n0, x1, x0 = c1
        theta = log_lam = None
        if n1 > 0 and n0 > 0:
            theta = x1 / n1 - x0 / n0
            pp = (x1 + x0) / (n1 + n0)
            v = (pp * (1.0 - pp)) * (1.0 / n1 + 1.0 / n0)
            if v != 0.0:
                log_lam = 0.5 * math.log(v / (v + _TAU2)) + (theta * theta) * _TAU2 / (
                    2.0 * v * (v + _TAU2)
                )
        # a degenerate look contributes p = 1 (LEAST skips the NULL
        # exp(-log_lambda) in both engines) — no evidence, no rejection
        p_here = 1.0 if log_lam is None else min(1.0, math.exp(-log_lam))
        p_min = p_here if p_min is None else min(p_min, p_here)
        out.append((hr, n1, n0, x1, x0, theta, log_lam, p_min))
    return out


def _mk(spark, events):
    rows = [
        (i + 1, ts, user, etype, 1.0 if etype == "purchase" else 0.0, "{}")
        for i, (ts, user, etype) in enumerate(events)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _planted(n_hours, per_hour, lift_arm=None):
    """Deterministic event list: per hour, `per_hour` users fire one view
    each; every 3rd user purchases — plus, if lift_arm is set, EVERY user
    of that arm purchases (a large planted lift)."""
    t0 = dt(2024, 6, 1)
    ev = []
    for h in range(n_hours):
        for i in range(per_hour):
            u = 1 + (h * per_hour + i) % 50
            ts = t0 + timedelta(hours=h, minutes=i % 55)
            buy = (i % 3 == 0) or (lift_arm is not None and _arm(u) == lift_arm)
            ev.append((ts, u, "purchase" if buy else "view"))
    return ev


def test_msprt_matches_python_reference(spark):
    events = _planted(6, 40)
    got = msprt_boundary(msprt_counts(_mk(spark, events))).collect()
    want = _python_boundary(events)
    assert len(got) == len(want)
    for r, (hr, n1, n0, x1, x0, theta, ll, p) in zip(got, want):
        assert (r["hr"], r["n_treat"], r["n_ctrl"], r["x_treat"], r["x_ctrl"]) == (
            hr, n1, n0, x1, x0,
        )
        for col, ref in (("theta_hat", theta), ("log_lambda", ll), ("p_always_valid", p)):
            if ref is None:
                assert r[col] is None, (col, r)
            else:
                assert abs(r[col] - round(ref, 6)) <= 1e-6, (col, r, ref)


def test_msprt_planted_lift_rejects_and_null_stays_accepting(spark):
    """A large planted lift (treatment arm always converts) must cross the
    boundary; a no-effect stream must not (always-valid control at the
    tested horizon)."""
    hot = msprt_boundary(msprt_counts(_mk(spark, _planted(8, 60, lift_arm=1)))).collect()
    assert hot[-1]["rejected"] is True
    null = msprt_boundary(msprt_counts(_mk(spark, _planted(8, 60)))).collect()
    assert all(r["rejected"] is False for r in null)


def test_msprt_p_value_is_nonincreasing_and_degenerate_hours_are_null(spark):
    """The always-valid p is a running min (never increases between
    looks); hours before both arms have data carry NULL log_lambda and a
    vacuous p = 1 look (no evidence, no rejection)."""
    # hour 0: only users of one arm (user 2 is arm 0, user 7 is arm 0)
    t0 = dt(2024, 6, 1)
    arm0_users = [u for u in range(1, 30) if _arm(u) == 0][:3]
    arm1_users = [u for u in range(1, 30) if _arm(u) == 1][:3]
    events = [(t0 + timedelta(minutes=i), u, "view") for i, u in enumerate(arm0_users)]
    for h in range(1, 5):
        for i, u in enumerate(arm0_users + arm1_users):
            events.append(
                (t0 + timedelta(hours=h, minutes=i), u, "purchase" if i % 2 else "view")
            )
    rows = msprt_boundary(msprt_counts(_mk(spark, events))).collect()
    assert rows[0]["log_lambda"] is None
    assert rows[0]["p_always_valid"] == 1.0 and rows[0]["rejected"] is False
    ps = [r["p_always_valid"] for r in rows]
    assert all(p is not None for p in ps)
    assert all(a >= b for a, b in zip(ps, ps[1:]))
