"""Entity-resolution fuzzy matching: deletion-neighborhood blocking must
be EXACT for Levenshtein <= 1 (substitutions AND indels), equal to the
brute-force O(n^2) answer on a crafted corpus, and the hot-cluster cap
must drop only capped-bucket candidates."""

from __future__ import annotations

import itertools

import pytest

from sql_data_warehouse_and_analytics_project_spark.operators.er import (
    fuzzy_pairs,
)

NAMES = [
    (1, "alpha#0001"),
    (2, "alpha#0002"),   # substitution vs 1
    (3, "alpha#00012"),  # insertion vs 1
    (4, "alph#0001"),    # deletion vs 1
    (5, "alpha#0091"),   # substitution vs 1 (pos 8)
    (6, "beta#0001"),    # far from all
    (7, "alpha#0001"),   # exact duplicate of 1 (dist 0)
    (8, "gamma#77"),
    (9, "gamma#78"),     # substitution vs 8
]


def _python_truth(max_dist=1):
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    out = set()
    for (k1, s1), (k2, s2) in itertools.combinations(NAMES, 2):
        a, b = (k1, k2) if k1 < k2 else (k2, k1)
        if lev(s1, s2) <= max_dist:
            out.add((a, b))
    return out


def test_fuzzy_pairs_equals_bruteforce(spark):
    df = spark.createDataFrame(NAMES, "id bigint, name string")
    got = {
        (r["id_1"], r["id_2"]): r["dist"]
        for r in fuzzy_pairs(df, "id", "name").collect()
    }
    assert set(got) == _python_truth()
    assert got[(1, 7)] == 0  # exact duplicate reported at distance 0
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(1, 4)] == 1


def test_fuzzy_pairs_bucket_cap_drops_hot_clusters(spark):
    """A mass-duplicate cluster blows past the cap and is excluded; the
    rare pair elsewhere survives."""
    rows = [(i, "dup#x") for i in range(50)] + [(100, "rare#1"), (101, "rare#2")]
    df = spark.createDataFrame(rows, "id bigint, name string")
    got = {
        (r["id_1"], r["id_2"]) for r in fuzzy_pairs(df, "id", "name", bucket_cap=10).collect()
    }
    assert got == {(100, 101)}
    uncapped = fuzzy_pairs(df, "id", "name").count()
    assert uncapped == 50 * 49 // 2 + 1


def test_fuzzy_pairs_rejects_unsupported_threshold(spark):
    df = spark.createDataFrame(NAMES, "id bigint, name string")
    with pytest.raises(ValueError):
        fuzzy_pairs(df, "id", "name", max_dist=2)


def test_entity_clusters_equal_union_find_truth(spark):
    """pairs → entities: clusters equal the union-find closure of the
    brute-force pair set, with min-id canonical records."""
    from sql_data_warehouse_and_analytics_project_spark.operators.er import (
        entity_clusters,
    )

    parent = {k: k for k, _ in NAMES}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in _python_truth():
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {}
    for k, _ in NAMES:
        truth.setdefault(find(k), set()).add(k)
    multi = {r: m for r, m in truth.items() if len(m) > 1}

    df = spark.createDataFrame(NAMES, "id bigint, name string")
    got = {
        r["entity_id"]: (r["n_members"], r["min_key"], r["max_key"], r["canonical_name"])
        for r in entity_clusters(df, "id", "name").collect()
    }
    names_by_key = dict(NAMES)
    assert set(got) == set(multi)
    for root, members in multi.items():
        assert got[root] == (
            len(members), min(members), max(members), names_by_key[root]
        )
