"""k-core bounded peel: equals a pure-Python peel-to-fixpoint on graphs
that converge inside the cap (flag true), and reports converged=False —
with the truncated-but-oracle-replayable result — on a long path that
cannot finish in max_rounds."""

from __future__ import annotations

from sql_data_warehouse_and_analytics_project_spark.operators.kcore import kcore


def _python_kcore(edges, k):
    """Peel to the TRUE fixpoint; returns {node: core_degree}."""
    es = set(edges)
    while True:
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        bad = {n for n, d in deg.items() if d < k}
        if not bad:
            return deg
        es = {(a, b) for a, b in es if a not in bad and b not in bad}
        if not es:
            return {}


def _mk(spark, edges):
    return spark.createDataFrame(sorted(edges), "a bigint, b bigint")


def test_kcore_clique_with_tail_peels_to_the_clique(spark):
    """K5 + a pendant path: the path peels away round by round, the
    clique survives with core_deg 4, converged True."""
    k5 = {(a, b) for a in range(5) for b in range(5) if a < b}
    tail = {(4, 10), (10, 11), (11, 12)}
    got = {
        r["node"]: (r["core_deg"], r["converged"])
        for r in kcore(_mk(spark, k5 | tail), k=3).collect()
    }
    assert got == {n: (4, True) for n in range(5)}


def test_kcore_matches_python_fixpoint_on_pseudo_random_graph(spark):
    """60-node pseudo-random graph (deterministic arithmetic edges):
    converges inside the cap and equals the true fixpoint peel."""
    edges = set()
    for i in range(60):
        for j in range(i + 1, 60):
            if (i * 37 + j * 61) % 23 < 4:
                edges.add((i, j))
    want = _python_kcore(edges, 4)
    rows = kcore(_mk(spark, edges), k=4).collect()
    assert all(r["converged"] for r in rows)
    assert {r["node"]: r["core_deg"] for r in rows} == want
    assert len(want) > 5  # the fixture actually has a non-trivial 4-core


def test_kcore_long_path_reports_unconverged_truncation(spark):
    """A 40-node path with k=2 peels one node per END per round: 12
    rounds cannot finish, converged must be False and the survivors are
    exactly the 16 middle nodes (the truncated state the oracle's
    unrolled CTEs reproduce)."""
    path = {(i, i + 1) for i in range(39)}
    rows = kcore(_mk(spark, path), k=2, max_rounds=12).collect()
    assert rows and all(not r["converged"] for r in rows)
    survivors = {r["node"] for r in rows}
    assert survivors == set(range(12, 28))  # 40 - 2*12 middle nodes

    # with enough rounds the true 2-core of a path is EMPTY
    assert kcore(_mk(spark, path), k=2, max_rounds=25).count() == 0


def test_kcore_empty_and_all_core_edges(spark):
    """k above the max degree empties the graph; k=1 keeps every edge's
    endpoints with their full degrees (fixpoint at round one)."""
    tri = {(1, 2), (2, 3), (1, 3)}
    assert kcore(_mk(spark, tri), k=5).count() == 0
    got = {r["node"]: r["core_deg"] for r in kcore(_mk(spark, tri), k=1).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_fixpoint_count_equality_requires_monotone_peel(spark):
    """Pins the docstring invariant (VERDICT r16 nit #3): the loop's
    convergence check is edge-COUNT equality, sound only because each
    round FILTERS the previous edge list (nxt ⊆ cur, so |nxt| = |cur| ⟹
    nxt = cur). Replays the peel in python on the pseudo-random graph
    and asserts set-equality at the first equal-count round; then shows
    the explicit counterexample — equal counts, different sets — that a
    non-monotone rebuild could produce, which the count check alone
    would wrongly accept."""
    edges = set()
    for i in range(60):
        for j in range(i + 1, 60):
            if (i * 37 + j * 61) % 23 < 4:
                edges.add((i, j))

    def peel_round(cur, k):
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        good = {n for n, d in deg.items() if d >= k}
        return {(a, b) for a, b in cur if a in good and b in good}

    cur = set(edges)
    saw_fixpoint = False
    for _ in range(12):
        nxt = peel_round(cur, 4)
        if len(nxt) == len(cur):
            # the monotone-peel implication the engine relies on
            assert nxt == cur
            saw_fixpoint = True
            break
        cur = nxt
    assert saw_fixpoint  # the fixture converges inside the cap

    # counterexample: a NON-monotone step with the same count but a
    # different set — count equality alone is not a fixpoint proof
    fake_cur = {(1, 2), (3, 4)}
    fake_nxt = {(1, 2), (4, 5)}  # not a subset of fake_cur
    assert len(fake_nxt) == len(fake_cur) and fake_nxt != fake_cur

    # and the engine's survivors at the count fixpoint equal the true
    # python fixpoint — the subset argument holds end to end
    rows = kcore(_mk(spark, edges), k=4).collect()
    assert all(r["converged"] for r in rows)
    assert {r["node"] for r in rows} == {n for e in cur for n in e}
