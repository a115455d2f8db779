"""Physical-plan audit helpers: assert the plan you'd want at 100 TB.

The reference delegates physical design to SQL Server (SURVEY §4); here the
equivalent discipline is *checking what Catalyst actually chose*. These
helpers parse ``explain`` output so tests can pin the plan properties that
matter at scale:

- dimension joins stay **broadcast** (no sort-merge shuffle of the fact);
- scans are **column-pruned** (ReadSchema ⊆ what the query needs) and
  **filter-pushed** (PushedFilters non-empty where a predicate exists);
- the number of **data shuffles** (hash/range repartitions — broadcast
  exchanges excluded) doesn't silently grow when a query is refactored.

A regression in any of these is invisible at sf0.001 and catastrophic at
100 TB, which is exactly why they're asserted in CI rather than eyeballed.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def executed_plan(df: DataFrame) -> str:
    """Post-AQE physical plan string (node args inline)."""
    return df._jdf.queryExecution().executedPlan().toString()


def join_counts(plan: str) -> dict[str, int]:
    return {
        "broadcast": plan.count("BroadcastHashJoin"),
        "sort_merge": plan.count("SortMergeJoin"),
        "shuffled_hash": plan.count("ShuffledHashJoin"),
        "nested_loop": plan.count("BroadcastNestedLoopJoin"),
    }


def data_shuffle_count(plan: str) -> int:
    """Exchanges that move data by key (hash/range) — the expensive kind.
    BroadcastExchange is excluded: it ships one small relation, not the
    dataset."""
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


def scan_read_schemas(plan: str) -> list[str]:
    """ReadSchema struct strings for every parquet scan in a formatted plan."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def scan_columns(plan: str) -> list[list[str]]:
    return [
        [c.split(":")[0] for c in s.split(",") if c]
        for s in scan_read_schemas(plan)
    ]


def pushed_filters(plan: str) -> list[str]:
    return [f for f in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if f]


def physical_tree(df: DataFrame) -> list:
    """(class_name, java_node) pairs for every node of the CURRENT physical
    plan, descending through AQE wrappers and query stages. Cached subtrees
    (InMemoryTableScanExec) are leaves — a Generate that lives only inside a
    cached relation executes once, at materialization, and is correctly NOT
    counted again per scan (unlike the toString dump, which reprints the
    cached plan at every scan site)."""

    def walk(n):
        name = n.getClass().getSimpleName()
        yield name, n
        if name == "AdaptiveSparkPlanExec":
            yield from walk(n.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            yield from walk(n.plan())
            return
        ch = n.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    return list(walk(df._jdf.queryExecution().executedPlan()))


def physical_node_counts(df: DataFrame) -> dict[str, int]:
    counts: dict[str, int] = {}
    for name, _ in physical_tree(df):
        counts[name] = counts.get(name, 0) + 1
    return counts


def unpartitioned_window_count(df: DataFrame) -> int:
    """WindowExec-family nodes with an EMPTY partitionSpec — each one moves
    its WHOLE input through one task (Spark's own "Moving all data to a
    single partition" warning), the scale-killer VERDICT r16 flagged in the
    rank-statistics family. Model-scale inputs (≤ segment counts) are the
    only place these are tolerable; corpus- or unit-cardinality inputs are
    not."""
    n = 0
    for name, node in physical_tree(df):
        if name in ("WindowExec", "WindowInPandasExec", "WindowGroupLimitExec"):
            if node.partitionSpec().isEmpty():
                n += 1
    return n


def node_metrics(node) -> dict[str, int]:
    """SQLMetric values of one physical node (meaningful after an action has
    run the plan — e.g. ``numOutputRows`` of a partial HashAggregate)."""
    out: dict[str, int] = {}
    m = node.metrics()
    it = m.keysIterator()
    while it.hasNext():
        k = it.next()
        out[k] = m.apply(k).value()
    return out


def assert_no_shuffle_joins(df: DataFrame, plan: str | None = None) -> None:
    """Every join chose a broadcast strategy — the fact never shuffles to
    meet a dimension."""
    p = plan if plan is not None else executed_plan(df)
    jc = join_counts(p)
    assert jc["sort_merge"] == 0 and jc["shuffled_hash"] == 0, (
        f"expected broadcast-only joins, got {jc}"
    )


def assert_column_pruned(df: DataFrame, widest_allowed: int, plan: str | None = None) -> None:
    """No scan reads more than ``widest_allowed`` columns — projection
    pushdown reached the parquet reader."""
    p = plan if plan is not None else formatted_plan(df)
    widths = [len(cols) for cols in scan_columns(p)]
    assert widths and max(widths) <= widest_allowed, (
        f"scan reads {max(widths) if widths else '?'} cols (> {widest_allowed}): {scan_read_schemas(p)}"
    )
