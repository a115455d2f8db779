"""Component-cohesion audit semantics on hand-built graphs: the
chain-vs-clique distinction the transitive-closure overreach hides."""

from __future__ import annotations

from sql_data_warehouse_and_analytics_project_spark.operators import dedup


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_id_1 bigint, doc_id_2 bigint")


def _run(spark, edges):
    return {
        r["component_id"]: (r["n_nodes"], r["n_edges"], r["n_triangles"], r["clustering"])
        for r in dedup.component_cohesion(_pairs(spark, edges)).collect()
    }


def test_chain_vs_triangle_vs_clique(spark):
    edges = [
        (1, 2), (2, 3),                    # chain: over-merged component
        (10, 11), (11, 12), (10, 12),      # triangle: genuine clique
        (20, 21), (20, 22), (20, 23),
        (21, 22), (21, 23), (22, 23),      # 4-clique
    ]
    got = _run(spark, edges)
    # chain: 3 nodes, 2 edges, 0 triangles, wedges = 1 → clustering 0.0
    assert got[1] == (3, 2, 0, 0.0)
    # triangle: wedges 3, 3·1/3 = 1.0
    assert got[10] == (3, 3, 1, 1.0)
    # 4-clique: 4 triangles, wedges 4·C(3,2)=12, 12/12 = 1.0
    assert got[20] == (4, 6, 4, 1.0)


def test_paw_graph_partial_clustering(spark):
    """Triangle with a pendant ('paw'): triangles 1, wedges 5 → 0.6."""
    edges = [(1, 2), (1, 3), (2, 3), (3, 4)]
    got = _run(spark, edges)
    assert got[1] == (4, 4, 1, 0.6)


def test_pair_component_clustering_zero_by_convention(spark):
    got = _run(spark, [(5, 6)])
    assert got[5] == (2, 1, 0, 0.0)
