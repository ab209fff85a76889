"""PageRank operator: integer-arithmetic semantics vs a pure-Python
reference, plus the guard rails."""

from __future__ import annotations

import pytest

from mlb_data_pipeline_spark.operators.graph import SCALE, pagerank


def _ref_pagerank(edges: list[tuple[int, int]], n_iter: int, damping_pct: int = 85):
    """Line-for-line Python mirror of operators/graph.py's arithmetic."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = ((100 - damping_pct) * SCALE // 100) // n
    rank = {v: SCALE // n for v in nodes}
    for _ in range(n_iter):
        incoming = {v: 0 for v in nodes}
        for s, d in edges:
            incoming[d] += rank[s] // outdeg[s]
        rank = {
            v: base + int((damping_pct * incoming[v]) / 100.0 // 1) for v in nodes
        }
    return rank


@pytest.mark.parametrize("n_iter", [1, 3, 5])
def test_pagerank_matches_reference(spark, n_iter):
    edges = [(1, 2), (2, 1), (1, 3), (4, 1), (4, 1), (2, 3)]  # incl. parallel edge
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {r.node: r.rank_micro for r in pagerank(df, n_iter=n_iter).collect()}
    assert got == _ref_pagerank(edges, n_iter)


def test_pagerank_parallel_edges_are_weight(spark):
    # 1 sends to 2 twice and 3 once: 2 must receive exactly twice 3's share
    df = spark.createDataFrame([(1, 2), (1, 2), (1, 3)], "src BIGINT, dst BIGINT")
    got = {r.node: r.rank_micro for r in pagerank(df, n_iter=1).collect()}
    base = (15 * SCALE // 100) // 3
    share = (SCALE // 3) // 3
    assert got[2] - base == 2 * (got[3] - base) or got[2] == base + int(85 * 2 * share / 100.0 // 1)


def test_pagerank_dangling_mass_leaks(spark):
    # single edge 1 -> 2: node 2 is dangling, total mass must SHRINK
    df = spark.createDataFrame([(1, 2)], "src BIGINT, dst BIGINT")
    got = {r.node: r.rank_micro for r in pagerank(df, n_iter=2).collect()}
    assert sum(got.values()) < SCALE


def test_pagerank_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 2)], "src BIGINT, dst BIGINT")
    with pytest.raises(ValueError):
        pagerank(df, n_iter=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_pct=100)


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    out = pagerank(df, n_iter=2)
    assert out.count() == 0
    assert set(out.columns) == {"node", "rank_micro"}


def test_triangle_count_known_graph_and_plan(spark):
    from pyspark.sql import functions as F

    from mlb_data_pipeline_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles, each node in 3) + a pendant edge +
    # a duplicate/reversed edge that must not double-count
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (2, 1), (3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    plan = triangle_count(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
