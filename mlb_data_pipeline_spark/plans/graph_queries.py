"""Link-graph query set (round 7) — PageRank as iterative joins.

The graph is derived from the TPC-H-ish tables: a customer "endorses"
the suppliers it buys from, one edge per lineitem (parallel edges act
as weight). Node ids are namespaced into one BIGINT space
(customer k -> 2k, supplier k -> 2k+1) so the two key spaces cannot
collide.

The oracle unrolls the fixed iteration count into chained CTEs — the
operator's integer micro-unit arithmetic (operators/graph.py) makes
every intermediate bit-identical across engines, which is what makes an
iterative algorithm hash-oracle-able at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.graph import SCALE, pagerank
from .registry import query

_N_ITER = 3
_DAMP = 85
_BASE_NUM = (100 - _DAMP) * SCALE // 100  # 150_000_000_000


def _pagerank_sql(n_iter: int) -> str:
    """Unroll the exact integer-arithmetic PageRank into DuckDB CTEs —
    one CTE per iteration, mirroring operators/graph.py step for step
    (same floors, same integer divisions, same damping split)."""
    iters = []
    prev = "r0"
    for i in range(1, n_iter + 1):
        iters.append(
            f""",
r{i} AS (
  SELECT v.node,
         CAST({_BASE_NUM} // nn.n
              + FLOOR({_DAMP} * COALESCE(c.s, 0) / 100.0) AS BIGINT) AS rank_micro
  FROM nodes v CROSS JOIN nn
  LEFT JOIN (
    SELECT w.dst AS node,
           CAST(SUM(CAST(FLOOR(r.rank_micro / w.deg) AS BIGINT)) AS BIGINT) AS s
    FROM w JOIN {prev} r ON w.src = r.node
    GROUP BY w.dst
  ) c ON v.node = c.node
)"""
        )
        prev = f"r{i}"
    return f"""
WITH edges AS (
  SELECT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
nodes AS (
  SELECT src AS node FROM edges
  UNION
  SELECT dst AS node FROM edges
),
nn AS (SELECT COUNT(*) AS n FROM nodes),
outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
w AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN outdeg d ON e.src = d.src),
r0 AS (SELECT node, CAST({SCALE} // nn.n AS BIGINT) AS rank_micro FROM nodes CROSS JOIN nn){"".join(iters)}
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       node // 2 AS entity_key,
       rank_micro
FROM {prev}
ORDER BY rank_micro DESC, node
LIMIT 20
"""


_Q34_SQL = _pagerank_sql(_N_ITER)


# Named into the driver window (round 7 freed q34 by merging the
# stream-dedup branch into q41) so the driver's independent run
# exercises the iterative-join family.
@query("q34_pagerank_influence", oracle=_Q34_SQL, covers="graph:pagerank,J1,A2,O1,O2")
def q34_pagerank_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer→supplier purchase graph, top 20.

    The curation read: a supplier bought by well-connected customers
    outranks one with the same order count from isolated customers —
    the link-authority prior a web-corpus pipeline computes over the
    domain graph before quality filtering."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
    )
    ranks = pagerank(edges, n_iter=_N_ITER, damping_pct=_DAMP)
    return (
        ranks.select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            (F.col("node") / 2).cast("long").alias("entity_key"),
            "rank_micro",
            F.col("node").alias("__node"),
        )
        .orderBy(F.col("rank_micro").desc(), F.col("__node"))
        .limit(20)
        .drop("__node")
    )


# ---------------------------------------------------------------------------
# R54 — per-node triangle counts (round 9): clustering structure over
#        the co-supplier graph (suppliers co-occurring in an order).
#        Canonical (lo, hi) edges; each triangle counted once as an
#        ordered wedge a < b < c closed by the (a, c) edge — two hash
#        equi-joins, no BNLJ (plan pinned in tests/test_graph_ops.py);
#        the oracle replays the identical joins.
# ---------------------------------------------------------------------------

_R54_SQL = """
WITH co AS (
  SELECT o.o_orderkey, l.l_suppkey
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey % 101 = 0
),
raw AS (
  SELECT x.l_suppkey AS src, y.l_suppkey AS dst
  FROM co x JOIN co y ON x.o_orderkey = y.o_orderkey AND x.l_suppkey < y.l_suppkey
),
und AS (SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi FROM raw WHERE src <> dst),
wedges AS (
  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
  FROM und e1 JOIN und e2 ON e1.hi = e2.lo
  WHERE e1.lo < e2.hi
),
tri AS (
  SELECT w.a, w.b, w.c
  FROM wedges w JOIN und e ON e.lo = w.a AND e.hi = w.c
),
corners AS (
  SELECT unnest([a, b, c]) AS node FROM tri
)
SELECT node, COUNT(*) AS n_triangles
FROM corners
GROUP BY node
ORDER BY node
"""


@query("r54_triangle_count", oracle=_R54_SQL, covers="graph:triangles,J1,A2")
def r54_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_count

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 101 == 0).select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    j = o.join(li, o.o_orderkey == li.l_orderkey).select("o_orderkey", "l_suppkey")
    edges = (
        j.alias("x")
        .join(j.alias("y"), "o_orderkey")
        .filter(F.col("x.l_suppkey") < F.col("y.l_suppkey"))
        .select(F.col("x.l_suppkey").alias("src"), F.col("y.l_suppkey").alias("dst"))
    )
    return triangle_count(edges).orderBy("node")
