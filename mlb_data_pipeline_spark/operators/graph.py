"""Link-graph scoring operators.

A large-scale curation pipeline ranks web documents by link authority
(the Common-Crawl-style quality prior) before quality filters run — the
reference's curation layer implies source scoring but only orchestrates
it (mlb_pipeline_dag.py daily cadence; no graph code exists there), so
the engine provides the distributed form: PageRank as iterative
DataFrame joins, the Pregel-on-DataFrames shape next to
``dedup.connected_components``.

Determinism contract: ranks live in INTEGER MICRO-UNITS (1.0 of
probability mass == ``SCALE`` = 1e12). Every step is integer-exact or a
single IEEE-double op (one multiply, one divide, one floor) on values
far below 2^53, so results are bit-identical across engines and across
partition orders — a float PageRank's sum order would differ run to
run; this one is oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 1.0 of rank mass, in micro-units


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 3,
    damping_pct: int = 85,
    max_plan_iters: int = 8,
) -> DataFrame:
    """PageRank over a directed edge list → (node, rank_micro).

    Semantics (the textbook simplified variant, chosen because it is
    exactly mirrorable in unrolled SQL):

    * rank_0(v)   = floor(SCALE / N) for every node
    * contrib(e)  = floor(rank_t(src) / outdeg(src)) per EDGE — parallel
      edges are weight, each duplicate contributes once
    * rank_{t+1}(v) = floor((100-d)*SCALE/100 / N)
                      + floor(d * sum(contrib into v) / 100)
    * dangling mass (nodes with no out-edges) LEAKS — it is not
      redistributed. Ranks are therefore a lower bound on full
      PageRank; ORDERING, the curation signal, matches on graphs where
      dangling nodes are sinks of the same class (here: suppliers).
      Full dangling redistribution would add a per-iteration scalar
      aggregate; the leak variant keeps each iteration one join + one
      groupBy.

    Every arithmetic step is floor-quantized integer math (see module
    docstring), so the result is engine- and order-independent.

    Scale shape: each iteration is ONE shuffle join of edges⋈ranks on
    src (edges pre-joined with outdeg once, checkpointed) and ONE
    groupBy dst with a map-side-combinable integer SUM. Ranks are
    |V|-sized, edges |E|-sized; nothing collects to the driver. Lineage
    is truncated with a lazy localCheckpoint every iteration (the
    pattern measured fastest for ``connected_components``), so the plan
    never grows with ``n_iter``.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not (0 < damping_pct < 100):
        raise ValueError(f"damping_pct must be in (0,100), got {damping_pct}")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # One scalar: |V|. Bounded metadata (a single long), same contract as
    # the centroid/stats collects elsewhere in the engine.
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank_micro", F.lit(0).cast("long"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # edges ⋈ outdeg is iteration-invariant: pay it once, checkpoint it
    weighted = e.join(outdeg, "src").localCheckpoint(eager=False)
    base = int(((100 - damping_pct) * SCALE // 100) // n_nodes)
    ranks = nodes.withColumn("rank_micro", F.lit(int(SCALE // n_nodes)).cast("long"))
    for i in range(n_iter):
        contrib = (
            weighted.join(ranks, weighted.src == ranks.node)
            .groupBy("dst")
            .agg(
                F.sum(F.floor(F.col("rank_micro") / F.col("__deg"))).cast("long").alias("__in")
            )
        )
        ranks = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            (
                F.lit(base)
                + F.floor(
                    F.lit(damping_pct) * F.coalesce(F.col("__in"), F.lit(0)) / F.lit(100.0)
                )
            )
            .cast("long")
            .alias("rank_micro"),
        )
        # lazy: materialized by the next iteration's shuffle (or the
        # caller's action); bounds plan depth without an extra job
        if (i + 1) % max(1, max_plan_iters) == 0 or i == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED graph — the
    clustering-structure primitive next to PageRank (X1) and connected
    components (q65): community cores have triangles, crawl sprays and
    bipartite artifacts do not.

    Canonicalize every edge to (lo, hi) and dedup, then count each
    triangle exactly once as an ordered wedge a < b < c closed by the
    (a, c) edge: one self-equi-join on the middle vertex builds the
    wedges, one more equi-join closes them — all hash joins on node
    ids, no BNLJ. Each closed triangle credits all three corners via
    one explode. 100 TB note: wedge volume is sum(deg^2) — for
    power-law graphs route hubs through the standard degree-ordering
    (orient edges low-degree -> high-degree) before calling; on the
    bounded co-occurrence graphs the engine builds (pairs within an
    order) plain id ordering is already the bound."""
    a, b = F.col(src), F.col(dst)
    und = (
        edges.select(F.least(a, b).alias("lo"), F.greatest(a, b).alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    e1 = und.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = und.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    wedges = e1.join(e2, "b").filter(F.col("a") < F.col("c"))
    closer = und.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tri = wedges.join(closer, ["a", "c"])
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))
