"""Vector / similarity / dedup query set — SURVEY §2.10 Q29-Q30 + V3/V5.

The reference's signature retrieval surface re-expressed Spark-first:
top-k cosine retrieval (pipeline.py:104-110, scripts/rag_pipeline.py:42-52),
batch k-NN join (scripts/rag_pipeline_2.py:34-51 per-query results),
context assembly (pipeline.py:110) and dedup-by-key upsert semantics
(pipeline.py:58-77, scripts/scrape_store_embed.py:79).

All similarity math is JVM-side (zip_with/aggregate in DOUBLE after a
float->double cast); DuckDB oracles use list_dot_product over
CAST(embedding AS DOUBLE[]) so both engines fold the same values in the
same index order. Similarities are ROUND(_, 4) per the determinism
contract; ordering keys always include the id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.vector import context_assembly, cosine_pairs_exact, cosine_pairs_lsh, knn_join
from .registry import query

# Q30's exact dedup-on-normalized-key demo moved into q09's dedup
# family as the 'exact_norm' branch (round 9) — the freed slot holds
# the chunk-level boilerplate removal (ex-r45). The standalone form
# stays importable for tests.


def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic dedup: canonical row per key = min doc_id (a plain
    # dropDuplicates keeps an arbitrary row — unacceptable under the
    # hash contract). One shuffle on the dedup key, then a count agg.
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", "source", F.array_join(F.slice(F.split("text", " "), 1, 3), " ").alias("dedup_key")
    )
    w = Window.partitionBy("dedup_key").orderBy("doc_id")
    kept = keyed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return kept.groupBy("source").agg(F.count("*").alias("n_docs")).orderBy("source")


# ---------------------------------------------------------------------------
# Q36 — batch k-NN join (V3 exact): 10 query vectors, top-2 each
# ---------------------------------------------------------------------------

_Q36_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
     q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
     scored AS (
       SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
              list_dot_product(e.v, q.v)
                / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))) AS rawsim
       FROM e CROSS JOIN q
       WHERE e.vec_id <> q.vec_id
     )
SELECT query_id, neighbor_id, CAST(ROUND(rawsim, 4) AS DOUBLE) AS sim, rank
FROM (SELECT query_id, neighbor_id, rawsim,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rawsim DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= 2
ORDER BY query_id, rank
"""


@query("q36_knn_join", oracle=_Q36_SQL, covers="V3,J9,O3", bench=True)
def q36_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # max_queries=None: the vec_id < 10 predicate bounds the query side
    # to <= 10 rows by construction, so the guard's limit-probe job
    # (one action per invocation) proves nothing the filter doesn't.
    topk = knn_join(emb, queries, "vec_id", "embedding", k=2, max_queries=None)
    return topk.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round("sim", 4).cast("double").alias("sim"),
        "rank",
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# Q37 — retrieval context assembly (V5): top-3 docs for one query vector
# ---------------------------------------------------------------------------

_Q37_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
     q AS (SELECT v FROM e WHERE vec_id = 0),
     topk AS (
       SELECT e.vec_id,
              ROW_NUMBER() OVER (
                ORDER BY list_dot_product(e.v, q.v)
                           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))) DESC,
                         e.vec_id) AS rank
       FROM e CROSS JOIN q
       WHERE e.vec_id <> 0
       QUALIFY rank <= 3
     )
SELECT string_agg(d.text, chr(10) || chr(10) ORDER BY t.rank) AS context,
       COUNT(*) AS n_docs
FROM topk t JOIN documents d ON d.doc_id = t.vec_id
"""


@query("q37_context_assembly", oracle=_Q37_SQL, covers="V2,V5,S7,A5,J2,O1,O2")
def q37_context_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    topk = knn_join(emb, emb.filter(F.col("vec_id") == 0), "vec_id", "embedding", k=3)
    ranked = topk.join(docs, topk.vec_id == docs.doc_id).select("rank", "text")
    return context_assembly(ranked, "text", "rank")


# ---------------------------------------------------------------------------
# Q38 — embedding-cosine near-duplicate pairs (V4 near-dup, exact tier)
# ---------------------------------------------------------------------------

_Q38_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(ROUND(list_dot_product(a.v, b.v)
                  / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4)
            AS DOUBLE) AS sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
ORDER BY vec_a, vec_b
"""


@query("r62_embedding_neardup", oracle=_Q38_SQL, covers="V4,J6")
def r62_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact tier: quadratic self-join, valid at correctness scale. The
    # 100 TB path for the same semantics is q39 (LSH banding: candidate
    # generation is a bucket equi-join, exact cosine residual check).
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_pairs_exact(emb, "vec_id", "embedding", threshold=0.4)
    return pairs.select(
        F.col("a_vec_id").alias("vec_a"),
        F.col("b_vec_id").alias("vec_b"),
        F.round("sim", 4).cast("double").alias("sim"),
    ).orderBy("vec_a", "vec_b")


# ---------------------------------------------------------------------------
# Q52 — LSH near-dup (V3/V4 scale path) — approximate: no SQL oracle;
#        recall vs the exact pairs is asserted in tests/test_vector_ops.py
#        and reported per-round in the bench JSON ("recall" key)
# ---------------------------------------------------------------------------


@query("q52_embedding_neardup_lsh", oracle=None, covers="V3,V4", bench=True)
def q52_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import table_row_count
    from ..operators.vector import band_freq_cap

    emb = load_table(spark, sf_dir, "embeddings")
    # 32 planes / 8 bands of 4 bits: ~2/3 recall at sim 0.3 on isotropic
    # data (real near-dup corpora sit at sim >= 0.9 where the same config
    # recalls >95%); precision is exact via the residual cosine check.
    # The hot-bucket cap (8x expected uniform occupancy — n/2 at 4-bit
    # bands) guards the pathological point-mass case; a non-degenerate
    # corpus never trips it, so rows are unchanged at every bench sf.
    # n sizes the cap and the gather budget only — parquet footer
    # metadata gives the identical exact count without a scan job.
    n = table_row_count(sf_dir, "embeddings")
    # n_rows feeds the residual-scoring gather guard only (params are
    # explicit here): the count above already bounds the corpus, so the
    # broadcast-gather tier can score candidate pairs by id instead of
    # shipping both 64-float vectors per pair through Arrow.
    pairs = cosine_pairs_lsh(
        emb, "vec_id", "embedding", threshold=0.3, n_planes=32, bands=8, dim=64,
        max_band_freq=band_freq_cap(n, 32 // 8), n_rows=n,
    )
    return pairs.select(
        F.col("a_vec_id").alias("vec_a"),
        F.col("b_vec_id").alias("vec_b"),
        F.round("sim", 4).cast("double").alias("sim"),
    ).orderBy("vec_a", "vec_b")


# ---------------------------------------------------------------------------
# Q58 — IVF approximate k-NN join (scale path; KMeans coarse quantizer)
#        through the PERSISTED index: train + assign once per corpus
#        version, save to parquet, reload as a scan — the reference's
#        persistent vector collection (pipeline.py:51-56), where
#        re-indexing a 100 TB corpus per session is the dominant cost.
# ---------------------------------------------------------------------------


_INDEX_CACHE: dict[tuple[str, float], object] = {}


def _ivf_index_for(spark: SparkSession, sf_dir: str):
    """Load the persisted IVF index for ``sf_dir``, building + saving it
    on first use (a deployment runs the build alongside corpus ingest).

    Session-scoped READ-THROUGH cache over the parquet artifact: the
    load costs three driver round-trips (existence probe + meta +
    centroid collect, ~0.4 s), pure overhead when repeated per query in
    one session. The persisted store stays the source of truth — the
    cache key includes the meta file's mtime, so a store rebuilt in
    place (new corpus version) is picked up, unlike the round-4
    process-local centroid dict this replaces (which had no persistence
    underneath at all)."""
    import glob
    import os

    from ..operators.vector import build_ivf_index, load_ivf_index, save_ivf_index
    from ..sources.writers import target_exists

    path = os.path.join(
        "/tmp/spark_graft_io", os.path.basename(sf_dir.rstrip("/")), "q58_ivf_index"
    )
    if not target_exists(spark, path + "/meta"):
        emb = load_table(spark, sf_dir, "embeddings")
        save_ivf_index(build_ivf_index(emb, "vec_id", "embedding", n_lists=16), path)
    meta_files = glob.glob(path + "/meta/*.parquet")
    key = (path, max((os.path.getmtime(f) for f in meta_files), default=0.0))
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = load_ivf_index(spark, path)
    return _INDEX_CACHE[key]


# ---------------------------------------------------------------------------
# Q69 — PQ (product-quantization) two-stage k-NN: ADC over 8-byte codes
#        recalls a shortlist, exact cosine reranks it. The memory tier
#        of the ANN family (32x smaller inverted file than raw floats at
#        dim=64/m=8 — what fits executor memory at 100 TB). Approximate
#        by design: no SQL oracle; recall tracked in bench ("pq_recall")
#        and the full-rerank==exact invariant is pytest-pinned.
# ---------------------------------------------------------------------------

_PQ_CACHE: dict[tuple[str, float], list] = {}


def _pq_books_for(spark: SparkSession, sf_dir: str) -> list:
    """Persisted PQ codebooks for ``sf_dir`` (trained + saved on first
    use), with the same mtime-keyed session read-through cache as the
    IVF index — the parquet artifact is the source of truth."""
    import glob
    import os

    from ..operators.vector import load_pq_codebooks, save_pq_codebooks, train_pq_codebooks
    from ..sources.writers import target_exists

    path = os.path.join(
        "/tmp/spark_graft_io", os.path.basename(sf_dir.rstrip("/")), "q69_pq_codebooks"
    )
    if not target_exists(spark, path):
        emb = load_table(spark, sf_dir, "embeddings")
        save_pq_codebooks(spark, train_pq_codebooks(emb, "embedding", m_subvectors=8, n_codes=256), path)
    key = (path, max((os.path.getmtime(f) for f in glob.glob(path + "/*.parquet")), default=0.0))
    if key not in _PQ_CACHE:
        _PQ_CACHE[key] = load_pq_codebooks(spark, path)
    return _PQ_CACHE[key]


@query("q69_pq_knn", oracle=None, covers="V3,V2")
def q69_pq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vector import pq_encode, pq_knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    books = _pq_books_for(spark, sf_dir)
    codes = pq_encode(emb, "embedding", books)
    queries = emb.filter(F.col("vec_id") < 10)
    return pq_knn_join(
        codes, queries, "vec_id", "embedding", k=3, codebooks=books,
        rerank=30, corpus_vectors=emb,
    ).orderBy("query_id", "rank")


@query("q58_ivf_knn", oracle=None, covers="V3,V2", bench=True)
def q58_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vector import similarity_join

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # routed through the SURVEY §4.2 size-keyed planner: the cap of 0
    # forces the corpus-vs-corpus strategy (IVF probe), the plan this
    # query demonstrates — a small cap is how a deployment pins batch
    # jobs to the bounded-candidate route regardless of input size.
    # The index comes from parquet: KMeans and the corpus assignment
    # pass are skipped entirely on every call after the first.
    return similarity_join(
        emb, queries, "vec_id", "embedding", k=3, max_broadcast_queries=0,
        n_probe=4, index=_ivf_index_for(spark, sf_dir),
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# Q76 — SemDeDup-style semantic dedup (V4 paraphrase tier). The driver's
#        synthetic embeddings are isotropic (no true 0.95-cosine pairs),
#        so the query PLANTS one semantic duplicate per 50 vectors — a
#        deterministic 0.97/0.03 roll-mixture at id = -vec_id - 1
#        (cosine >= 0.999, same construction as the scaling curve) —
#        and dedups the union. Rows-only by design: the cluster
#        assignment is MLlib KMeans (not SQL-expressible); exactness of
#        the keep-set is pinned in tests/test_vector_ops.py instead
#        (each planted pair drops exactly one member, nothing else).
# ---------------------------------------------------------------------------


def _plant_semantic_dups(emb: DataFrame, every: int = 50, alpha: float = 0.97) -> DataFrame:
    rolled = F.expr(
        "concat(slice(embedding, 2, size(embedding) - 1), slice(embedding, 1, 1))"
    )
    mixed = F.zip_with(
        F.col("embedding"), rolled,
        lambda x, y: x * F.lit(alpha) + y * F.lit(1.0 - alpha),
    )
    planted = emb.filter(F.col("vec_id") % every == 0).select(
        (-F.col("vec_id") - 1).alias("vec_id"),
        mixed.cast("array<float>").alias("embedding"),
        "label",
    )
    return emb.unionByName(planted)


@query("q76_semantic_dedup", oracle=None, covers="V4,V3")
def q76_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vector import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = _plant_semantic_dups(emb)
    kept = semantic_dedup(corpus, "vec_id", "embedding", threshold=0.95, n_lists=8)
    return (
        kept.select(
            F.when(F.col("vec_id") < 0, "planted").otherwise("original").alias("origin")
        )
        .groupBy("origin")
        .agg(F.count("*").alias("n_kept"))
        .orderBy("origin")
    )


# ---------------------------------------------------------------------------
# R28 — cross-corpus SEMANTIC contamination (the paraphrase tier of
#        q67's exact-span scan): benchmark = every 41st embedding,
#        corpus = the rest plus one planted near-paraphrase per
#        benchmark item (the q76 roll-mixture, cosine >= 0.999 to its
#        source), so the scan must flag exactly the planted mass and
#        none of the isotropic background. Rows-only by design (MLlib
#        KMeans assignment); exactness of the flagged set vs the
#        brute-force tier is pinned in tests/test_vector_ops.py.
# ---------------------------------------------------------------------------


@query("r28_semantic_contamination", oracle=None, covers="V4,C6,J2")
def r28_semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vector import semantic_contamination

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 41 == 0)
    # plant a paraphrase of every benchmark item (negative id -src-1),
    # then drop the originals: the corpus holds the background plus the
    # planted leaks, never a verbatim benchmark row
    corpus = _plant_semantic_dups(emb, every=41).filter(
        (F.col("vec_id") % 41 != 0) | (F.col("vec_id") < 0)
    )
    flagged = semantic_contamination(
        corpus, bench, "vec_id", "embedding",
        threshold=0.95, n_lists=8, n_probe=3,
    )
    return (
        flagged.select(
            F.when(F.col("vec_id") < 0, "planted").otherwise("background").alias("origin")
        )
        .groupBy("origin")
        .agg(F.count("*").alias("n_flagged"))
        .orderBy("origin")
    )


# ---------------------------------------------------------------------------
# R35 — hard-negative mining for contrastive training: per anchor, the
#        nearest same-label positive + top-3 nearest different-label
#        negatives. The label split happens BEFORE ranking (top-k-then-
#        filter under-delivers negatives when same-label rows crowd the
#        neighborhood); determinism = (sim DESC, id ASC) + round(sim,4)
#        on both engines, the q36 contract.
# ---------------------------------------------------------------------------

_R35_SQL = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
     q AS (SELECT vec_id, label, v FROM e WHERE vec_id < 8),
     scored AS (
       SELECT q.vec_id AS anchor_id,
              CASE WHEN e.label = q.label THEN 'positive' ELSE 'negative' END AS role,
              e.vec_id, e.label,
              list_dot_product(e.v, q.v)
                / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))) AS rawsim
       FROM e CROSS JOIN q
       WHERE e.vec_id <> q.vec_id
     ),
     ranked AS (
       SELECT anchor_id, role, vec_id, label, rawsim,
              ROW_NUMBER() OVER (PARTITION BY anchor_id, role
                                 ORDER BY rawsim DESC, vec_id) AS rank
       FROM scored
     )
SELECT anchor_id, role, rank, vec_id, label,
       CAST(ROUND(rawsim, 4) AS DOUBLE) AS sim
FROM ranked
WHERE (role = 'positive' AND rank = 1) OR (role = 'negative' AND rank <= 3)
ORDER BY anchor_id, role, rank
"""


@query("r35_hard_negatives", oracle=_R35_SQL, covers="V3,O3,J9,A8")
def r35_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vector import hard_negative_mining

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 8)
    out = hard_negative_mining(emb, "vec_id", "embedding", "label", k_neg=3, queries=anchors)
    return out.select(
        "anchor_id", "role", "rank", "vec_id", "label",
        F.round("sim", 4).cast("double").alias("sim"),
    ).orderBy("anchor_id", "role", "rank")


# ---------------------------------------------------------------------------
# R37 — MMR diversified re-rank (Carbonell-Goldstein) over the query's
#        top-8 candidates: 3 unrolled selections at lam=0.7, each the
#        argmax of lam*sim - (1-lam)*max-sim-to-selected with the
#        (score DESC, id ASC) tie rule. The oracle replays the exact
#        selection sequence as an unrolled CTE (the PageRank pattern
#        for iterative algorithms); (1-lam) is spelled as the IEEE
#        value of the Spark side's 1.0-0.7 so the mixed scores are
#        bit-identical.
# ---------------------------------------------------------------------------

_R37_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
q AS (SELECT v FROM e WHERE vec_id = 0),
cand AS (
  SELECT e.vec_id, e.v,
         list_dot_product(e.v, q.v)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))) AS sim
  FROM e CROSS JOIN q WHERE e.vec_id <> 0
  ORDER BY sim DESC, e.vec_id LIMIT 8
),
s1 AS (SELECT vec_id, v, sim, 1 AS pos FROM cand ORDER BY sim DESC, vec_id LIMIT 1),
p2 AS (
  SELECT c.vec_id,
         MAX(list_dot_product(c.v, s.v)
               / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(s.v, s.v)))) AS pen
  FROM cand c, s1 s WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)
  GROUP BY c.vec_id
),
s2 AS (
  SELECT c.vec_id, c.v, c.sim, 2 AS pos
  FROM cand c JOIN p2 USING (vec_id)
  ORDER BY CAST(0.7 AS DOUBLE) * c.sim - CAST(0.30000000000000004 AS DOUBLE) * p2.pen DESC, c.vec_id
  LIMIT 1
),
sel2 AS (SELECT vec_id, v FROM s1 UNION ALL SELECT vec_id, v FROM s2),
p3 AS (
  SELECT c.vec_id,
         MAX(list_dot_product(c.v, s.v)
               / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(s.v, s.v)))) AS pen
  FROM cand c, sel2 s WHERE c.vec_id NOT IN (SELECT vec_id FROM sel2)
  GROUP BY c.vec_id
),
s3 AS (
  SELECT c.vec_id, c.v, c.sim, 3 AS pos
  FROM cand c JOIN p3 USING (vec_id)
  ORDER BY CAST(0.7 AS DOUBLE) * c.sim - CAST(0.30000000000000004 AS DOUBLE) * p3.pen DESC, c.vec_id
  LIMIT 1
)
SELECT pos, vec_id, CAST(ROUND(sim, 4) AS DOUBLE) AS sim FROM (
  SELECT pos, vec_id, sim FROM s1
  UNION ALL SELECT pos, vec_id, sim FROM s2
  UNION ALL SELECT pos, vec_id, sim FROM s3
) ORDER BY pos
"""


@query("r37_mmr_rerank", oracle=_R37_SQL, covers="V2,V5,O3,J9")
def r37_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vector import knn_join, mmr_select

    emb = load_table(spark, sf_dir, "embeddings")
    anchor = emb.filter(F.col("vec_id") == 0)
    cand = knn_join(emb, anchor, "vec_id", "embedding", k=8).select(
        "vec_id", "embedding", "sim"
    )
    out = mmr_select(cand, "vec_id", "embedding", "sim", 3, lam=0.7)
    return out.select(
        "pos", "vec_id", F.round("sim", 4).cast("double").alias("sim")
    ).orderBy("pos")


# ---------------------------------------------------------------------------
# Q18 (ex-r48, rotated into the driver window round 9) — SQ8
#        scalar-quantized k-NN: the oracle-able
#        compression tier. Per-dim min/max bounds -> int8 codes ->
#        midpoint dequantize in-plan -> cosine vs the full-precision
#        query (asymmetric ADC, the FAISS SQ8 pattern). Every step is
#        order-free min/max, floor-quantized doubles, or fixed-order
#        IEEE arithmetic, so unlike PQ (KMeans, rows-only) the WHOLE
#        quantized path is hash-checked vs DuckDB: bounds, codes,
#        reconstruction, scores, ranking. Recall + exact-rerank
#        contract pinned in tests/test_vector_ops.py.
# ---------------------------------------------------------------------------

_Q18_SQL_SQ8 = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
dims AS (SELECT unnest(range(1, 65)) AS i),
bounds AS (SELECT i, MIN(v[i]) AS lo, MAX(v[i]) AS hi FROM e CROSS JOIN dims GROUP BY i),
b AS (SELECT list(lo ORDER BY i) AS los, list(hi ORDER BY i) AS his FROM bounds),
codes AS (
  SELECT vec_id,
         list_transform(range(1, 65), i ->
           CASE WHEN his[i] > los[i]
                THEN LEAST(GREATEST(CAST(floor(((v[i] - los[i]) * 255.0) / (his[i] - los[i])) AS BIGINT), 0), 255)
                ELSE 0 END - 128) AS c
  FROM e CROSS JOIN b
),
recon AS (
  SELECT vec_id,
         list_transform(range(1, 65),
                        i -> los[i] + (((c[i] + 128) + 0.5) * (his[i] - los[i])) / 255.0) AS r
  FROM codes CROSS JOIN b
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, recon.vec_id AS neighbor_id,
         list_dot_product(recon.r, q.qv)
           / (sqrt(list_dot_product(recon.r, recon.r)) * sqrt(list_dot_product(q.qv, q.qv))) AS rawsim
  FROM recon CROSS JOIN q
  WHERE recon.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, CAST(ROUND(rawsim, 4) AS DOUBLE) AS sim, rank
FROM (SELECT query_id, neighbor_id, rawsim,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rawsim DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= 2
ORDER BY query_id, rank
"""


@query("q18_sq8_knn", oracle=_Q18_SQL_SQ8, covers="V3,V2,U2", bench=True)
def q18_sq8_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vector import sq8_knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # max_queries=None: vec_id < 10 bounds the query side statically —
    # same caller-proved-bound contract as q36 (saves the guard's
    # limit-probe action per invocation).
    top = sq8_knn_join(emb, queries, "vec_id", "embedding", k=2, dim=64, max_queries=None)
    return top.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round("sim", 4).cast("double").alias("sim"),
        "rank",
    ).orderBy("query_id", "rank")
