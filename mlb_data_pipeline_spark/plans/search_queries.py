"""Keyword + hybrid retrieval queries (q03/q74/q75) — the lexical
channel the reference's vector-only RAG stack
(scripts/rag_pipeline_2.py:40-48, airflow/dags/mlb_pipeline/
pipeline.py:51-56) is missing, plus the rank-fusion step that makes it
hybrid search.

The BM25 query was rotated INTO the driver's 50-entry correctness
window as q03 in round 6 (formerly q73); q74/q75 carry the same DuckDB
oracles under the bit-exact pytest harness — see operators/search.py
for the determinism contract (fixed-order IEEE scalar chains; the only
float accumulation is a term-sorted sequential fold mirrored by
list_reduce).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.embed import embed_column, fake_encode
from ..operators.relational import spread_for_cpu
from ..operators.search import (
    bm25_oracle_sql,
    bm25_topk,
    build_text_index,
    load_text_index,
    rrf_fuse,
    save_text_index,
)
from ..operators.vector import cosine_topk
from .registry import query

# ---------------------------------------------------------------------------
# Q03 (formerly q73, rotated into the driver window round 6) — BM25 keyword retrieval (top-10 per query over documents).
#        Queries are driver-side literals pre-tokenized to (qid, term),
#        vocabulary drawn from the synthetic corpus.
# ---------------------------------------------------------------------------

_Q03_QUERIES = [
    (0, "hash join sort merge"),
    (1, "vector scan filter big"),
    (2, "customer query window stream"),
]
_Q03_TERMS = [(qid, t) for qid, text in _Q03_QUERIES for t in text.split()]

_Q03_SQL = bm25_oracle_sql(_Q03_TERMS, k=10)


@query("q03_bm25_topk", oracle=_Q03_SQL, covers="V2,T17,A2,O3")
def q03_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _Q03_TERMS, k=10).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# Q74 — hybrid retrieval: BM25 (lexical) + embedding cosine (semantic)
#        top-20 rankings fused by reciprocal rank (k=60), top-10 out.
#        The vector channel is the q15 fake-encoder pipeline (sha256
#        mirrored in SQL bit-for-bit); the fusion is two fixed-order
#        reciprocal terms, so the fused score is engine-exact.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Q75 — BM25 through the PERSISTED inverted index: build + save + load
#        + probe, same queries and oracle as q03, so the round-trip is
#        itself hash-verified against DuckDB. The probe plan touches
#        postings parquet only — zero corpus scans at query time.
# ---------------------------------------------------------------------------


@query("q75_bm25_indexed", oracle=_Q03_SQL, covers="V2,T17,O3,S8")
def q75_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(
        "/tmp/spark_graft_io", os.path.basename(sf_dir.rstrip("/")), "q75_text_index"
    )
    docs = load_table(spark, sf_dir, "documents")
    save_text_index(build_text_index(docs), path)
    idx = load_text_index(spark, path)
    return bm25_topk(None, _Q03_TERMS, k=10, index=idx).orderBy("query_id", "rank")


_Q74_QUERY_TEXT = "hash join sort merge table scan"
_Q74_TERMS = [(0, t) for t in _Q74_QUERY_TEXT.split()]
_Q74_CHANNEL_K = 20
_Q74_RRF_K = 60.0

_Q74_BM25_SQL = bm25_oracle_sql(_Q74_TERMS, k=_Q74_CHANNEL_K)

_Q74_SQL = f"""
WITH bm AS (
  SELECT doc_id, rank FROM ({_Q74_BM25_SQL}) WHERE query_id = 0
),
qraw AS (
  SELECT list_transform(range(64), i ->
    CAST(CAST(('0x' || substr(sha256(CAST(i AS VARCHAR) || '|{_Q74_QUERY_TEXT}'), 1, 16)) AS UBIGINT) AS DOUBLE)
      / 9223372036854775808.0 - 1.0) AS raw
),
qvec AS (
  SELECT list_transform(raw, v -> v / sqrt(list_dot_product(raw, raw))) AS q FROM qraw
),
eraw AS (
  SELECT doc_id,
         list_transform(range(64), i ->
           CAST(CAST(('0x' || substr(sha256(CAST(i AS VARCHAR) || '|' || text), 1, 16)) AS UBIGINT) AS DOUBLE)
             / 9223372036854775808.0 - 1.0) AS raw
  FROM documents
),
emb AS (
  SELECT doc_id,
         CAST(list_transform(raw, v -> CAST(v / sqrt(list_dot_product(raw, raw)) AS FLOAT)) AS DOUBLE[]) AS e
  FROM eraw
),
vscored AS (
  SELECT doc_id,
         list_dot_product(q, e) / (sqrt(list_dot_product(q, q)) * sqrt(list_dot_product(e, e))) AS sim
  FROM emb, qvec
),
vr AS (
  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS INT) AS rank
  FROM vscored ORDER BY sim DESC, doc_id LIMIT {_Q74_CHANNEL_K}
),
fused AS (
  SELECT COALESCE(bm.doc_id, vr.doc_id) AS doc_id,
         bm.rank AS rank_1, vr.rank AS rank_2,
         COALESCE(1.0 / ({_Q74_RRF_K!r} + bm.rank), 0.0)
           + COALESCE(1.0 / ({_Q74_RRF_K!r} + vr.rank), 0.0) AS rrf_score
  FROM bm FULL OUTER JOIN vr ON bm.doc_id = vr.doc_id
)
SELECT * FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
"""


@query("q74_hybrid_rrf", oracle=_Q74_SQL, covers="V1,V2,U2,O2,J3")
def q74_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bm = (
        bm25_topk(docs, _Q74_TERMS, k=_Q74_CHANNEL_K)
        .filter(F.col("query_id") == 0)
        .select("doc_id", "rank")
    )
    store = embed_column(
        spread_for_cpu(docs.select("doc_id", "text")), "text"
    )
    topk = cosine_topk(
        store, fake_encode(_Q74_QUERY_TEXT), "doc_id", "embedding", _Q74_CHANNEL_K
    )
    # rank the k collected rows; the window spans exactly _Q74_CHANNEL_K
    # rows post-TakeOrderedAndProject, so the single-partition sort is
    # over a constant-size set, not the corpus
    vr = topk.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("sim").desc(), F.col("doc_id").asc()))
        .alias("rank"),
    )
    fused = rrf_fuse([bm, vr], ["doc_id"], k_rrf=_Q74_RRF_K)
    return fused.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc()).limit(10)


# ---------------------------------------------------------------------------
# Q89 — per-document tf-idf keywords: top-3 characteristic terms per doc
#        off the same postings as BM25 (sklearn smooth idf, quantized;
#        stopword-class terms with df > n/2 dropped — non-characteristic
#        AND the hot join keys). Limited to doc_id < 50 to keep the
#        oracle result bounded; the operator itself is corpus-wide.
# ---------------------------------------------------------------------------

_Q89_SQL = """
WITH base AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
),
tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM base),
tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2, 3),
stats AS (SELECT COUNT(*) AS n FROM base),
dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
),
scored AS (
  SELECT tf.doc_id, tf.term,
         (tf.tf / tf.dl)
           * (floor(ln((stats.n + 1.0) / (dfreq.df + 1.0)) * 1000000.0) / 1000000.0 + 1.0)
           AS score
  FROM tf JOIN dfreq USING (term), stats
  WHERE dfreq.df <= stats.n * 0.9
),
ranked AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, term) AS INT) AS rank,
         term, score
  FROM scored
)
SELECT doc_id, rank, term, score FROM ranked
WHERE rank <= 3 AND doc_id < 50
ORDER BY doc_id, rank
"""


@query("q89_tfidf_keywords", oracle=_Q89_SQL, covers="V2,T17,O3,A2")
def q89_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import tfidf_keywords

    docs = load_table(spark, sf_dir, "documents")
    kw = tfidf_keywords(docs, k=3, max_doc_frac=0.9)
    return kw.filter(F.col("doc_id") < 50).orderBy("doc_id", "rank")


# ---------------------------------------------------------------------------
# Q91 — unigram-LM quality scoring: per-doc mean log-likelihood under
#        the corpus's own unigram model (CCNet-style perplexity
#        filtering without an external model). Same postings as
#        BM25/tf-idf; ln quantized, term-ordered fold — the engine-
#        neutrality contract of the family.
# ---------------------------------------------------------------------------

_Q91_SQL = """
WITH base AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
),
tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM base),
tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2, 3),
lm AS (SELECT term, SUM(tf) AS ctf FROM tf GROUP BY 1),
tot AS (SELECT SUM(ctf) AS t_total, COUNT(*) AS v FROM lm),
per AS (
  SELECT tf.doc_id, tf.dl, tf.term,
         tf.tf * (floor(ln((lm.ctf + 0.5) / (tot.t_total + 0.5 * tot.v)) * 1000000.0) / 1000000.0) AS lp
  FROM tf JOIN lm USING (term), tot
)
SELECT doc_id, dl,
       list_reduce(list(lp ORDER BY term), (a, x) -> a + x) / dl AS logprob
FROM per GROUP BY doc_id, dl
ORDER BY doc_id
"""


@query("q91_unigram_logprob", oracle=_Q91_SQL, covers="T18,A2,V2")
def q91_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import unigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    return unigram_logprob(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Q97/Q98 — tf-idf keywords and unigram-LM scoring through the
#        PERSISTED inverted index (the q75 pattern): build + save +
#        load + score with the SAME oracles as q89/q91, so each store
#        round-trip is itself hash-verified. One saved index serves
#        BM25 retrieval, keyword tagging AND quality scoring — the
#        point of sharing the postings layout.
# ---------------------------------------------------------------------------


def _loaded_index(spark: SparkSession, sf_dir: str, name: str):
    import os

    from ..operators.search import build_text_index, load_text_index, save_text_index

    path = os.path.join(
        "/tmp/spark_graft_io", os.path.basename(sf_dir.rstrip("/")), name
    )
    docs = load_table(spark, sf_dir, "documents")
    save_text_index(build_text_index(docs), path)
    return load_text_index(spark, path)


@query("q97_tfidf_indexed", oracle=_Q89_SQL, covers="V2,T17,O3,S8")
def q97_tfidf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import tfidf_keywords

    idx = _loaded_index(spark, sf_dir, "q97_text_index")
    kw = tfidf_keywords(index=idx, k=3, max_doc_frac=0.9)
    return kw.filter(F.col("doc_id") < 50).orderBy("doc_id", "rank")


@query("q98_unigram_indexed", oracle=_Q91_SQL, covers="T18,A2,S8")
def q98_unigram_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import unigram_logprob

    idx = _loaded_index(spark, sf_dir, "q98_text_index")
    return unigram_logprob(index=idx).orderBy("doc_id")


# ---------------------------------------------------------------------------
# R30 — bigram-LM perplexity scoring (the conditional-order extension
#        of q91): p(b|a) add-alpha smoothed over bigram-derived context
#        counts, per-doc mean transition log-likelihood. Same
#        engine-neutral contract as the whole postings family.
# ---------------------------------------------------------------------------

_R30_SQL = """
WITH base AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
),
d AS (SELECT doc_id, toks, len(toks) AS dl FROM base WHERE len(toks) >= 2),
bgs AS (
  SELECT doc_id, dl,
         unnest(list_transform(range(2, dl + 1), i -> toks[i - 1] || ' ' || toks[i])) AS bg
  FROM d
),
tf AS (SELECT doc_id, dl, bg, COUNT(*) AS tf FROM bgs GROUP BY 1, 2, 3),
lm AS (SELECT bg, SUM(tf) AS cbg FROM tf GROUP BY 1),
ctx AS (SELECT split_part(bg, ' ', 1) AS a, SUM(cbg) AS cctx FROM lm GROUP BY 1),
voc AS (SELECT COUNT(DISTINCT t) AS v FROM (SELECT unnest(toks) AS t FROM base)),
per AS (
  SELECT tf.doc_id, tf.dl, tf.bg,
         tf.tf * (floor(ln((lm.cbg + 0.5) / (ctx.cctx + 0.5 * voc.v)) * 1000000.0) / 1000000.0) AS lp
  FROM tf JOIN lm USING (bg) JOIN ctx ON split_part(tf.bg, ' ', 1) = ctx.a, voc
)
SELECT doc_id, dl,
       list_reduce(list(lp ORDER BY bg), (a, x) -> a + x) / (dl - 1) AS logprob
FROM per GROUP BY doc_id, dl
ORDER BY doc_id
"""


@query("r30_bigram_logprob", oracle=_R30_SQL, covers="T18,A2,P9")
def r30_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import bigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    return bigram_logprob(docs).orderBy("doc_id")
