"""North-star LLM-data-pipeline queries: dedup family + text analysis.

These are the operators a 100 TB training-data pipeline runs over a
document corpus: language ID, quality scoring, token accounting,
content fingerprinting, and the near-duplicate family (MinHash-LSH,
SimHash, n-gram Jaccard). Reference analogue: the article corpus +
id-keyed dedup upsert (pipeline.py:24-77); everything beyond exact
dedup is the declared [gap, north star] surface of SURVEY §2.5/§2.6.

All hashing is md5-based (engine-neutral), so even the MinHash and
SimHash queries are fully DuckDB-oracled: the oracle mirrors the same
algorithm and must produce identical pairs. Ratios are single int/int
double divisions (bit-identical cross-engine, no rounding games).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.textfn import bpe_ish_token_count, token_count
from ..operators.dedup import jaccard, minhash_neardup_pairs, simhash_neardup_pairs, token_set
from ..operators.relational import ordered_small
from .registry import query

# ---------------------------------------------------------------------------
# Q40 — language-ID heuristic (T18): stopword-marker ratio
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
_STOP_SQL = "('the', 'a', 'and', 'of', 'to', 'in', 'is', 'it')"

_Q40_SQL = f"""
WITH m AS (
  SELECT lang,
         length(text) AS n_chars_txt,
         len(string_split(text, ' ')) AS n_tok,
         len(list_filter(string_split(text, ' '), w -> w IN {_STOP_SQL})) AS n_stop,
         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct
  FROM documents
)
SELECT lang,
       CASE WHEN CAST(n_stop AS DOUBLE) / n_tok >= 0.10 THEN 'en-like' ELSE 'other' END AS classified,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(n_stop) AS DOUBLE) / SUM(n_tok) AS stopword_ratio,
       CAST(SUM(n_punct) AS DOUBLE) / SUM(n_chars_txt) AS punct_ratio,
       CAST(SUM(n_chars_txt) AS DOUBLE) / SUM(n_tok) AS avg_token_len
FROM m
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("q40_text_profile", oracle=_Q40_SQL, covers="T18,T17,T8,A2")
def q40_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic + quality scoring in one per-doc metric pass:
    stopword-marker ratio classifies en-like/other; the same token/char/
    punct counts aggregate into the corpus-quality profile per (lang,
    classified). One scan, one shuffle, map-side partial aggs."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    m = docs.select(
        "lang",
        F.length("text").alias("n_chars_txt"),
        F.size(toks).alias("n_tok"),
        F.size(F.filter(toks, lambda w: w.isin(*_STOPWORDS))).alias("n_stop"),
        (F.length("text") - F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", ""))).alias("n_punct"),
    )
    classified = F.when(
        F.col("n_stop").cast("double") / F.col("n_tok") >= 0.10, F.lit("en-like")
    ).otherwise(F.lit("other"))
    return (
        m.withColumn("classified", classified)
        .groupBy("lang", "classified")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            (F.sum("n_stop").cast("double") / F.sum("n_tok")).alias("stopword_ratio"),
            (F.sum("n_punct").cast("double") / F.sum("n_chars_txt")).alias("punct_ratio"),
            (F.sum("n_chars_txt").cast("double") / F.sum("n_tok")).alias("avg_token_len"),
        )
        .orderBy("lang", "classified")
    )


# ---------------------------------------------------------------------------
# Q42 — token accounting (T17): whitespace + BPE-ish subword counts
# ---------------------------------------------------------------------------

_Q42_SQL = r"""
WITH m AS (
  SELECT source,
         len(string_split_regex(trim(text), '\s+')) AS n_tok,
         list_sum(list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                 w -> CAST(ceil(length(w) / 4.0) AS INT))) AS n_bpe,
         substr(md5(lower(regexp_replace(text, '\s+', ' ', 'g'))), 1, 8) AS fingerprint
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS avg_tokens_per_doc,
       COUNT(DISTINCT fingerprint) AS n_distinct_fp
FROM m
GROUP BY source
ORDER BY source
"""


@query("q42_token_stats", oracle=_Q42_SQL, covers="T17,T4,A2,A3,V4", bench=True)
def q42_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting (whitespace + BPE-ish subword counts) plus the
    md5 content fingerprint an exact-dup pass keys on — one metric pass
    per doc, one shuffle on source. countDistinct(fingerprint) is the
    corpus's exact-dup cardinality per source."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.substring(F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")).cast("binary")), 1, 8)
    m = docs.select(
        "source",
        token_count("text").alias("n_tok"),
        bpe_ish_token_count("text").alias("n_bpe"),
        fp.alias("fingerprint"),
    )
    return (
        m.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.sum("n_bpe").cast("bigint").alias("total_bpe_tokens"),
            (F.sum("n_tok").cast("double") / F.count("*")).alias("avg_tokens_per_doc"),
            F.countDistinct("fingerprint").alias("n_distinct_fp"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Q44 — MinHash-LSH near-duplicate pairs (banded candidates + exact verify)
# ---------------------------------------------------------------------------

_Q44_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                                i -> array_to_string(toks[i:i+2], ' ')))
              ELSE [] END AS shingles
  FROM d
),
g AS (
  SELECT doc_id,
         list_distinct(list_transform(shingles,
                                      s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT))) AS gs
  FROM sh
),
exploded AS (SELECT doc_id, unnest(gs) AS gv FROM g),
mh AS (
  SELECT e.doc_id, b.band,
         MIN(((e.gv >> 30) + b.band * (e.gv & 1073741823)) % 2147483647) AS m
  FROM exploded e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
  GROUP BY e.doc_id, b.band
),
capped AS (
  SELECT doc_id, band, m
  FROM (SELECT doc_id, band, m, COUNT(*) OVER (PARTITION BY band, m) AS kf FROM mh)
  WHERE kf <= 200
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM capped a JOIN capped b ON a.band = b.band AND a.m = b.m AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       CAST(len(list_intersect(ga.gs, gb.gs)) AS DOUBLE)
         / len(list_distinct(list_concat(ga.gs, gb.gs))) AS jacc
FROM cand c
JOIN g ga ON ga.doc_id = c.id_a
JOIN g gb ON gb.doc_id = c.id_b
WHERE CAST(len(list_intersect(ga.gs, gb.gs)) AS DOUBLE)
        / len(list_distinct(list_concat(ga.gs, gb.gs))) >= 0.3
ORDER BY id_a, id_b
"""


@query("q44_minhash_neardup", oracle=_Q44_SQL, covers="V4,T17,J1", bench=True)
def q44_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_band_freq=200: the boilerplate skew cap, wired as the default
    # (VERDICT r4 #6). Measured (band, mh) bucket maxima are 6 at sf0.01
    # and 20 at sf0.1, so the cap never bites at bench scales — and the
    # ORACLE MIRRORS IT (the `capped` CTE), so hash parity holds by
    # construction even on a corpus where it does bite.
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs(
        docs, "doc_id", "text", threshold=0.3, n_hashes=4, shingle_n=3, max_band_freq=200
    )
    return ordered_small(pairs, "id_a", "id_b")


# ---------------------------------------------------------------------------
# Q45 — n-gram (token-set) Jaccard near-dups, blocked by source
# ---------------------------------------------------------------------------

_Q45_SQL = """
WITH d AS (SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS toks FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         / len(list_distinct(list_concat(a.toks, b.toks))) AS jacc
FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9
ORDER BY id_a, id_b
"""


@query("r63_ngram_jaccard", oracle=_Q45_SQL, covers="V4,J6,T17")
def r63_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Blocked all-pairs: the join key (source) bounds each block, so the
    # pair count is sum of block^2, not corpus^2 — the classic
    # domain-blocked near-dup pass.
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", "source", token_set("text").alias("toks"))
    a = d.select(F.col("doc_id").alias("id_a"), F.col("source").alias("src"), F.col("toks").alias("toks_a"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("source").alias("src"), F.col("toks").alias("toks_b"))
    # size-ratio pre-filter: J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so
    # J >= 0.9 requires the distinct-token counts to be within 10% of
    # each other. One int comparison kills most block pairs before the
    # O(|A|+|B|) set intersection runs — exact-preserving, so the
    # DuckDB oracle (which computes plain Jaccard) is unaffected.
    sz_a, sz_b = F.size("toks_a"), F.size("toks_b")
    pairs = (
        a.join(b, "src")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter((sz_a * 10 >= sz_b * 9) & (sz_b * 10 >= sz_a * 9))
        .withColumn("jacc", jaccard(F.col("toks_a"), F.col("toks_b")))
        .filter(F.col("jacc") >= 0.9)
        .select("id_a", "id_b", "jacc")
    )
    return ordered_small(pairs, "id_a", "id_b")


# ---------------------------------------------------------------------------
# R67 (ex-q46, displaced from the driver window round 11 by the
# rotated-in incremental OPTIMIZE; V4 keeps rich in-window carriers:
# q44 MinHash, q16 Jaccard, q09 fuzzy, q30/q31/q06/q01) — SimHash
# near-dups (16-bit signatures, hamming <= 3, Jaccard verify)
# ---------------------------------------------------------------------------

_R67_SQL = """
WITH d AS (SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS toks FROM documents),
tv AS (
  SELECT doc_id, source, toks,
         list_transform(toks, t -> CAST(('0x' || substr(md5(t), 1, 4)) AS INTEGER)) AS tvals
  FROM d
),
sig AS (
  SELECT doc_id, source, toks,
         (CASE WHEN list_sum(list_transform(tvals, v -> ((v >> 0) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END * 1
        + CASE WHEN list_sum(list_transform(tvals, v -> ((v >> 1) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END * 2
        + CASE WHEN list_sum(list_transform(tvals, v -> ((v >> 2) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END * 4
        + CASE WHEN list_sum(list_transform(tvals, v -> ((v >> 3) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END * 8
        + CASE WHEN list_sum(list_transform(tvals, v -> ((v >> 4) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END * 16
        + CASE WHEN list_sum(list_transform(tvals, v -> ((v >> 5) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END * 32
        + CASE WHEN list_sum(list_transform(tvals, v -> ((v >> 6) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END * 64
        + CASE WHEN list_sum(list_transform(tvals, v -> ((v >> 7) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END * 128
        + CASE WHEN list_sum(list_transform(tvals, v -> ((v >> 8) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END * 256
        + CASE WHEN list_sum(list_transform(tvals, v -> ((v >> 9) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END * 512
        + CASE WHEN list_sum(list_transform(tvals, v -> ((v >> 10) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END * 1024
        + CASE WHEN list_sum(list_transform(tvals, v -> ((v >> 11) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END * 2048
        + CASE WHEN list_sum(list_transform(tvals, v -> ((v >> 12) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END * 4096
        + CASE WHEN list_sum(list_transform(tvals, v -> ((v >> 13) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END * 8192
        + CASE WHEN list_sum(list_transform(tvals, v -> ((v >> 14) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END * 16384
        + CASE WHEN list_sum(list_transform(tvals, v -> ((v >> 15) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END * 32768
         ) AS sim
  FROM tv
),
-- banded candidate generation mirroring the Spark side (pigeonhole:
-- hamming <= 3 over 16 bits forces >= 1 exact 4-bit band match), so
-- the pair join is an equi-join on (source, band, value) instead of a
-- blocked quadratic product — exactness-preserving, and it cuts the
-- sf1 oracle wall ~10x (the at-scale parity runs pay this query)
keyed AS (
  SELECT doc_id, source, sim, band_i,
         (sim >> (4 * band_i)) & 15 AS band_v
  FROM sig, unnest([0, 1, 2, 3]) AS t(band_i)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM keyed a JOIN keyed b
    ON a.source = b.source AND a.band_i = b.band_i AND a.band_v = b.band_v
   AND a.doc_id < b.doc_id
  WHERE bit_count(CAST(xor(a.sim, b.sim) AS BIGINT)) <= 3
)
SELECT c.id_a, c.id_b,
       CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)
         / len(list_distinct(list_concat(ta.toks, tb.toks))) AS jacc
FROM cand c JOIN sig ta ON ta.doc_id = c.id_a JOIN sig tb ON tb.doc_id = c.id_b
WHERE CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)
        / len(list_distinct(list_concat(ta.toks, tb.toks))) >= 0.3
ORDER BY id_a, id_b
"""


@query("r67_simhash_neardup", oracle=_R67_SQL, covers="V4,T17")
def r67_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_neardup_pairs(docs, "doc_id", "text", "source", max_hamming=3, threshold=0.3)
    return ordered_small(pairs, "id_a", "id_b")


# ---------------------------------------------------------------------------
# Q59 — near-dup clustering end-to-end: MinHash pairs -> connected
#        components -> canonical corpus (rows-only: iterative CC is not
#        single-query SQL; the CC operator is pytest-verified on crafted
#        chains in tests/test_dedup_ops.py)
# ---------------------------------------------------------------------------


@query("q59_neardup_cluster_dedup", oracle=None, covers="V4,J1", bench=True)
def q59_neardup_cluster_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import neardup_dedup

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs(docs, "doc_id", "text", threshold=0.3, n_hashes=4, shingle_n=3)
    kept = neardup_dedup(docs, pairs.select("id_a", "id_b"), "doc_id")
    return ordered_small(kept.groupBy("source").agg(F.count("*").alias("n_kept")), "source")


# ---------------------------------------------------------------------------
# Q64 — incremental delta-vs-corpus near-dup (signature store): band ONLY
#        the daily delta, equi-join against the persisted corpus
#        signatures. Oracled (outside the driver's 50-window, like
#        q60-q63): MinHash is deterministic md5 arithmetic, so the
#        incremental pairs equal the batch pairs restricted to pairs
#        touching the delta — which IS single-query SQL.
# ---------------------------------------------------------------------------

_Q01_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                                i -> array_to_string(toks[i:i+2], ' ')))
              ELSE [] END AS shingles
  FROM d
),
g AS (
  SELECT doc_id,
         list_distinct(list_transform(shingles,
                                      s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT))) AS gs
  FROM sh
),
exploded AS (SELECT doc_id, unnest(gs) AS gv FROM g),
mh AS (
  SELECT e.doc_id, b.band,
         MIN(((e.gv >> 30) + b.band * (e.gv & 1073741823)) % 2147483647) AS m
  FROM exploded e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
  GROUP BY e.doc_id, b.band
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM mh a JOIN mh b ON a.band = b.band AND a.m = b.m AND a.doc_id < b.doc_id
  WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0
)
SELECT c.id_a, c.id_b,
       CAST(len(list_intersect(ga.gs, gb.gs)) AS DOUBLE)
         / len(list_distinct(list_concat(ga.gs, gb.gs))) AS jacc
FROM cand c
JOIN g ga ON ga.doc_id = c.id_a
JOIN g gb ON gb.doc_id = c.id_b
WHERE CAST(len(list_intersect(ga.gs, gb.gs)) AS DOUBLE)
        / len(list_distinct(list_concat(ga.gs, gb.gs))) >= 0.3
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# Q65 — connected components over the near-dup pair graph, ORACLED: the
#        iterative min-label operator was rows-only through round 4
#        ("iterative CC is not single-query SQL") — but it IS expressible
#        as a DuckDB recursive CTE (reach-set min), so the clustering
#        semantics themselves now carry hash-grade verification. The
#        Spark side stays the scalable iterative-join operator; only the
#        oracle uses recursion (fine at sf0.01, quadratic-ish in
#        component size — exactly why it is the oracle, not the engine).
# ---------------------------------------------------------------------------

_Q65_SQL = """
WITH RECURSIVE
d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                                i -> array_to_string(toks[i:i+2], ' ')))
              ELSE [] END AS shingles
  FROM d
),
g AS (
  SELECT doc_id,
         list_distinct(list_transform(shingles,
                                      s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT))) AS gs
  FROM sh
),
mh AS (
  SELECT e.doc_id, b.band,
         MIN(((e.gv >> 30) + b.band * (e.gv & 1073741823)) % 2147483647) AS m
  FROM (SELECT doc_id, unnest(gs) AS gv FROM g) e
  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
  GROUP BY e.doc_id, b.band
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM mh a JOIN mh b ON a.band = b.band AND a.m = b.m AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN g ga ON ga.doc_id = c.id_a
  JOIN g gb ON gb.doc_id = c.id_b
  WHERE CAST(len(list_intersect(ga.gs, gb.gs)) AS DOUBLE)
          / len(list_distinct(list_concat(ga.gs, gb.gs))) >= 0.3
),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, rr.r FROM edges e JOIN reach rr ON rr.id = e.dst
)
SELECT id, MIN(r) AS component FROM reach GROUP BY id ORDER BY id
"""


@query("q65_neardup_components", oracle=_Q65_SQL, covers="V4,J1")
def q65_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clustering step of q59 in isolation, hash-verified: MinHash
    near-dup pairs -> min-label connected components -> (id, component).
    The oracle computes the same fixpoint as a recursive reach-set CTE."""
    from ..operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs(docs, "doc_id", "text", threshold=0.3, n_hashes=4, shingle_n=3)
    comp = connected_components(pairs.select("id_a", "id_b"))
    return ordered_small(comp, "id")


# ---------------------------------------------------------------------------
# Q66 — exact cross-document span duplication (verbatim 8-token overlap):
#        the "long exact substring" duplication class — low-Jaccard
#        quoting relationships that MinHash misses. One equi-join on the
#        span hash; hash equality IS span equality (60-bit md5), so no
#        verify stage exists to get wrong.
# ---------------------------------------------------------------------------

_Q66_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 8
              THEN list_distinct(list_transform(range(1, len(toks) - 6),
                                                i -> array_to_string(toks[i:i+7], ' ')))
              ELSE [] END AS spans
  FROM d
),
g AS (
  SELECT doc_id,
         list_distinct(list_transform(spans,
                                      s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT))) AS hs
  FROM sh
),
e AS (SELECT doc_id, unnest(hs) AS h FROM g)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared_spans
FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY id_a, id_b
"""


@query("q66_exact_span_overlap", oracle=_Q66_SQL, covers="V4,T17")
def q66_exact_span_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import exact_span_overlap_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = exact_span_overlap_pairs(docs, "doc_id", "text", span_tokens=8)
    return ordered_small(pairs, "id_a", "id_b")


# ---------------------------------------------------------------------------
# Q67 — benchmark-contamination scan: corpus docs sharing a verbatim
#        8-token span with a held-out "benchmark" slice (doc_id % 7 == 0
#        stands in for the eval set). The train-test-overlap check a
#        pretraining pipeline runs before any data release.
# ---------------------------------------------------------------------------

_Q67_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 8
              THEN list_distinct(list_transform(range(1, len(toks) - 6),
                                                i -> array_to_string(toks[i:i+7], ' ')))
              ELSE [] END AS spans
  FROM d
),
g AS (
  SELECT doc_id,
         list_distinct(list_transform(spans,
                                      s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT))) AS hs
  FROM sh
),
e AS (SELECT doc_id, unnest(hs) AS h FROM g)
SELECT c.doc_id AS corpus_id, b.doc_id AS bench_id, COUNT(*) AS n_shared_spans
FROM (SELECT * FROM e WHERE doc_id % 7 <> 0) c
JOIN (SELECT * FROM e WHERE doc_id % 7 = 0) b ON c.h = b.h
GROUP BY 1, 2
ORDER BY corpus_id, bench_id
"""


@query("q67_contamination_scan", oracle=_Q67_SQL, covers="V4,T17")
def q67_contamination_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import cross_corpus_span_overlap

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    pairs = cross_corpus_span_overlap(corpus, bench, "doc_id", "text", span_tokens=8)
    return ordered_small(pairs, "corpus_id", "bench_id")


# ---------------------------------------------------------------------------
# Q85 — contamination scan through the PERSISTED benchmark span store
#        (round 6, §2.11 family): build + save the eval suite's span
#        hashes, then probe the corpus delta against the STORE SCAN —
#        the daily decontamination shape (O(delta), the eval suite is
#        never re-hashed). Same oracle as q67, so the store round-trip
#        is itself hash-verified.
# ---------------------------------------------------------------------------


@query("q85_contamination_store", oracle=_Q67_SQL, covers="V4,T17,S8")
def q85_contamination_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..operators.dedup import build_span_store, probe_span_store

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    store = os.path.join(
        "/tmp/spark_graft_io", os.path.basename(sf_dir.rstrip("/")), "q85_span_store"
    )
    build_span_store(bench, "doc_id", "text", store, span_tokens=8)
    pairs = probe_span_store(corpus, store, "doc_id", "text")
    return ordered_small(pairs, "corpus_id", "bench_id")


@query("q01_incremental_neardup", oracle=_Q01_SQL, covers="V4,S11,J1")
def q01_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-cadence near-dup (formerly q64, rotated into the driver
    window round 6): corpus = doc_id % 5 != 0 is pre-banded
    into a parquet signature store (the one-time cost); the delta
    (doc_id % 5 == 0) is banded fresh and joined against the STORE SCAN.
    Reference analogue: daily schedule (mlb_pipeline_dag.py:39) + keyed
    delete-then-add (scrape_store_embed.py:79)."""
    import os

    from ..operators.dedup import build_signature_store, incremental_neardup_pairs

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    store = os.path.join("/tmp/spark_graft_io", os.path.basename(sf_dir.rstrip("/")), "q01_sig_store")
    build_signature_store(corpus, "doc_id", "text", store, n_hashes=4, shingle_n=3)
    pairs = incremental_neardup_pairs(delta, store, "doc_id", "text", threshold=0.3)
    return ordered_small(pairs, "id_a", "id_b")


# ---------------------------------------------------------------------------
# Q86 — winnowing-fingerprint overlap (MOSS, SIGMOD'03): the guaranteed
#        >= (w+k-1)-token verbatim-overlap detector at ~(w+1)/2x less
#        join traffic than the full span join (q66). k=4, w=5 -> same
#        8-token guarantee as q66's span_tokens=8, ~3x fewer exploded
#        rows. Reference analogue: the scrape->store dedup intent of
#        scrape_store_embed.py, re-expressed as a sublinear fingerprint.
# ---------------------------------------------------------------------------

_Q31_SQL_WINNOW = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 4
              THEN list_transform(range(1, len(toks) - 2),
                                  i -> CAST(('0x' || substr(md5(array_to_string(toks[i:i+3], ' ')), 1, 15)) AS BIGINT))
              ELSE CAST([] AS BIGINT[]) END AS hs
  FROM d
),
fp AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(hs) - 4, 1) + 1),
                                      i -> list_min(hs[i:i+4]))) AS fps
  FROM g WHERE len(hs) >= 1
),
e AS (SELECT doc_id, unnest(fps) AS h FROM fp)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared_fps
FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY id_a, id_b
"""


@query("q31_winnow_overlap", oracle=_Q31_SQL_WINNOW, covers="V4,T17")
def q31_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import winnow_fingerprint_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = winnow_fingerprint_pairs(docs, "doc_id", "text", k=4, w=5)
    return ordered_small(pairs, "id_a", "id_b")


# ---------------------------------------------------------------------------
# Q87 — fuzzy title dedup (edit-distance similarity join): q-gram
#        blocking (Gravano et al., VLDB'01) + thresholded levenshtein
#        verify. The entity-dedup tier below token near-dup: a typo'd
#        title shares all-but-one shingle, but a catalog dedup wants
#        the exact edit distance under a tight bound. The oracle
#        mirrors the gram blocking (same candidates, same verify) as
#        q44 mirrors its hot-band cap.
# ---------------------------------------------------------------------------

_Q09_SQL_FUZZY = """
WITH t AS (
  SELECT doc_id, array_to_string((string_split(text, ' '))[1:6], ' ') AS title
  FROM documents
),
g AS (
  SELECT doc_id, title,
         unnest(list_distinct(list_transform(range(1, len(title) - 1),
                                             i -> title[i:i+2]))) AS gram
  FROM t
),
c AS (
  SELECT DISTINCT a.doc_id AS id_a, a.title AS title_a,
                  b.doc_id AS id_b, b.title AS title_b
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
),
fuzzy AS (
  SELECT id_a, id_b, CAST(levenshtein(title_a, title_b) AS BIGINT) AS edit_dist
  FROM c
  WHERE abs(len(title_a) - len(title_b)) <= 10
    AND levenshtein(title_a, title_b) <= 10
),
keyed AS (
  SELECT doc_id, source,
         array_to_string(string_split(text, ' ')[1:3], ' ') AS dedup_key
  FROM documents
),
kept AS (
  SELECT doc_id, source
  FROM (SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY dedup_key ORDER BY doc_id) AS rn
        FROM keyed)
  WHERE rn = 1
)
SELECT 'fuzzy' AS part, CAST(id_a AS VARCHAR) AS a, CAST(id_b AS VARCHAR) AS b, edit_dist AS n
FROM fuzzy
UNION ALL
SELECT 'exact_norm', source, CAST(NULL AS VARCHAR), COUNT(*)
FROM kept GROUP BY source
ORDER BY part, a, b
"""


@query("q09_fuzzy_title_dedup", oracle=_Q09_SQL_FUZZY, covers="V4,T2,J1,A2")
def q09_fuzzy_title_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup family, tagged union (round 9: the exact normalized-key
    dedup merged in — freeing the q30 slot for the chunk-level
    boilerplate removal):
    * 'fuzzy' branch — edit-distance title dedup via q-gram blocking;
    * 'exact_norm' branch — canonical-row-per-normalized-key counts
      (min doc_id wins, never dropDuplicates' arbitrary row)."""
    from ..operators.dedup import fuzzy_pairs
    from .vector_queries import dedup_normalized

    docs = load_table(spark, sf_dir, "documents")
    titles = docs.select(
        "doc_id", F.array_join(F.slice(F.split("text", " "), 1, 6), " ").alias("title")
    )
    pairs = fuzzy_pairs(titles, "doc_id", "title", max_dist=10, q=3)
    fuzzy = pairs.select(
        F.lit("fuzzy").alias("part"),
        F.col("id_a").cast("string").alias("a"),
        F.col("id_b").cast("string").alias("b"),
        F.col("edit_dist").cast("long").alias("n"),
    )
    exact = dedup_normalized(spark, sf_dir).select(
        F.lit("exact_norm").alias("part"),
        F.col("source").alias("a"),
        F.lit(None).cast("string").alias("b"),
        F.col("n_docs").alias("n"),
    )
    return fuzzy.unionByName(exact).orderBy("part", "a", "b")


# ---------------------------------------------------------------------------
# Q90 — contamination scan through a WINNOWED span store (k=8, w=4):
#        the eval suite persists winnowing fingerprints instead of the
#        full span explode — ~2.5x smaller store and probe for an
#        11-token verbatim guarantee (leakage worth acting on is
#        paragraphs, not one 8-token collision). Same store/probe
#        machinery as q85, selection mirrored gram-for-gram in DuckDB.
# ---------------------------------------------------------------------------

_Q90_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 8
              THEN list_transform(range(1, len(toks) - 6),
                                  i -> CAST(('0x' || substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 15)) AS BIGINT))
              ELSE CAST([] AS BIGINT[]) END AS hs
  FROM d
),
fp AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
                                      i -> list_min(hs[i:i+3]))) AS fps
  FROM g WHERE len(hs) >= 1
),
e AS (SELECT doc_id, unnest(fps) AS h FROM fp)
SELECT c.doc_id AS corpus_id, b.doc_id AS bench_id, COUNT(*) AS n_shared_spans
FROM (SELECT * FROM e WHERE doc_id % 7 <> 0) c
JOIN (SELECT * FROM e WHERE doc_id % 7 = 0) b ON c.h = b.h
GROUP BY 1, 2
ORDER BY corpus_id, bench_id
"""


@query("q90_winnow_contamination_store", oracle=_Q90_SQL, covers="V4,T17,S8")
def q90_winnow_contamination_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..operators.dedup import build_span_store, probe_span_store

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    store = os.path.join(
        "/tmp/spark_graft_io", os.path.basename(sf_dir.rstrip("/")), "q90_winnow_store"
    )
    build_span_store(bench, "doc_id", "text", store, span_tokens=8, winnow_w=4)
    pairs = probe_span_store(corpus, store, "doc_id", "text")
    return ordered_small(pairs, "corpus_id", "bench_id")


# ---------------------------------------------------------------------------
# Q92 — duplicate-span REMOVAL (ExactSubstr at fixed width): rewrite
#        every doc with all-but-first occurrences of duplicated 8-token
#        spans removed — the transform sibling of q66's pair report.
#        First occurrence = global (doc, offset) lexicographic min via
#        one BIGINT encoding; coverage + rebuild are list expressions
#        mirrored exactly in DuckDB.
# ---------------------------------------------------------------------------

_Q06_SQL_SPANS = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) >= 8
              THEN list_transform(range(1, len(toks) - 6),
                                  i -> CAST(('0x' || substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 15)) AS BIGINT))
              ELSE CAST([] AS BIGINT[]) END AS hs
  FROM d
),
occ AS (
  SELECT doc_id, i - 1 AS pos, hs[i] AS h,
         doc_id * 1048576 + (i - 1) AS enc
  FROM g, LATERAL (SELECT unnest(range(1, len(hs) + 1)) AS i)
),
fst AS (SELECT h, min(enc) AS fenc FROM occ GROUP BY 1),
dups AS (
  SELECT o.doc_id, list(o.pos) AS dps
  FROM occ o JOIN fst f ON o.h = f.h AND o.enc <> f.fenc
  GROUP BY 1
),
rebuilt AS (
  SELECT d.doc_id, d.toks,
         list_filter(
           list_transform(range(1, len(d.toks) + 1),
             j -> CASE WHEN len(list_filter(COALESCE(dp.dps, CAST([] AS BIGINT[])),
                                            s -> s <= j - 1 AND j - 1 <= s + 7)) > 0
                  THEN NULL ELSE d.toks[j] END),
           x -> x IS NOT NULL) AS kept
  FROM d LEFT JOIN dups dp USING (doc_id)
)
SELECT doc_id,
       COALESCE(array_to_string(kept, ' '), '') AS clean_text,  -- DuckDB: empty-list -> NULL; Spark array_join -> ''
       CAST(len(toks) - len(kept) AS BIGINT) AS n_removed_tokens
FROM rebuilt
ORDER BY doc_id
"""


@query("q06_remove_duplicate_spans", oracle=_Q06_SQL_SPANS, covers="V4,T17,P9")
def q06_remove_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import remove_duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    out = remove_duplicate_spans(docs, "doc_id", "text", span_tokens=8)
    return out.orderBy("doc_id")


# ---------------------------------------------------------------------------
# R05 — near-dup dedup with a keep-BEST policy: same MinHash pair graph
#        and reach-set components as q65, but the survivor per cluster
#        is the LONGEST document (n_chars desc, id tiebreak) instead of
#        the minimum id — the curation rule "keep the fullest copy".
#        Singletons pass through untouched.
# ---------------------------------------------------------------------------

_R05_SQL = """
WITH RECURSIVE
d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                                i -> array_to_string(toks[i:i+2], ' ')))
              ELSE [] END AS shingles
  FROM d
),
g AS (
  SELECT doc_id,
         list_distinct(list_transform(shingles,
                                      s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT))) AS gs
  FROM sh
),
mh AS (
  SELECT e.doc_id, b.band,
         MIN(((e.gv >> 30) + b.band * (e.gv & 1073741823)) % 2147483647) AS m
  FROM (SELECT doc_id, unnest(gs) AS gv FROM g) e
  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
  GROUP BY e.doc_id, b.band
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM mh a JOIN mh b ON a.band = b.band AND a.m = b.m AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN g ga ON ga.doc_id = c.id_a
  JOIN g gb ON gb.doc_id = c.id_b
  WHERE CAST(len(list_intersect(ga.gs, gb.gs)) AS DOUBLE)
          / len(list_distinct(list_concat(ga.gs, gb.gs))) >= 0.3
),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, rr.r FROM edges e JOIN reach rr ON rr.id = e.dst
),
comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
m AS (
  SELECT dd.doc_id, dd.source, dd.n_chars, c.component
  FROM documents dd LEFT JOIN comp c ON dd.doc_id = c.id
),
ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY component ORDER BY n_chars DESC, doc_id) AS rn
  FROM m WHERE component IS NOT NULL
)
SELECT doc_id, source, n_chars FROM m WHERE component IS NULL
UNION ALL
SELECT doc_id, source, n_chars FROM ranked WHERE rn = 1
ORDER BY doc_id
"""


@query("r05_neardup_keep_best", oracle=_R05_SQL, covers="V4,J1,O3")
def r05_neardup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q65's pair graph + components, with the keep policy inverted to
    best-copy-wins: ``neardup_dedup_keep_best`` ordered by n_chars
    descending. Exercises the policy window AND the singleton
    pass-through against the full recursive-CTE oracle."""
    from ..operators.dedup import neardup_dedup_keep_best

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs(docs, "doc_id", "text", threshold=0.3, n_hashes=4, shingle_n=3)
    kept = neardup_dedup_keep_best(
        docs, pairs.select("id_a", "id_b"), "doc_id", [F.col("n_chars").desc()]
    )
    return ordered_small(kept.select("doc_id", "source", "n_chars"), "doc_id")


# ---------------------------------------------------------------------------
# Q16 (ex-r38, rotated into the driver window round 9) — EXACT Jaccard similarity join via prefix filtering (SSJoin/
#        PPJoin): every src0 pair at >= 80% token-set Jaccard —
#        lossless, the guarantee tier between hash-identical dedup and
#        the recall-bounded MinHash/SimHash family. The Spark side
#        joins only on rarest-first PREFIX tokens (candidates bounded
#        by rare-token co-occurrence, no global sort); the oracle is
#        the NAIVE all-pairs within the source block — prefix
#        filtering must change cost, never results. Verification is
#        integer cross-multiplication on both engines.
# ---------------------------------------------------------------------------

_Q16_SQL_JACCARD = """
WITH s AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS st
  FROM documents WHERE source = 'src0'
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.st, b.st)) AS overlap,
         len(a.st) AS size_a, len(b.st) AS size_b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, overlap, size_a, size_b
FROM p
WHERE 100 * overlap >= 80 * (size_a + size_b - overlap)
ORDER BY id_a, id_b
"""


@query("q16_jaccard_prefix_join", oracle=_Q16_SQL_JACCARD, covers="V4,J1,A2,T17")
def q16_jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import jaccard_prefix_join

    docs = load_table(spark, sf_dir, "documents").filter(F.col("source") == "src0")
    return jaccard_prefix_join(docs, "doc_id", "text", 80).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# R40 — EXACT containment join (asymmetric): every ordered src0 pair
#        where >= 90% of a's token vocabulary sits inside b — the
#        quote/subset duplication tier Jaccard cannot see (a paragraph
#        wholly quoted in a long article has tiny Jaccard but
#        containment 1.0). Spark candidates = a's rarest-first prefix
#        tokens against the full posting list; the oracle is naive
#        ordered all-pairs — prefix filtering changes cost, never
#        results.
# ---------------------------------------------------------------------------

_R40_SQL = """
WITH s AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS st
  FROM documents WHERE source = 'src0'
),
p AS (
  SELECT a.doc_id AS id_sub, b.doc_id AS id_super,
         len(list_intersect(a.st, b.st)) AS overlap,
         len(a.st) AS size_sub, len(b.st) AS size_super
  FROM s a JOIN s b ON a.doc_id <> b.doc_id
)
SELECT id_sub, id_super, overlap, size_sub, size_super
FROM p
WHERE 100 * overlap >= 90 * size_sub
ORDER BY id_sub, id_super
"""


@query("r40_containment_join", oracle=_R40_SQL, covers="V4,J1,A2,T17")
def r40_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import containment_prefix_join

    docs = load_table(spark, sf_dir, "documents").filter(F.col("source") == "src0")
    return containment_prefix_join(docs, "doc_id", "text", 90).orderBy(
        "id_sub", "id_super"
    )


# ---------------------------------------------------------------------------
# Q20 (ex-r41, rotated into the driver window round 9) — incremental EXACT near-dup vs the persisted prefix store: the
#        delta (src0 docs with id >= 300) pairs against yesterday's
#        corpus (src0 docs with id < 300) at >= 80% Jaccard, plus
#        within-delta pairs — all LOSSLESS, through the store's prefix
#        postings (the corpus is never re-tokenized; both sides order
#        under the store's pinned df snapshot, which is all the
#        prefix-intersection theorem needs). Oracle: naive all-pairs
#        over the union RESTRICTED to delta-involving pairs — the q64
#        incremental-mirror pattern for the exact tier.
# ---------------------------------------------------------------------------

_Q20_SQL_INC = """
WITH s AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS st
  FROM documents WHERE source = 'src0'
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.st, b.st)) AS overlap,
         len(a.st) AS size_a, len(b.st) AS size_b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE a.doc_id >= 300 OR b.doc_id >= 300
)
SELECT id_a, id_b, overlap, size_a, size_b
FROM p
WHERE 100 * overlap >= 80 * (size_a + size_b - overlap)
ORDER BY id_a, id_b
"""


@query("q20_incremental_jaccard", oracle=_Q20_SQL_INC, covers="V4,J1,A2,I2")
def q20_incremental_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..operators.dedup import build_jaccard_store, incremental_jaccard_pairs

    path = os.path.join(
        "/tmp/spark_graft_io", os.path.basename(sf_dir.rstrip("/")), "q20_jstore"
    )
    docs = load_table(spark, sf_dir, "documents").filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("doc_id") < 300)
    delta = docs.filter(F.col("doc_id") >= 300)
    build_jaccard_store(corpus, "doc_id", "text", path, 80)
    return incremental_jaccard_pairs(delta, path, "doc_id", "text").orderBy(
        "id_a", "id_b"
    )
