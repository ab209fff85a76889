"""Training-data curation queries (q60-q63) — north-star surface beyond
the reference's inventory.

These sit OUTSIDE the driver's 50-entry correctness window (the window
holds the 50 lexicographically-first queries, q00-q49, by round-3
design) but carry full DuckDB oracles and run under the SAME bit-exact
parity harness in pytest (tests/test_oracle_parity.py checks every
oracled query, windowed or not).

Determinism notes mirror the dedup family: hashing is md5
(engine-neutral), aggregates are exact integer sums with at most one
final double division, per-doc threshold tests are integer
cross-multiplications — no float accumulation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.textfn import token_count
from ..operators.curation import hash_split, pack_sequences, redact, redact_sql
from ..operators.dedup import shingle_set
from .registry import query

# ---------------------------------------------------------------------------
# Q60 — deterministic hash split (train/val/test): reproducible dataset
#        membership from md5(key), the curation replacement for random()
# ---------------------------------------------------------------------------

_Q60_SQL = """
WITH b AS (
  SELECT source, n_chars,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("q60_hash_split", oracle=_Q60_SQL, covers="curation:split")
def q60_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id")
        .groupBy("split", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").cast("bigint").alias("total_chars"))
        .orderBy("split", "source")
    )


# ---------------------------------------------------------------------------
# Q61 — within-doc repeated-ngram signal (Gopher/C4 quality rule).
#        Exact-integer aggregation: sum distinct / sum total shingles,
#        one final double division; the per-doc repetitiveness test
#        (frac > 0.05 <=> 20*distinct < 19*total) is an integer compare.
# ---------------------------------------------------------------------------

_Q61_SQL = """
WITH d AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT source,
         greatest(len(toks) - 2, 0) AS total_sh,
         CASE WHEN len(toks) >= 3
              THEN len(list_distinct(list_transform(range(1, len(toks) - 1),
                                                    i -> array_to_string(toks[i:i+2], ' '))))
              ELSE 0 END AS distinct_sh
  FROM d
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(total_sh) AS BIGINT) AS total_shingles,
       CAST(SUM(distinct_sh) AS BIGINT) AS distinct_shingles,
       1.0 - CAST(SUM(distinct_sh) AS DOUBLE) / SUM(total_sh) AS corpus_repeat_frac,
       CAST(SUM(CASE WHEN 20 * distinct_sh < 19 * total_sh THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
FROM sh
GROUP BY source
ORDER BY source
"""


@query("q61_repeated_ngrams", oracle=_Q61_SQL, covers="curation:quality")
def q61_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    total = F.greatest(F.size(toks) - 2, F.lit(0))
    distinct = F.when(F.size(toks) >= 3, F.size(shingle_set(F.col("text"), 3))).otherwise(F.lit(0))
    sh = docs.select("source", total.alias("total_sh"), distinct.alias("distinct_sh"))
    return (
        sh.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("total_sh").cast("bigint").alias("total_shingles"),
            F.sum("distinct_sh").cast("bigint").alias("distinct_shingles"),
            (F.lit(1.0) - F.sum("distinct_sh").cast("double") / F.sum("total_sh")).alias("corpus_repeat_frac"),
            F.sum(F.when(20 * F.col("distinct_sh") < 19 * F.col("total_sh"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_repetitive"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Q62 — sequence packing (batch shaping): documents in doc_id order fill
#        2048-token chunks by cumulative count; the window-expressible
#        streaming bin-fill (see operators/curation.pack_sequences)
# ---------------------------------------------------------------------------

_Q62_SQL = """
WITH t AS (
  SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_tok FROM documents
),
c AS (
  SELECT doc_id, n_tok,
         CAST(floor(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048.0) AS BIGINT) AS chunk_id
  FROM t
)
SELECT chunk_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS chunk_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c
GROUP BY chunk_id
ORDER BY chunk_id
"""


@query("q62_chunk_packing", oracle=_Q62_SQL, covers="curation:packing")
def q62_chunk_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select("doc_id", token_count("text").alias("n_tok"))
    packed = pack_sequences(sized, "doc_id", "n_tok", budget=2048)
    return (
        packed.groupBy("chunk_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("chunk_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("chunk_id")
    )


# ---------------------------------------------------------------------------
# Q63 — PII-style redaction. The corpus carries no PII, so each doc gets
#        a synthesized contact line (email + phone derived from doc_id);
#        both engines must scrub it to identical placeholder text.
# ---------------------------------------------------------------------------

_Q63_SRC_SQL = (
    "(substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com tel ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
    " || '-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))"
)

_Q63_SQL = f"""
WITH r AS (
  SELECT source, {redact_sql(_Q63_SRC_SQL)} AS redacted FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(length(redacted)) AS BIGINT) AS total_len,
       CAST(SUM(CASE WHEN redacted LIKE '%<EMAIL>%' AND redacted LIKE '%<PHONE>%' THEN 1 ELSE 0 END) AS BIGINT) AS n_scrubbed,
       MIN(redacted) AS sample
FROM r
GROUP BY source
ORDER BY source
"""


@query("q63_pii_redaction", oracle=_Q63_SQL, covers="curation:redaction")
def q63_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    src = F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel "),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    r = docs.select("source", redact(src).alias("redacted"))
    scrubbed = F.when(
        F.col("redacted").contains("<EMAIL>") & F.col("redacted").contains("<PHONE>"), 1
    ).otherwise(0)
    return (
        r.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("redacted")).cast("bigint").alias("total_len"),
            F.sum(scrubbed).cast("bigint").alias("n_scrubbed"),
            F.min("redacted").alias("sample"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Q68 — stratified deterministic sampling (dataset mixing): keep a
#        per-source fraction of documents, reproducibly (md5-threshold,
#        not rand()). The corpus-mixture step of a pretraining recipe.
# ---------------------------------------------------------------------------

_Q68_SQL = """
WITH keyed AS (
  SELECT source, n_chars,
         CAST(('0x' || substr(md5('mix1' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hv,
         CASE source
           WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5 WHEN 'src2' THEN 0.25
           WHEN 'src3' THEN 0.1
         END AS frac
  FROM documents
)
SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM keyed
WHERE frac IS NOT NULL AND hv < CAST(frac * 4294967296.0 AS BIGINT)
GROUP BY source
ORDER BY source
"""


@query("q68_stratified_sample", oracle=_Q68_SQL, covers="curation:mixing")
def q68_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_hash_sample(
        docs, "doc_id", "source",
        {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}, salt="mix1"
    )
    return (
        kept.groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").cast("bigint").alias("total_chars"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Q70 — data-quality expectation report (mini-Deequ): declarative rules
#        over orders + a referential check against lineitem, compiled
#        into one agg pass + one anti-join. The staging->publish gate
#        the reference's warehouse layering implies but never runs.
# ---------------------------------------------------------------------------

_Q70_SQL = """
WITH rowchecks AS (
  SELECT
    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS c_nn,
    COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS c_uq,
    SUM(CASE WHEN o_totalprice IS NOT NULL
              AND (o_totalprice < 0 OR o_totalprice > 1000000) THEN 1 ELSE 0 END) AS c_rng,
    SUM(CASE WHEN o_orderpriority IS NOT NULL
              AND NOT regexp_matches(o_orderpriority, '^[0-9]-[A-Z ]+$') THEN 1 ELSE 0 END) AS c_re
  FROM orders
),
fk AS (
  SELECT COUNT(*) AS v FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
)
SELECT check_name AS "check", violations, violations = 0 AS passed FROM (
  SELECT 'not_null(o_custkey)' AS check_name, CAST(c_nn AS BIGINT) AS violations FROM rowchecks
  UNION ALL SELECT 'unique(o_orderkey)', CAST(c_uq AS BIGINT) FROM rowchecks
  UNION ALL SELECT 'range(o_totalprice,0,1000000)', CAST(c_rng AS BIGINT) FROM rowchecks
  UNION ALL SELECT 'regex(o_orderpriority)', CAST(c_re AS BIGINT) FROM rowchecks
  UNION ALL SELECT 'foreign_key(l_orderkey->o_orderkey)', CAST(v AS BIGINT) FROM fk
)
ORDER BY "check"
"""


@query("q70_quality_report", oracle=_Q70_SQL, covers="quality:gate,A8,J5")
def q70_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import (
        expect_foreign_key,
        expect_not_null,
        expect_range,
        expect_regex,
        expect_unique,
        quality_report,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    rows = quality_report(
        orders,
        [
            expect_not_null("o_custkey"),
            expect_unique("o_orderkey"),
            expect_range("o_totalprice", 0, 1_000_000),
            expect_regex("o_orderpriority", r"^[0-9]-[A-Z ]+$"),
        ],
    )
    fk = expect_foreign_key(lineitem, "l_orderkey", orders, "o_orderkey")
    return rows.unionByName(fk).orderBy("check")


# ---------------------------------------------------------------------------
# Q71 — Python UDTF surface (U5 as a real @udtf table function): per-doc
#        word counts via LATERAL join, oracled against plain
#        unnest+group SQL. The explode composition remains the JVM-side
#        preferred shape; this verifies the Python table-function path
#        produces identical rows.
# ---------------------------------------------------------------------------

_Q71_SQL = """
SELECT d.doc_id, w.word, CAST(w.n AS INT) AS n
FROM (SELECT doc_id, text FROM documents WHERE doc_id < 20) d,
     LATERAL (
       SELECT word, COUNT(*) AS n
       FROM unnest(string_split(d.text, ' ')) AS t(word)
       GROUP BY word
     ) w
ORDER BY doc_id, word
"""


@query("q71_udtf_word_counts", oracle=_Q71_SQL, covers="U5,T17")
def q71_udtf_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.enrich import word_counts_udtf

    load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).createOrReplaceTempView(
        "q71_docs"
    )
    spark.udtf.register("word_counts", word_counts_udtf())
    return spark.sql(
        "SELECT doc_id, word, n FROM q71_docs, LATERAL word_counts(text) ORDER BY doc_id, word"
    )


# ---------------------------------------------------------------------------
# Q72 — heavy-hitters sketch (approx_top_k over document tokens): the
#        frequency companion to q55's HLL distinct-count. Approximate by
#        design (rows-only); pytest pins sketch == exact top-k when the
#        sketch capacity dwarfs the distinct count — the regime where
#        the Misra-Gries-style summary is provably exact.
# ---------------------------------------------------------------------------


@query("q72_heavy_hitter_tokens", oracle=None, covers="A4,T17")
def q72_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    # one pass, map-side mergeable sketch — at 100 TB this replaces the
    # full token groupBy when only the head of the distribution matters
    return (
        toks.agg(F.expr("approx_top_k(tok, 20, 100000)").alias("top"))
        .select(F.explode("top").alias("e"))
        .select(F.col("e.item").alias("token"), F.col("e.count").alias("n"))
    )


# ---------------------------------------------------------------------------
# Q23 (formerly q79, rotated into the driver window round 6) — overlapping sliding-window chunking (RAG preprocessing): one row
#        per (doc, 120-char window, 20-char overlap) with exact offsets,
#        plus per-doc window counts. Narrow plan: sequence + posexplode
#        + substring, no shuffle until the final count.
# ---------------------------------------------------------------------------

_Q23_SIZE, _Q23_OVERLAP = 120, 20

_Q23_SQL = f"""
WITH starts AS (
  SELECT doc_id, length(text) AS len, unnest(range(0, length(text), {_Q23_SIZE - _Q23_OVERLAP})) AS char_start,
         text
  FROM documents
),
chunks AS (
  SELECT doc_id,
         CAST(char_start // {_Q23_SIZE - _Q23_OVERLAP} AS INT) AS chunk_idx,
         CAST(char_start AS INT) AS char_start,
         substr(text, CAST(char_start AS INT) + 1, {_Q23_SIZE}) AS chunk_text
  FROM starts
)
SELECT doc_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(length(chunk_text)) AS BIGINT) AS total_chunk_chars,
       md5(string_agg(chunk_text, chr(30) ORDER BY chunk_idx)) AS content_hash
FROM chunks
GROUP BY doc_id
ORDER BY doc_id
"""


@query("r60_chunk_windows", oracle=_Q23_SQL, covers="curation:chunk,T3,U5")
def r60_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import chunk_text

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_text(docs, "doc_id", "text", size=_Q23_SIZE, overlap=_Q23_OVERLAP)
    return (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.length("chunk_text")).alias("total_chunk_chars"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("chunk_idx", "chunk_text"))
                        ),
                        lambda s: s["chunk_text"],
                    ),
                    "\x1e",
                )
            ).alias("content_hash"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Q82 — temperature-scaled corpus mixing (C5 extension; mT5/XLM-R
#        sampling): stratum share p_s = n_s/N is sampled ~ p_s^(1/T),
#        T=2 here so the weight is sqrt(p) (correctly rounded per IEEE,
#        hence bit-mirrorable — other temperatures ride libm pow and
#        stay out of the oracle tier). Budget N/2; the normalizer folds
#        in stratum-sorted order; thresholds use explicit floor (Spark
#        casts truncate where DuckDB casts round).
# ---------------------------------------------------------------------------

_Q82_SQL = """
WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
tot AS (SELECT SUM(n) AS total FROM counts),
w AS (SELECT source, n, sqrt(n / total) AS w FROM counts, tot),
z AS (SELECT list_reduce(list(w ORDER BY source), (a, x) -> a + x) AS zn FROM w),
frac AS (
  SELECT source, n,
         least(CAST(1.0 AS DOUBLE), (w / zn * (total / 2.0)) / n) AS f
  FROM w, z, tot
),
kept AS (
  SELECT d.source, d.n_chars
  FROM documents d JOIN frac USING (source)
  WHERE CAST(('0x' || substr(md5('temp2' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        < CAST(floor(f * 4294967296.0) AS BIGINT)
)
SELECT k.source, f.n AS n_total, COUNT(*) AS n_kept,
       CAST(SUM(k.n_chars) AS BIGINT) AS total_chars
FROM kept k JOIN frac f USING (source)
GROUP BY 1, 2
ORDER BY 1
"""


@query("q82_temperature_mix", oracle=_Q82_SQL, covers="curation:mixing")
def q82_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import temperature_mix

    docs = load_table(spark, sf_dir, "documents")
    kept, fractions = temperature_mix(
        docs, "doc_id", "source", temperature=2.0, salt="temp2"
    )
    return (
        kept.groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").cast("bigint").alias("total_chars"))
        .join(fractions.select("source", F.col("n").alias("n_total")), "source")
        .select("source", "n_total", "n_kept", "total_chars")
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Q27 (formerly q84, rotated into the driver window round 6) — URL curation (Common-Crawl-style corpus hygiene): normalize URL
#        variants (scheme/www/fragment/trailing-slash) to one canonical
#        page key, extract the domain, and cap documents per domain —
#        the hygiene pass the reference's id=url store skips (a page
#        fetched as http://www.X/ and https://X becomes TWO documents,
#        pipeline.py:69). URLs are synthesized deterministically from
#        doc_id so every variant class is exercised at every sf.
# ---------------------------------------------------------------------------

_Q27_SQL = r"""
WITH raw AS (
  SELECT doc_id, source,
         CASE doc_id % 4 WHEN 0 THEN 'https://' WHEN 1 THEN 'http://'
                         WHEN 2 THEN 'https://www.' ELSE 'HTTP://WWW.' END
         || source || '.example.com/articles/' || CAST(doc_id // 4 AS VARCHAR)
         || CASE doc_id % 3 WHEN 0 THEN '/' WHEN 1 THEN '#frag' ELSE '' END AS url
  FROM documents
),
norm AS (
  SELECT doc_id, source,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(url), '#.*$', ''), '^https?://', ''), '^www\.', ''), '/$', '') AS canon,
         regexp_replace(regexp_extract(regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(url), '#.*$', ''), '^https?://', ''), '^www\.', ''), '/$', ''), '^([^/]+)', 1), ':\d+$', '') AS domain
  FROM raw
),
keyed AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY canon ORDER BY doc_id) AS rn
  FROM norm
),
paged AS (SELECT * FROM keyed WHERE rn = 1),
capped AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS dr
  FROM paged
)
SELECT domain,
       COUNT(*) AS n_pages,
       CAST(SUM(CASE WHEN dr <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_cap50
FROM capped
GROUP BY 1
ORDER BY 1
"""


@query("q27_url_curation", oracle=_Q27_SQL, covers="T4,V4,O3")
def q27_url_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.textfn import normalize_url, url_domain
    from ..operators.relational import top_k_per_group

    docs = load_table(spark, sf_dir, "documents")
    scheme = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("https://"))
        .when(F.col("doc_id") % 4 == 1, F.lit("http://"))
        .when(F.col("doc_id") % 4 == 2, F.lit("https://www."))
        .otherwise(F.lit("HTTP://WWW."))
    )
    tail = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("/"))
        .when(F.col("doc_id") % 3 == 1, F.lit("#frag"))
        .otherwise(F.lit(""))
    )
    raw = docs.select(
        "doc_id",
        "source",
        F.concat(
            scheme, F.col("source"), F.lit(".example.com/articles/"),
            F.floor(F.col("doc_id") / 4).cast("long").cast("string"), tail,
        ).alias("url"),
    )
    norm = raw.select(
        "doc_id", "source",
        normalize_url("url").alias("canon"),
    ).withColumn("domain", url_domain("canon"))
    paged = top_k_per_group(norm, ["canon"], [F.col("doc_id").asc()], 1).drop("rn")
    capped = top_k_per_group(paged, ["domain"], [F.col("doc_id").asc()], 10**9, rn_col="dr")
    return (
        capped.groupBy("domain")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.when(F.col("dr") <= 50, 1).otherwise(0)).alias("n_kept_cap50"),
        )
        .orderBy("domain")
    )


# ---------------------------------------------------------------------------
# Q88 — per-source quota sampling: EXACT k docs per source, selected by
#        md5-order (deterministic, engine-neutral, nested under smaller
#        quotas). The fixed-count sibling of q68's fractions — a data
#        recipe says "at most 20 docs per domain", not "3% of each".
# ---------------------------------------------------------------------------

_Q88_SQL = """
WITH r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS qr
  FROM documents
)
SELECT doc_id, source, n_chars FROM r WHERE qr <= 20
ORDER BY doc_id
"""


@query("q88_group_quota_sample", oracle=_Q88_SQL, covers="curation:mixing,O3")
def q88_group_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import group_quota_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    kept = group_quota_sample(docs, ["source"], "doc_id", k=20)
    return kept.orderBy("doc_id")


# ---------------------------------------------------------------------------
# Q94 — compression-ratio quality signal (rows-only by design: no SQL
#        zlib exists to oracle against): deflate/raw ratio per doc via
#        an Arrow-batched pandas UDF, the model-free redundancy
#        detector paired with the repeated-ngram rule (q61 family).
# ---------------------------------------------------------------------------


@query("q94_compression_ratio", oracle=None, covers="U2,T18")
def q94_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.enrich import compression_ratio_udf

    docs = load_table(spark, sf_dir, "documents")
    ratio = compression_ratio_udf()
    return (
        docs.select("doc_id", ratio(F.col("text")).alias("compression_ratio"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Q99 — identifier pseudonymization: salted SHA-256 of user_id with
#        join/group semantics preserved — distinct-token count per
#        event_type must equal the distinct-raw-id count (the property
#        that makes pseudonymized data still trainable/joinable).
# ---------------------------------------------------------------------------

from ..operators.curation import pseudonymize_sql as _psql

_Q99_SQL = f"""
WITH p AS (
  SELECT event_type,
         {_psql('user_id', 'r6salt')} AS user_token
  FROM events
)
SELECT event_type,
       COUNT(DISTINCT user_token) AS n_users,
       min(user_token) AS first_token
FROM p GROUP BY event_type ORDER BY event_type
"""


@query("q99_pseudonymize_ids", oracle=_Q99_SQL, covers="curation:pii,A3,A2")
def q99_pseudonymize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import pseudonymize

    events = load_table(spark, sf_dir, "events")
    p = events.select("event_type", pseudonymize("user_id", "r6salt").alias("user_token"))
    return (
        p.groupBy("event_type")
        .agg(
            F.countDistinct("user_token").alias("n_users"),
            F.min("user_token").alias("first_token"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# R04 — deterministic corpus shuffle -> (shard, position): the
#        training-order assignment between curation and the shard
#        write. Shard membership and within-shard order derive from
#        md5(key) alone, so the oracle is the same hash arithmetic in
#        SQL; doc_id is unique, making the full order deterministic.
# ---------------------------------------------------------------------------

_R04_SQL = """
WITH k AS (
  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 8 AS shard
  FROM documents
)
SELECT shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS INT) AS position,
       doc_id, source
FROM k
ORDER BY shard, position
"""


@query("r04_seeded_shuffle", oracle=_R04_SQL, covers="curation:shuffle,O3,P8")
def r04_seeded_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import seeded_shuffle
    from ..operators.relational import ordered_small

    docs = load_table(spark, sf_dir, "documents")
    out = seeded_shuffle(docs, "doc_id", n_shards=8).select(
        "shard", "position", "doc_id", "source"
    )
    return ordered_small(out, "shard", "position")


# ---------------------------------------------------------------------------
# R07 — weighted sampling without replacement (A-Res): 100 documents
#        with inclusion probability proportional to n_chars. The rank
#        u^(1/w) is compared through floor-quantized ln(u)/w, so both
#        engines pick the identical sample set.
# ---------------------------------------------------------------------------

_R07_SQL = """
WITH w AS (
  SELECT doc_id, source, n_chars,
         floor(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 1.0) / 4503599627370496.0) * 1000000.0) / 1000000.0 AS qln
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
)
SELECT doc_id, source, n_chars
FROM w ORDER BY qln / CAST(n_chars AS DOUBLE) DESC, doc_id LIMIT 100
"""


@query("r07_weighted_sample", oracle=_R07_SQL, covers="curation:mixing,O1,O2")
def r07_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(
        docs.select("doc_id", "source", "n_chars"), "doc_id", "n_chars", 100
    )


# ---------------------------------------------------------------------------
# R12 — Gopher-style quality rule pack (Rae et al. 2021 table A1):
#        per-source violation profile. Every rule is an integer
#        cross-multiplication (operators/curation.py gopher_signals),
#        so the verdicts carry no float at all.
# ---------------------------------------------------------------------------

_R12_SQL = r"""
WITH s AS (
  SELECT source,
         len(string_split_regex(trim(text), '\s+')) AS n_words,
         COALESCE(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
                                          w -> length(w))), 0) AS n_word_chars,
         len(list_filter(string_split_regex(trim(text), '\s+'),
                         w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha_words,
         len(list_filter(string_split_regex(trim(text), '\s+'),
                         w -> list_contains(['the','be','to','of','and','that','have','with'], lower(w)))) AS n_stopwords,
         (length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '…', ''))) AS n_symbols,
         len(string_split(text, chr(10))) AS n_lines,
         len(list_filter(string_split(text, chr(10)),
                         ln -> regexp_matches(trim(ln), '^([-*•])'))) AS n_bullet_lines,
         len(list_filter(string_split(text, chr(10)),
                         ln -> regexp_matches(ln, '(\.\.\.|…)\s*$'))) AS n_ellipsis_lines
  FROM documents
), r AS (
  SELECT source,
         (n_words >= 50 AND n_words <= 100000) AS r_word_count,
         (3*n_words <= n_word_chars AND n_word_chars <= 10*n_words) AS r_mean_word_len,
         (10*n_symbols <= n_words) AS r_symbol_ratio,
         (10*n_bullet_lines <= 9*n_lines) AS r_bullet_lines,
         (10*n_ellipsis_lines <= 3*n_lines) AS r_ellipsis_lines,
         (5*n_alpha_words >= 4*n_words) AS r_alpha_words,
         (n_stopwords >= 2) AS r_stopwords,
         n_words
  FROM s
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN r_word_count AND r_mean_word_len AND r_symbol_ratio
                      AND r_bullet_lines AND r_ellipsis_lines AND r_alpha_words
                      AND r_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN NOT r_word_count THEN 1 ELSE 0 END) AS BIGINT) AS v_word_count,
       CAST(SUM(CASE WHEN NOT r_mean_word_len THEN 1 ELSE 0 END) AS BIGINT) AS v_mean_word_len,
       CAST(SUM(CASE WHEN NOT r_symbol_ratio THEN 1 ELSE 0 END) AS BIGINT) AS v_symbol_ratio,
       CAST(SUM(CASE WHEN NOT r_alpha_words THEN 1 ELSE 0 END) AS BIGINT) AS v_alpha_words,
       CAST(SUM(CASE WHEN NOT r_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS v_stopwords,
       CAST(SUM(n_words) AS DOUBLE) / COUNT(*) AS mean_words
FROM r
GROUP BY source
ORDER BY source
"""


@query("r12_gopher_quality", oracle=_R12_SQL, covers="curation:quality,T18,A2,A8")
def r12_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-pack violation profile per source: which published
    quality rule rejects how many documents — the go/no-go dashboard a
    pretraining ingest runs before dedup. One narrow metric projection
    (no UDF, no shuffle before the per-source agg)."""
    from ..operators.curation import gopher_signals

    docs = load_table(spark, sf_dir, "documents")
    s = gopher_signals(docs)

    def viol(rule: str) -> F.Column:
        return F.sum(F.when(~F.col(rule), 1).otherwise(0)).cast("bigint")

    return (
        s.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("gopher_pass"), 1).otherwise(0)).cast("bigint").alias("n_pass"),
            viol("r_word_count").alias("v_word_count"),
            viol("r_mean_word_len").alias("v_mean_word_len"),
            viol("r_symbol_ratio").alias("v_symbol_ratio"),
            viol("r_alpha_words").alias("v_alpha_words"),
            viol("r_stopwords").alias("v_stopwords"),
            (F.sum("n_words").cast("double") / F.count("*")).alias("mean_words"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# R15 — per-group outlier profile (operators/quality.py outlier_flags):
#        the z>3 test with every division and sqrt multiplied away, so
#        the moments are exact decimals and the comparison is the same
#        IEEE sequence in both engines.
# ---------------------------------------------------------------------------

_R15_SQL = """
WITH m AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS sx,
         SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS sxx
  FROM events
  GROUP BY event_type
), f AS (
  SELECT e.event_type, e.value,
         (CAST(m.n AS DOUBLE) * e.value - CAST(m.sx AS DOUBLE))
           * (CAST(m.n AS DOUBLE) * e.value - CAST(m.sx AS DOUBLE))
           > 9.0 * (CAST(m.n AS DOUBLE) * CAST(m.sxx AS DOUBLE)
                    - CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE)) AS is_outlier
  FROM events e JOIN m ON e.event_type = m.event_type
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(SUM(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS outlier_rate
FROM f
GROUP BY event_type
ORDER BY event_type
"""


@query("r15_outlier_profile", oracle=_R15_SQL, covers="quality:outliers,A2,J2", bench=False)
def r15_outlier_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalous-value profile per event type — the data-quality gate a
    feed passes before entering training mixes. One moments shuffle,
    one broadcast-back join, one counting agg."""
    from ..operators.quality import outlier_flags

    events = load_table(spark, sf_dir, "events")
    flagged = outlier_flags(events, "value", ["event_type"], z=3)
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("is_outlier"), 1).otherwise(0)).cast("bigint").alias("n_outliers"),
            (
                F.sum(F.when(F.col("is_outlier"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("outlier_rate"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# R26/R27 — DSIR data selection (Xie et al., NeurIPS 2023) at unigram
#        order: every candidate doc scored by its mean per-token log
#        importance ratio toward a target domain (here: the English
#        slice), then the selection drawn by Gumbel-max top-k — i.e.
#        sampled without replacement proportional to exp(logratio)
#        with no exp() ever evaluated. Both halves oracled bit-exact:
#        the two smoothed LMs share one vocab, every ln is floor-
#        quantized at 1e-6, the per-doc sum folds term-sorted, and the
#        Gumbel draws depend only on (salt, doc_id).
# ---------------------------------------------------------------------------

_R26_CTE = """
WITH base AS (
  SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
),
tok AS (SELECT doc_id, lang, len(toks) AS dl, unnest(toks) AS term FROM base),
tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2, 3),
src_lm AS (SELECT term, SUM(tf) AS ctf_s FROM tf GROUP BY 1),
tgt_lm AS (SELECT term, COUNT(*) AS ctf_t FROM tok WHERE lang = 'en' GROUP BY 1),
vocab AS (
  SELECT COALESCE(s.term, t.term) AS term,
         COALESCE(s.ctf_s, 0) AS ctf_s,
         COALESCE(t.ctf_t, 0) AS ctf_t
  FROM src_lm s FULL OUTER JOIN tgt_lm t ON s.term = t.term
),
tot AS (SELECT SUM(ctf_s) AS ts, SUM(ctf_t) AS tt, COUNT(*) AS v FROM vocab),
per AS (
  SELECT tf.doc_id, tf.dl, tf.term,
         tf.tf * ((floor(ln((vocab.ctf_t + 0.5) / (tot.tt + 0.5 * tot.v)) * 1000000.0) / 1000000.0)
                - (floor(ln((vocab.ctf_s + 0.5) / (tot.ts + 0.5 * tot.v)) * 1000000.0) / 1000000.0)) AS lr
  FROM tf JOIN vocab USING (term), tot
),
scored AS (
  SELECT doc_id, dl,
         list_reduce(list(lr ORDER BY term), (a, x) -> a + x) / dl AS logratio
  FROM per GROUP BY doc_id, dl
)
"""

_R26_SQL = _R26_CTE + "SELECT doc_id, dl, logratio FROM scored ORDER BY doc_id"

_R27_SQL = _R26_CTE + """
SELECT doc_id, dl, logratio FROM scored
ORDER BY logratio
         - (floor(ln(-(floor(ln((CAST(('0x' || substr(md5('r27' || CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 1.0)
                               / 9007199254740992.0) * 1000000.0) / 1000000.0)) * 1000000.0) / 1000000.0)
         DESC, doc_id
LIMIT 60
"""


@query("r26_dsir_logratio", oracle=_R26_SQL, covers="curation:selection,T18,A2")
def r26_dsir_logratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-candidate DSIR importance score toward the English slice of
    the corpus. Two postings builds, two term-keyed LM aggregations,
    one broadcast totals row, one doc-keyed fold."""
    from ..operators.search import dsir_logratio

    docs = load_table(spark, sf_dir, "documents")
    return dsir_logratio(docs, docs.filter(F.col("lang") == "en")).orderBy("doc_id")


@query("r27_dsir_select", oracle=_R27_SQL, covers="curation:selection,O1,O2")
def r27_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR draw: 60 docs sampled without replacement proportional
    to exp(logratio) via seeded Gumbel-max top-k — the module's
    engine-neutral draw contract, so both engines pick the identical
    sample set."""
    from ..operators.curation import gumbel_topk
    from ..operators.search import dsir_logratio

    docs = load_table(spark, sf_dir, "documents")
    scored = dsir_logratio(docs, docs.filter(F.col("lang") == "en"))
    return gumbel_topk(scored, "doc_id", "logratio", 60, salt="r27")


# ---------------------------------------------------------------------------
# R29 — trained quality classifier (the CCNet / GPT-3 model-based
#        filter tier above r12's heuristic rule pack): hashed
#        bag-of-words + MLlib logistic regression. The synthetic corpus
#        carries no natural quality signal (every lang shares one
#        vocabulary), so the query PLANTS the reject class — a
#        vowel-mangled corruption of each doc at id + 10^6, disjoint
#        token space — trains on 4/5 of the union and reports the
#        held-out confusion counts. Rows-only by design (LBFGS training
#        is not SQL-expressible); separation, frozen-model determinism
#        and the save/load round-trip are pinned in
#        tests/test_quality_ops.py.
# ---------------------------------------------------------------------------


@query("r29_quality_classifier", oracle=None, covers="quality:model,U2,A2")
def r29_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import score_quality, train_quality_model

    docs = load_table(spark, sf_dir, "documents")
    clean = docs.select("doc_id", "text", F.lit(1).alias("label"))
    corrupted = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.translate("text", "aeiou", "qzxvk").alias("text"),
        F.lit(0).alias("label"),
    )
    union = clean.unionByName(corrupted)
    model = train_quality_model(union.filter(F.col("doc_id") % 5 != 0))
    held_out = union.filter(F.col("doc_id") % 5 == 0)
    scored = score_quality(model, held_out)
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("quality_prob") >= 0.5).cast("bigint")).alias("n_kept"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# R33 — embargoed temporal holdout: train strictly before 1996-07-01,
#        test from 30 days after, the gap dropped — the leakage buffer
#        a time-correlated eval needs (zero-gap splits let boundary
#        train rows carry the test period's signal). Per-split count,
#        boundary min/max and exact-decimal revenue prove both cut
#        points land exactly where the oracle's do.
# ---------------------------------------------------------------------------

_R33_SQL = """
WITH s AS (
  SELECT o_totalprice, o_orderdate,
         CASE WHEN o_orderdate < TIMESTAMP '1996-07-01' THEN 'train'
              WHEN o_orderdate >= TIMESTAMP '1996-07-01' + INTERVAL 30 DAY THEN 'test'
              ELSE 'embargo' END AS split
  FROM orders
)
SELECT split, COUNT(*) AS n,
       CAST(MIN(o_orderdate) AS DATE) AS first_day,
       CAST(MAX(o_orderdate) AS DATE) AS last_day,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM s WHERE split <> 'embargo'
GROUP BY split ORDER BY split
"""


@query("r33_time_split", oracle=_R33_SQL, covers="C1,P3,A2")
def r33_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import cents, wmoney
    from ..operators.curation import time_split

    orders = load_table(spark, sf_dir, "orders")
    s = time_split(orders, "o_orderdate", "1996-07-01", embargo_days=30)
    return (
        s.groupBy("split")
        .agg(
            F.count("*").alias("n"),
            F.min("o_orderdate").cast("date").alias("first_day"),
            F.max("o_orderdate").cast("date").alias("last_day"),
            wmoney(cents("o_totalprice"), 10, 2).alias("revenue"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# R36 — padding-waste report over length buckets: the batching-layout
#        economics (pad to bucket max vs corpus max) that justifies a
#        bucketed re-shard before paying for one. Buckets on the
#        documents token count; all sums exact longs.
# ---------------------------------------------------------------------------

_R36_SQL = """
WITH b AS (
  SELECT n_tokens,
         CASE WHEN n_tokens <= 16 THEN 16
              WHEN n_tokens <= 32 THEN 32
              WHEN n_tokens <= 64 THEN 64
              ELSE -1 END AS bucket
  FROM (SELECT len(regexp_extract_all(text, '\\S+')) AS n_tokens FROM documents)
),
g AS (SELECT MAX(n_tokens) AS gmax FROM b)
SELECT bucket, COUNT(*) AS n_rows, MAX(n_tokens) AS bucket_max,
       CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT) AS pad_bucketed,
       CAST(COUNT(*) * MAX(g.gmax) - SUM(n_tokens) AS BIGINT) AS pad_global,
       CAST(COUNT(*) * (MAX(g.gmax) - MAX(n_tokens)) AS BIGINT) AS tokens_saved
FROM b, g
GROUP BY bucket
ORDER BY bucket
"""


@query("r36_padding_waste", oracle=_R36_SQL, covers="A2,A8,P2")
def r36_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import padding_waste_report

    docs = load_table(spark, sf_dir, "documents").select(
        token_count("text").alias("n_tokens")
    )
    return padding_waste_report(docs, "n_tokens", [16, 32, 64]).orderBy("bucket")


# ---------------------------------------------------------------------------
# R39 — token-budget mixture allocation (water-filling): split a 6000-
#        token budget across four weighted sources, capped by capacity;
#        a source that cannot cover its proportional share saturates
#        and its unused share redistributes — the closed form orders
#        sources by capacity/weight and tests each prefix with integer
#        cross-multiplication (no float in any verdict; the ratio ORDER
#        key is the only division, identical IEEE on both engines). At
#        driver scale the budget saturates the big-weight sources; at
#        sf1 capacities dwarf it and the pure proportional branch runs.
# ---------------------------------------------------------------------------

_R39_SQL = """
WITH per AS (
  SELECT source,
         CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS avail,
         CAST(CASE source WHEN 'src0' THEN 50 WHEN 'src1' THEN 30
                          WHEN 'src2' THEN 15 WHEN 'src3' THEN 5 END AS BIGINT) AS weight
  FROM documents GROUP BY source
),
f AS (SELECT * FROM per WHERE weight IS NOT NULL),
r AS (
  SELECT *,
         COALESCE(SUM(avail) OVER (ORDER BY CAST(avail AS DOUBLE) / weight, source
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_avail,
         COALESCE(SUM(weight) OVER (ORDER BY CAST(avail AS DOUBLE) / weight, source
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_w,
         SUM(weight) OVER () AS w_all
  FROM f
),
s AS (SELECT *, avail * (w_all - cum_w) <= weight * (6000 - cum_avail) AS saturated FROM r),
t AS (
  SELECT *,
         SUM(CASE WHEN saturated THEN avail ELSE 0 END) OVER () AS sat_avail,
         SUM(CASE WHEN saturated THEN weight ELSE 0 END) OVER () AS sat_w
  FROM s
)
SELECT source, avail, weight,
       CASE WHEN saturated THEN avail
            ELSE CAST(FLOOR(weight * (6000 - sat_avail) / (w_all - sat_w)) AS BIGINT)
       END AS alloc,
       saturated
FROM t ORDER BY source
"""


@query("r39_mixture_allocation", oracle=_R39_SQL, covers="C5,A2,O4")
def r39_mixture_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import mixture_allocation

    docs = load_table(spark, sf_dir, "documents").select(
        "source", token_count("text").alias("n_tok")
    )
    return mixture_allocation(
        docs, "source", "n_tok", {"src0": 50, "src1": 30, "src2": 15, "src3": 5}, 6000
    ).orderBy("source")


# ---------------------------------------------------------------------------
# R42 — k-fold assignment audit: 5 folds over orders keyed on
#        o_custkey (group-keyed so one customer never straddles a
#        fold boundary), per-fold row/customer counts and exact
#        revenue. The md5 draw replays identically in the oracle.
# ---------------------------------------------------------------------------

_R42_SQL = """
WITH f AS (
  SELECT o_custkey, o_totalprice,
         CAST(CAST(('0x' || substr(md5('cv' || CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 5 AS INT) AS fold
  FROM orders
)
SELECT fold, COUNT(*) AS n_orders, COUNT(DISTINCT o_custkey) AS n_customers,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM f GROUP BY fold ORDER BY fold
"""


@query("r42_hash_folds", oracle=_R42_SQL, covers="C1,A2,A3")
def r42_hash_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import cents, wmoney
    from ..operators.curation import hash_fold

    orders = load_table(spark, sf_dir, "orders")
    f = hash_fold(orders, "o_custkey", 5, salt="cv")
    return (
        f.groupBy("fold")
        .agg(
            F.count("*").alias("n_orders"),
            F.count_distinct("o_custkey").alias("n_customers"),
            wmoney(cents("o_totalprice"), 10, 2).alias("revenue"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# R43 — content-defined chunking: cut after every position whose
#        trailing 8 chars md5-hash to 0 mod 64 — boundaries depend
#        only on local content, so edits shift chunk POSITIONS but not
#        the characters they cut at, and chunk-level dedup keeps
#        matching the unedited remainder (the property fixed-stride
#        chunking lacks). The oracle replays the identical per-position
#        md5 cuts; the only possible empty span is a trailing one, so
#        filtering it never renumbers earlier chunks.
# ---------------------------------------------------------------------------

_R43_SQL = """
WITH d AS (SELECT doc_id, text, len(text) AS n FROM documents),
c AS (
  SELECT doc_id, text, n,
         list_filter(range(8, n + 1),
           i -> CAST(('0x' || substr(md5(substr(text, i - 7, 8)), 1, 8)) AS BIGINT) % 64 = 0
         ) AS cuts
  FROM d
),
z AS (
  SELECT doc_id, text,
         list_prepend(0, cuts) AS starts,
         list_append(cuts, n) AS ends
  FROM c
),
u AS (
  SELECT doc_id, text, starts, ends,
         unnest(range(1, len(starts) + 1)) AS k
  FROM z
)
SELECT doc_id, CAST(k - 1 AS INT) AS chunk_idx,
       CAST(starts[k] AS INT) AS char_start,
       CAST(ends[k] - starts[k] AS INT) AS n_chars,
       substr(text, CAST(starts[k] + 1 AS INT), CAST(ends[k] - starts[k] AS INT)) AS chunk_text
FROM u
WHERE ends[k] > starts[k]
ORDER BY doc_id, chunk_idx
"""


@query("r43_cdc_chunks", oracle=_R43_SQL, covers="C7,T3,U5")
def r43_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import cdc_chunks

    docs = load_table(spark, sf_dir, "documents")
    return cdc_chunks(docs, "doc_id", "text", window=8, divisor=64).orderBy(
        "doc_id", "chunk_idx"
    )


# ---------------------------------------------------------------------------
# R44 — duplicate-chunk fraction: per doc, how many of its CDC chunks
#        appear verbatim in OTHER docs — the partial-boilerplate
#        signal doc-level near-dup misses; content-defined boundaries
#        make shared text chunk identically wherever it sits. Verdict
#        columns are exact integers.
# ---------------------------------------------------------------------------

_R44_SQL = """
WITH d AS (SELECT doc_id, text, len(text) AS n FROM documents),
c AS (
  SELECT doc_id, text, n,
         list_filter(range(8, n + 1),
           i -> CAST(('0x' || substr(md5(substr(text, i - 7, 8)), 1, 8)) AS BIGINT) % 64 = 0
         ) AS cuts
  FROM d
),
z AS (SELECT doc_id, text, list_prepend(0, cuts) AS starts, list_append(cuts, n) AS ends FROM c),
u AS (SELECT doc_id, text, starts, ends, unnest(range(1, len(starts) + 1)) AS k FROM z),
ch AS (
  SELECT DISTINCT doc_id,
         md5(substr(text, CAST(starts[k] + 1 AS INT), CAST(ends[k] - starts[k] AS INT))) AS h
  FROM u WHERE ends[k] > starts[k]
),
spread AS (SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM ch GROUP BY h)
SELECT ch.doc_id, COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN spread.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
FROM ch JOIN spread USING (h)
GROUP BY ch.doc_id
ORDER BY ch.doc_id
"""


@query("r44_duplicate_chunk_fraction", oracle=_R44_SQL, covers="C7,V4,A2,A3")
def r44_duplicate_chunk_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import duplicate_chunk_fraction

    docs = load_table(spark, sf_dir, "documents")
    return duplicate_chunk_fraction(docs, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Q30 (ex-r45, rotated into the driver window round 9) — chunk-level boilerplate removal: rebuild every doc keeping a
#        shared chunk's text only in its min-id canonical owner — the
#        rewrite complement of r44's score, at content-defined
#        granularity so shifted boilerplate is still recognized. The
#        oracle replays ownership and the ordered rebuild (string_agg
#        skips the dropped chunks' NULLs on both engines).
# ---------------------------------------------------------------------------

_Q30_SQL_CHUNKS = """
WITH d AS (SELECT doc_id, text, len(text) AS n FROM documents),
c AS (
  SELECT doc_id, text, n,
         list_filter(range(8, n + 1),
           i -> CAST(('0x' || substr(md5(substr(text, i - 7, 8)), 1, 8)) AS BIGINT) % 64 = 0
         ) AS cuts
  FROM d
),
z AS (SELECT doc_id, text, list_prepend(0, cuts) AS starts, list_append(cuts, n) AS ends FROM c),
u AS (SELECT doc_id, text, starts, ends, unnest(range(1, len(starts) + 1)) AS k FROM z),
ch AS (
  SELECT doc_id, CAST(k - 1 AS INT) AS chunk_idx,
         substr(text, CAST(starts[k] + 1 AS INT), CAST(ends[k] - starts[k] AS INT)) AS chunk_text
  FROM u WHERE ends[k] > starts[k]
),
own AS (SELECT md5(chunk_text) AS h, MIN(doc_id) AS owner FROM ch GROUP BY 1),
f AS (
  SELECT ch.doc_id, ch.chunk_idx, ch.chunk_text, ch.doc_id = own.owner AS keep
  FROM ch JOIN own ON md5(ch.chunk_text) = own.h
)
SELECT doc_id, COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       COALESCE(string_agg(CASE WHEN keep THEN chunk_text END, '' ORDER BY chunk_idx), '') AS clean_text
FROM f GROUP BY doc_id ORDER BY doc_id
"""


@query("q30_remove_duplicate_chunks", oracle=_Q30_SQL_CHUNKS, covers="C7,V4,A2,P9")
def q30_remove_duplicate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import remove_duplicate_chunks

    docs = load_table(spark, sf_dir, "documents")
    return remove_duplicate_chunks(docs, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# R46 — incremental boilerplate removal vs the persisted chunk-hash
#        store: the delta (src0 ids >= 300) drops every chunk the
#        corpus (src0 ids < 300) has ever seen — corpus touched ONLY
#        through its hash store — plus within-delta duplicates kept in
#        their min-id delta doc. The oracle is remove_duplicate_chunks'
#        SQL over the UNION restricted to delta docs, with corpus docs
#        owning all their chunks (the r41/q64 incremental-mirror
#        pattern, here for the rewrite family).
# ---------------------------------------------------------------------------

_R46_SQL = """
WITH d AS (SELECT doc_id, text, len(text) AS n FROM documents WHERE source = 'src0'),
c AS (
  SELECT doc_id, text, n,
         list_filter(range(8, n + 1),
           i -> CAST(('0x' || substr(md5(substr(text, i - 7, 8)), 1, 8)) AS BIGINT) % 64 = 0
         ) AS cuts
  FROM d
),
z AS (SELECT doc_id, text, list_prepend(0, cuts) AS starts, list_append(cuts, n) AS ends FROM c),
u AS (SELECT doc_id, text, starts, ends, unnest(range(1, len(starts) + 1)) AS k FROM z),
ch AS (
  SELECT doc_id, CAST(k - 1 AS INT) AS chunk_idx,
         substr(text, CAST(starts[k] + 1 AS INT), CAST(ends[k] - starts[k] AS INT)) AS chunk_text
  FROM u WHERE ends[k] > starts[k]
),
corpus_h AS (SELECT DISTINCT md5(chunk_text) AS h FROM ch WHERE doc_id < 300),
delta_owner AS (
  SELECT md5(chunk_text) AS h, MIN(doc_id) AS owner FROM ch WHERE doc_id >= 300 GROUP BY 1
),
f AS (
  SELECT ch.doc_id, ch.chunk_idx, ch.chunk_text,
         corpus_h.h IS NULL AND ch.doc_id = delta_owner.owner AS keep
  FROM ch
  JOIN delta_owner ON md5(ch.chunk_text) = delta_owner.h
  LEFT JOIN corpus_h ON md5(ch.chunk_text) = corpus_h.h
  WHERE ch.doc_id >= 300
)
SELECT doc_id, COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       COALESCE(string_agg(CASE WHEN keep THEN chunk_text END, '' ORDER BY chunk_idx), '') AS clean_text
FROM f GROUP BY doc_id ORDER BY doc_id
"""


@query("r46_incremental_boilerplate", oracle=_R46_SQL, covers="C7,V4,A2,I2")
def r46_incremental_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..operators.curation import build_boilerplate_store, remove_known_boilerplate

    path = os.path.join(
        "/tmp/spark_graft_io", os.path.basename(sf_dir.rstrip("/")), "r46_bpstore"
    )
    docs = load_table(spark, sf_dir, "documents").filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("doc_id") < 300)
    delta = docs.filter(F.col("doc_id") >= 300)
    build_boilerplate_store(corpus, "doc_id", "text", path)
    return remove_known_boilerplate(delta, path, "doc_id", "text").orderBy("doc_id")
