"""Text / JSON / date / array query set — SURVEY §2.10 Q03, Q24-Q28, Q31, Q35.

Covers the reference's text-processing surface (regex cleanup
``pipeline.py:268-281``, key extraction ``orchestrator.py:218-247``,
tokenize-and-count over article bodies, JSON encode/decode
``pipeline.py:46``, weighted topic scoring ``config.py:166-174``)
re-expressed as JVM-side built-ins over the ``documents`` / ``events`` /
``embeddings`` tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import dec
from ..functions.textfn import dict_replace, tts_spoken_form, tts_spoken_form_sql
from .registry import query

# ---------------------------------------------------------------------------
# Q24 — token-analysis family, tagged union (merged round 6 to free a
#        driver-window slot for the bucketed-join query q25):
#        * 'top' branch — tokenize + explode + top token counts
#          (T2, T7, U5): limit-30 computed before the union so the
#          branch keeps its TakeOrdered shape;
#        * 'keyword' branch — regex filter + regexp_extract structured
#          field (P5, T6, T4), grouped by (lang, keyword).
# ---------------------------------------------------------------------------

_Q24_SQL = """
WITH top AS (
  SELECT token, COUNT(*) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
  GROUP BY token
  ORDER BY n DESC, token
  LIMIT 30
)
SELECT 'top' AS part, CAST(NULL AS VARCHAR) AS lang, token, n FROM top
UNION ALL
SELECT 'keyword', lang, regexp_extract(text, '(spark|vector|window)', 1), COUNT(*)
FROM documents
WHERE regexp_matches(text, '(spark|vector|window)')
GROUP BY 1, 2, 3
ORDER BY part, lang, token
"""


@query("q24_top_tokens", oracle=_Q24_SQL, covers="T2,T7,U5,A2,P5,T6,T4", bench=True)
def q24_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    top = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(30)
        .select(F.lit("top").alias("part"), F.lit(None).cast("string").alias("lang"), "token", "n")
    )
    keyword = (
        docs.filter(F.col("text").rlike("(spark|vector|window)"))
        .select("lang", F.regexp_extract("text", "(spark|vector|window)", 1).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("n"))
        .select(F.lit("keyword").alias("part"), "lang", "token", "n")
    )
    return top.unionByName(keyword).orderBy("part", "lang", "token")


# ---------------------------------------------------------------------------
# Q26 — date trunc + date arithmetic aggregates (T11, T13)
# ---------------------------------------------------------------------------

_Q26_SQL = """
SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS order_month,
       CAST(SUM(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))) AS DOUBLE)
         / COUNT(*) AS avg_ship_delay_days,
       MIN(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))) AS min_delay,
       MAX(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))) AS max_delay,
       COUNT(*) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
ORDER BY 1
"""


@query("r61_ship_delay_by_month", oracle=_Q26_SQL, covers="T11,T13,J1")
def r61_ship_delay_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"))
        .agg(
            (F.sum(delay).cast("double") / F.count("*")).alias("avg_ship_delay_days"),
            F.min(delay).alias("min_delay"),
            F.max(delay).alias("max_delay"),
            F.count("*").alias("n_items"),
        )
        .orderBy("order_month")
    )


# ---------------------------------------------------------------------------
# Q28 — array ops + CCNet perplexity tiers, tagged union (round 7:
#        the tiers branch rotated INTO the driver window, ex-r32):
#        * 'array' branch — element/size ops over embeddings (T19);
#        * 'ppl_tier' branch — head/middle/tail by bigram-LM score with
#          boundaries from a DETERMINISTIC md5-sample calibration set
#          (never a global ranking — that is a single-partition sort at
#          100 TB); ties take the better tier. The oracle replays the
#          identical sample, nearest-rank cutoffs and tie rule.
# ---------------------------------------------------------------------------

_Q28_SQL = """
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
),
scored AS (
  SELECT doc_id, dl,
         list_reduce(list(lp ORDER BY bg), (a, x) -> a + x) / (dl - 1) AS logprob
  FROM per GROUP BY doc_id, dl
),
calib AS (
  SELECT * FROM scored
  WHERE CAST(('0x' || substr(md5('ppl' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        < CAST(0.2 * 4294967296.0 AS BIGINT)
),
ranked AS (
  SELECT logprob,
         row_number() OVER (ORDER BY logprob, doc_id) AS rn,
         COUNT(*) OVER () AS n
  FROM calib
),
cut AS (
  SELECT MAX(CASE WHEN rn = GREATEST(1, CEIL(0.3333333333333333 * n)) THEN logprob END) AS cut_lo,
         MAX(CASE WHEN rn = GREATEST(1, CEIL(0.6666666666666666 * n)) THEN logprob END) AS cut_hi
  FROM ranked
)
SELECT 'array' AS part, vec_id AS rid, CAST(label AS VARCHAR) AS label,
       len(embedding) AS dim,
       CAST(embedding[1] AS DOUBLE) AS v1,
       CAST(embedding[64] AS DOUBLE) AS v2,
       CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
         + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE) AS v3
FROM embeddings
UNION ALL
SELECT 'ppl_tier', s.doc_id,
       CASE WHEN s.logprob >= cut.cut_hi THEN 'head'
            WHEN s.logprob >= cut.cut_lo THEN 'middle'
            ELSE 'tail' END,
       s.dl, s.logprob, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM scored s, cut
ORDER BY part, rid
"""


@query("q28_array_tiers", oracle=_Q28_SQL, covers="T19,T18,A9,C5")
def q28_array_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import perplexity_tiers

    emb = load_table(spark, sf_dir, "embeddings")
    el = lambda i: F.element_at("embedding", i).cast("double")  # noqa: E731
    arr = emb.select(
        F.lit("array").alias("part"),
        F.col("vec_id").alias("rid"),
        F.col("label").cast("string").alias("label"),
        F.size("embedding").alias("dim"),
        el(1).alias("v1"),
        el(64).alias("v2"),
        (el(1) + el(2) + el(3) + el(4)).alias("v3"),
    )
    docs = load_table(spark, sf_dir, "documents")
    tiers = perplexity_tiers(docs, calib_fraction=0.2, salt="ppl").select(
        F.lit("ppl_tier").alias("part"),
        F.col("doc_id").alias("rid"),
        F.col("tier").alias("label"),
        F.col("dl").cast("int").alias("dim"),
        F.col("logprob").alias("v1"),
        F.lit(None).cast("double").alias("v2"),
        F.lit(None).cast("double").alias("v3"),
    )
    return arr.unionByName(tiers).orderBy("part", "rid")


# ---------------------------------------------------------------------------
# Q35 — row-assembly family, tagged union (merged round 6 to free a
#        driver-window slot for the BM25 query q03):
#        * 'article_json' branch — struct pack + to_json (P9, T9);
#          article-shaped projection (reference article dict
#          pipeline.py:33-38);
#        * 'zip_token' branch — positional zip / UDTF explode with index
#          (J8, U5); reference zip(docs, metas) by position
#          (pipeline.py:88).
# ---------------------------------------------------------------------------

_Q35_SQL = """
SELECT 'article_json' AS part, doc_id, CAST(NULL AS INTEGER) AS pos,
       CAST(to_json(struct_pack(doc_id := doc_id,
                                title := substr(text, 1, 40),
                                source := source,
                                lang := lang,
                                n_chars := n_chars)) AS VARCHAR) AS payload
FROM documents
UNION ALL
SELECT 'zip_token', doc_id,
       CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INTEGER),
       unnest(string_split(text, ' '))
FROM documents
WHERE doc_id < 3
ORDER BY part, doc_id, pos
"""


@query("q35_struct_to_json", oracle=_Q35_SQL, covers="P9,T3,T9,T14,J8,U5,T2")
def q35_struct_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    article = F.struct(
        F.col("doc_id").alias("doc_id"),
        F.substring("text", 1, 40).alias("title"),
        F.col("source").alias("source"),
        F.col("lang").alias("lang"),
        F.col("n_chars").alias("n_chars"),
    )
    article_b = docs.select(
        F.lit("article_json").alias("part"),
        "doc_id",
        F.lit(None).cast("int").alias("pos"),
        F.to_json(article).alias("payload"),
    )
    zip_b = (
        docs.filter(F.col("doc_id") < 3)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "payload"))
        .select(F.lit("zip_token").alias("part"), "doc_id", F.col("pos").cast("int"), "payload")
    )
    return article_b.unionByName(zip_b).orderBy("part", "doc_id", "pos")


# ---------------------------------------------------------------------------
# Q05 — TTS-style cleanup: dictionary replace + case/trim + length +
#        heading detect (T1, T5, T8, T10); reference format_replacements
#        (config.py:224-233), ordinal/abbreviation spoken-form expansion
#        (pipeline.py:238-258 evident intent), isupper/endswith(':')
#        heading rule (specialized_agents.py:194)
# ---------------------------------------------------------------------------

# The corpus has no ordinals/abbreviations, so the TTS pass runs over a
# synthesized per-doc announcer line: doc_id supplies varied ordinals
# ('0th'..'4999th', plus a literal '1st'), the reference's abbreviation
# set appears with both word-boundary hits and deliberate non-hits
# ('era' lowercase, 'scoreboard' containing 'RBI'-free chars) — both
# engines must transform it identically, character for character.
_TTS_SRC_SQL = (
    "('MLB recap: HR leaders, AL vs NL, game ' || CAST(doc_id AS VARCHAR)"
    " || 'th vs. the 1st in RBI era ERA stats')"
)

_Q05_SQL = f"""
WITH lined AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN upper(source) || ':' ELSE trim(substr(text, 1, 30)) END AS line,
         replace(replace(text, 'vector', 'VEC'), 'window', 'WIN') AS replaced,
         {tts_spoken_form_sql(_TTS_SRC_SQL)} AS tts
  FROM documents
)
SELECT (upper(line) = line AND line LIKE '%:') AS is_heading,
       COUNT(*) AS n_lines,
       CAST(SUM(length(replaced)) AS BIGINT) AS total_replaced_len,
       CAST(SUM(length(line)) AS BIGINT) AS total_line_len,
       CAST(SUM(length(tts)) AS BIGINT) AS total_tts_len,
       MIN(tts) AS sample_tts
FROM lined
GROUP BY 1
ORDER BY 1
"""


@query("q05_tts_cleanup", oracle=_Q05_SQL, covers="T1,T4,T5,T8,T10")
def q05_tts_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    line = F.when(F.col("doc_id") % 3 == 0, F.concat(F.upper("source"), F.lit(":"))).otherwise(
        F.trim(F.substring("text", 1, 30))
    )
    replaced = dict_replace("text", {"vector": "VEC", "window": "WIN"})
    tts_src = F.concat(
        F.lit("MLB recap: HR leaders, AL vs NL, game "),
        F.col("doc_id").cast("string"),
        F.lit("th vs. the 1st in RBI era ERA stats"),
    )
    lined = docs.select(
        "doc_id", line.alias("line"), replaced.alias("replaced"), tts_spoken_form(tts_src).alias("tts")
    )
    is_heading = (F.upper("line") == F.col("line")) & F.col("line").endswith(":")
    return (
        lined.select(is_heading.alias("is_heading"), "replaced", "line", "tts")
        .groupBy("is_heading")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.length("replaced")).cast("bigint").alias("total_replaced_len"),
            F.sum(F.length("line")).cast("bigint").alias("total_line_len"),
            F.sum(F.length("tts")).cast("bigint").alias("total_tts_len"),
            F.min("tts").alias("sample_tts"),
        )
        .orderBy("is_heading")
    )


# ---------------------------------------------------------------------------
# Q57 — current date/time (T12): banned from the hash contract by the
#        determinism policy, demonstrated as a rows-only query
# ---------------------------------------------------------------------------


@query("q57_current_date_age", oracle=None, covers="T12,T13")
def q57_current_date_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min(F.datediff(F.current_date(), F.col("o_orderdate"))).alias("min_age_days"),
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# R13 — BPE pair statistics (tokenizer training, operators/tokenize.py):
#        the first merge-selection pass, oracled end-to-end. The Spark
#        side counts over the word-FREQUENCY table (the 100 TB shape:
#        corpus collapses once, iterations never rescan it); the oracle
#        counts raw occurrences — identical by construction.
# ---------------------------------------------------------------------------

_R13_SQL = r"""
WITH w AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents
), p AS (
  SELECT substr(word, i, 1) AS left_sym, substr(word, i + 1, 1) AS right_sym
  FROM w, unnest(generate_series(1, length(word) - 1)) AS t(i)
  WHERE length(word) > 1
)
SELECT left_sym, right_sym, CAST(COUNT(*) AS BIGINT) AS cnt
FROM p
GROUP BY 1, 2
ORDER BY cnt DESC, left_sym, right_sym
LIMIT 30
"""


@query("r13_bpe_pair_stats", oracle=_R13_SQL, covers="tokenize:bpe,T17,A2,O1")
def r13_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent-character pairs over the corpus word table — the
    statistic BPE training maximizes each merge round."""
    from ..operators.tokenize import _init_symbols, pair_counts, word_freq_table

    docs = load_table(spark, sf_dir, "documents")
    sym = _init_symbols(word_freq_table(docs))
    return (
        pair_counts(sym)
        .select(
            F.col("left").alias("left_sym"),
            F.col("right").alias("right_sym"),
            "cnt",
        )
        .orderBy(F.col("cnt").desc(), "left_sym", "right_sym")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# R17 — Unicode NFC normalization, oracled against DuckDB's
#        nfc_normalize(): decomposed combining marks are injected
#        deterministically on BOTH sides (replace 'e' -> e+U+0301), so
#        the normalizer's output hashes must agree bit-for-bit.
# ---------------------------------------------------------------------------

_R17_SQL = """
WITH d AS (
  SELECT doc_id, replace(text, 'e', 'e' || chr(769)) AS decomposed
  FROM documents WHERE doc_id < 300
)
SELECT doc_id,
       CAST(length(decomposed) AS BIGINT) AS len_decomposed,
       CAST(length(nfc_normalize(decomposed)) AS BIGINT) AS len_nfc,
       md5(nfc_normalize(decomposed)) AS nfc_md5
FROM d
ORDER BY doc_id
"""


@query("r17_nfc_normalize", oracle=_R17_SQL, covers="T1,U2,text:unicode")
def r17_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC-normalize deterministically decomposed text and hash the
    result — a normalizer defect (wrong form, dropped marks, locale
    drift) is a hash mismatch against DuckDB's ICU-backed
    nfc_normalize."""
    from ..functions.textfn import nfc_normalize

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    # DECOMPOSED form (e + combining acute), mirroring the oracle's
    # 'e' || chr(769) — an explicit escape so editors can't precompose it
    dec = F.replace(F.col("text"), F.lit("e"), F.lit("e\u0301"))
    return (
        docs.select("doc_id", dec.alias("decomposed"))
        .select(
            "doc_id",
            F.length("decomposed").cast("bigint").alias("len_decomposed"),
            F.length(nfc_normalize(F.col("decomposed"))).cast("bigint").alias("len_nfc"),
            F.md5(nfc_normalize(F.col("decomposed")).cast("binary")).alias("nfc_md5"),
        )
        .orderBy("doc_id")
    )
