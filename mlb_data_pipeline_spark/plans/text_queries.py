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
# Q03 — positional zip / UDTF explode with index (J8, U5); reference
#        zip(docs, metas) by position (pipeline.py:88)
# ---------------------------------------------------------------------------

_Q03_SQL = """
SELECT doc_id,
       generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
       unnest(string_split(text, ' ')) AS token
FROM documents
WHERE doc_id < 3
ORDER BY doc_id, pos
"""


@query("q03_positional_zip", oracle=_Q03_SQL, covers="J8,U5,T2")
def q03_positional_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 3)
    return docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")).orderBy(
        "doc_id", "pos"
    )


# ---------------------------------------------------------------------------
# Q24 — tokenize + explode + top token counts (T2, T7, U5)
# ---------------------------------------------------------------------------

_Q24_SQL = """
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT 30
"""


@query("q24_top_tokens", oracle=_Q24_SQL, covers="T2,T7,U5,A2", bench=True)
def q24_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# Q25 — regexp_extract structured field (T6, T4)
# ---------------------------------------------------------------------------

_Q25_SQL = """
SELECT lang, regexp_extract(text, '(spark|vector|window)', 1) AS keyword, COUNT(*) AS n
FROM documents
WHERE regexp_matches(text, '(spark|vector|window)')
GROUP BY lang, keyword
ORDER BY lang, keyword
"""


@query("q25_extract_keyword", oracle=_Q25_SQL, covers="P5,T6,T4")
def q25_extract_keyword(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").rlike("(spark|vector|window)"))
        .select("lang", F.regexp_extract("text", "(spark|vector|window)", 1).alias("keyword"))
        .groupBy("lang", "keyword")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "keyword")
    )


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


@query("q26_ship_delay_by_month", oracle=_Q26_SQL, covers="T11,T13,J1")
def q26_ship_delay_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
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
# Q27 — from_json over events.props (T14); reference json.dumps/loads
#        (pipeline.py:46, utils.py:21-24)
# ---------------------------------------------------------------------------

_Q27_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
ORDER BY 1
"""


@query("q27_json_props_bucket", oracle=_Q27_SQL, covers="T14,A2")
def q27_json_props_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return (
        events.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("total_value"),
        )
        .orderBy("k_bucket")
    )


# ---------------------------------------------------------------------------
# Q28 — array ops over embeddings (T19)
# ---------------------------------------------------------------------------

_Q28_SQL = """
SELECT vec_id, label,
       len(embedding) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_val,
       CAST(embedding[64] AS DOUBLE) AS last_val,
       CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
         + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE) AS head_sum
FROM embeddings
ORDER BY vec_id
"""


@query("q28_array_ops", oracle=_Q28_SQL, covers="T19")
def q28_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    el = lambda i: F.element_at("embedding", i).cast("double")  # noqa: E731
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        el(1).alias("first_val"),
        el(64).alias("last_val"),
        (el(1) + el(2) + el(3) + el(4)).alias("head_sum"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Q31 — weighted score via literal map (A10, T20); reference topic_weights
#        (config.py:166-174)
# ---------------------------------------------------------------------------

_WEIGHTS = {"click": 1.0, "view": 0.5, "purchase": 5.0, "signup": 2.0, "error": 0.0}

_Q31_SQL = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       CAST(ROUND(SUM(CAST(value * (CASE event_type
              WHEN 'click' THEN 1.0 WHEN 'view' THEN 0.5 WHEN 'purchase' THEN 5.0
              WHEN 'signup' THEN 2.0 WHEN 'error' THEN 0.0 END) AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS weighted_score,
       COUNT(*) AS n_events
FROM events
GROUP BY 1
ORDER BY 1
"""


@query("q31_weighted_score", oracle=_Q31_SQL, covers="A10,T20")
def q31_weighted_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    weights = F.create_map(*[F.lit(x) for kv in _WEIGHTS.items() for x in kv])
    weighted = (F.col("value") * weights.getItem(F.col("event_type"))).cast("decimal(18,6)")
    return (
        events.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.round(F.sum(weighted), 2).cast("double").alias("weighted_score"),
            F.count("*").alias("n_events"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Q35 — struct pack + to_json (P9, T9); article-shaped projection
#        (reference article dict pipeline.py:33-38)
# ---------------------------------------------------------------------------

_Q35_SQL = """
SELECT doc_id,
       to_json(struct_pack(doc_id := doc_id,
                           title := substr(text, 1, 40),
                           source := source,
                           lang := lang,
                           n_chars := n_chars)) AS article_json
FROM documents
ORDER BY doc_id
"""


@query("q35_struct_to_json", oracle=_Q35_SQL, covers="P9,T3,T9,T14")
def q35_struct_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    article = F.struct(
        F.col("doc_id").alias("doc_id"),
        F.substring("text", 1, 40).alias("title"),
        F.col("source").alias("source"),
        F.col("lang").alias("lang"),
        F.col("n_chars").alias("n_chars"),
    )
    return docs.select("doc_id", F.to_json(article).alias("article_json")).orderBy("doc_id")


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
