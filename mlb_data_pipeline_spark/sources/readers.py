"""Sources (SURVEY §2.1 S1-S7).

Every reader takes an EXPLICIT schema — the engine never uses
``inferSchema`` (the reference does, hw5/load_csv.py:16, costing a full
extra pass and risking type drift across files). With a declared schema
a CSV/JSON scan is one pass and Catalyst pushes filters and column
pruning into it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import SCHEDULE_PAYLOAD


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    date_format: str | None = None,
    **options,
) -> DataFrame:
    """S1: CSV scan. Handles the reference's quirks: headerless files
    (hw5/teams.csv), quoted numerics and embedded commas in headers
    (hw5/player_stats_2024.csv:1), compact ``yyyyMMdd`` dates
    (hw5/gl2024.csv field 1) via ``date_format``."""
    reader = spark.read.schema(schema).option("header", str(header).lower()).option("quote", '"').option(
        "escape", '"'
    )
    if date_format:
        reader = reader.option("dateFormat", date_format)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType, multi_line: bool = False, **options) -> DataFrame:
    """S2: JSON scan. ``multi_line=True`` for whole-file JSON arrays —
    the reference's storage unit (one array per day, pipeline.py:40-49)."""
    reader = spark.read.schema(schema).option("multiLine", str(multi_line).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S3: parquet scan (footer schema; row-group stats pushdown)."""
    return spark.read.parquet(path)


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """S3 variant for tables whose schema GREW over time: merge the
    schemas of every file under ``path`` (columns added by later
    batches read as NULL in earlier files) instead of trusting one
    random footer — the lake reality for any dataset ingested over
    months. Spark's default picks a single file's footer, so whether
    the new column exists at all would depend on which file wins.

    Cost note for 100 TB: mergeSchema reads every file footer at
    planning time (a driver-side listing + distributed footer read).
    Turn it on for EVOLVING tables, not as a session default
    (spark.sql.parquet.mergeSchema); once a table's schema is settled,
    pin it with an explicit .schema() and keep planning O(1)."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def parse_schedule_payloads(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """S4/T14 read side: nested API JSON -> relational rows.

    The reference stores the schedule payload verbatim and never parses
    it (mlb_schedule_to_gcs.py:51-62); here ``from_json`` with the
    explicit nested schema + a double explode flattens
    ``dates[].games[]`` into one row per game. All JVM-side."""
    parsed = raw.select(F.from_json(F.col(payload_col), SCHEDULE_PAYLOAD).alias("p"))
    return (
        parsed.select(F.explode("p.dates").alias("d"))
        .select(F.col("d.date").alias("game_day"), F.explode("d.games").alias("g"))
        .select(
            "game_day",
            F.col("g.gamePk").alias("game_pk"),
            F.to_timestamp("g.gameDate").alias("game_ts"),
            F.col("g.teams.away.team.name").alias("away_team"),
            F.col("g.teams.away.score").alias("away_score"),
            F.col("g.teams.home.team.name").alias("home_team"),
            F.col("g.teams.home.score").alias("home_score"),
            F.col("g.venue.name").alias("venue"),
            F.col("g.status.detailedState").alias("status"),
        )
    )


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    raw_col: str = "raw_record",
) -> tuple[DataFrame, DataFrame]:
    """S2 hardened: JSON-lines ingestion that SPLITS instead of
    silently nulling — returns ``(valid, quarantine)``.

    A scraping pipeline's daily drop (the reference appends whole-file
    JSON per day, pipeline.py:40-49, and trusts it blind) always
    eventually contains a truncated or malformed record; PERMISSIVE
    parsing turns those into all-null rows that poison downstream aggs,
    and FAILFAST kills the whole batch for one bad line. This reader
    parses the file as text + ``from_json`` — sidestepping Spark's
    restriction on referencing only the internal corrupt-record column —
    and routes each line to exactly one side:

    * ``valid``: lines whose ``from_json`` struct parsed (schema fields
      may still be null where the record omits them — that is data, not
      corruption);
    * ``quarantine``: non-blank lines that failed to parse, preserved
      VERBATIM in ``raw_col`` for replay after a parser fix (pair with
      the S9 binary/file sink or S10 JSON sink).

    Both sides derive from the same lazy text scan; a daily delta reads
    at most twice (once per materialized side), never the corpus. All
    parsing is JVM-side ``from_json`` — no Python in the path.
    """
    # PERMISSIVE from_json yields an all-null struct (not NULL) for a
    # malformed line, so corruption is detected via an explicit
    # corrupt-record field: populated verbatim on parse failure, null on
    # success. Because the source is a text scan, this sidesteps the
    # engine restriction on queries that reference only the internal
    # corrupt column of a JSON file source.
    corrupt_field = "__corrupt"
    if corrupt_field in schema.fieldNames():
        raise ValueError(f"schema may not contain {corrupt_field!r}")
    # StructType.add mutates in place — never extend the caller's schema
    parse_schema = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_field, T.StringType())]
    )
    raw = spark.read.text(path)
    parsed = raw.select(
        F.col("value").alias(raw_col),
        F.from_json(
            F.col("value"),
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_field},
        ).alias("__rec"),
    )
    ok = F.col(f"__rec.{corrupt_field}").isNull() & F.col("__rec").isNotNull()
    valid = parsed.filter(ok).select(
        *[F.col(f"__rec.{f}").alias(f) for f in schema.fieldNames()]
    )
    quarantine = parsed.filter(
        (~ok) & (F.trim(F.col(raw_col)) != "")
    ).select(raw_col)
    return valid, quarantine
