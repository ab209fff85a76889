"""Reference-shaped fixture queries: MLB game-log analytics + config-driven
weighting.

q48 runs the reference's implied team-performance dashboard (home/away
run-differential splits off hw5/gl2024.csv fields 10-11 joined to
hw5/teams.csv) end-to-end through the S1 CSV reader on a canned
reference-shaped game log. q49 expresses the reference's config-driven
scoring (topic_weights config.py:166-174, priority_teams config.py:177-183)
over the documents corpus. Both are fully oracled: the oracle recomputes
the same semantics in DuckDB from a VALUES copy of the canned log (q48) /
the same CASE tables (q49) — an independent computation path, not a
golden-output echo.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import dec
from ..sources.readers import read_csv
from ..sources.schemas import GAME_LOGS, TEAMS
from .registry import query

_SCRATCH = "/tmp/spark_graft_fixtures"

# 12 canned games over 6 teams — the hw5/gl2024.csv analytic-subset shape
# (headerless, yyyyMMdd dates, fields: date, game_num, dow, vteam, vleague,
# hteam, hleague, vscore, hscore, outs, day/night, park, attendance,
# duration, vhits, hhits, verrors, herrors, wpitcher, lpitcher)
_LEAGUE = {"NYA": "A", "BOS": "A", "HOU": "A", "LAN": "N", "CHN": "N", "SDN": "N"}
_NICK = {
    "NYA": "Yankees", "BOS": "Red Sox", "HOU": "Astros",
    "LAN": "Dodgers", "CHN": "Cubs", "SDN": "Padres",
}
_GAMES = [
    # (yyyymmdd, dow, vteam, hteam, vscore, hscore)
    ("20240328", "Thu", "NYA", "BOS", 5, 4),
    ("20240328", "Thu", "LAN", "CHN", 2, 7),
    ("20240329", "Fri", "HOU", "SDN", 3, 2),
    ("20240330", "Sat", "BOS", "NYA", 6, 1),
    ("20240330", "Sat", "CHN", "LAN", 0, 4),
    ("20240331", "Sun", "SDN", "HOU", 9, 8),
    ("20240401", "Mon", "NYA", "LAN", 2, 3),
    ("20240402", "Tue", "BOS", "CHN", 5, 3),
    ("20240403", "Wed", "HOU", "NYA", 4, 6),
    ("20240404", "Thu", "SDN", "BOS", 1, 2),
    ("20240405", "Fri", "LAN", "HOU", 7, 2),
    ("20240406", "Sat", "CHN", "SDN", 3, 4),
]


def _game_log_csv() -> str:
    lines = []
    for i, (d, dow, vt, ht, vs, hs) in enumerate(_GAMES):
        lines.append(
            f'"{d}",0,"{dow}","{vt}","{_LEAGUE[vt]}","{ht}","{_LEAGUE[ht]}",{vs},{hs},'
            f'54,"N","PRK{100 + i}",30000,165,{vs + 4},{hs + 4},0,1,"pitch{i:03d}","pitch{i + 100:03d}"'
        )
    return "\n".join(lines) + "\n"


def _teams_csv() -> str:
    return "\n".join(f"{t},{_LEAGUE[t]},City{t},{_NICK[t]}" for t in sorted(_NICK)) + "\n"


def _values(rows) -> str:
    return ", ".join("(" + ", ".join(repr(v) if isinstance(v, str) else str(v) for v in r) + ")" for r in rows)


_Q48_SQL = f"""
WITH gl(visiting_team, home_team, visiting_score, home_score) AS (VALUES
  {_values([(vt, ht, vs, hs) for _, _, vt, ht, vs, hs in _GAMES])}
),
teams(team_id, nickname) AS (VALUES
  {_values(sorted(_NICK.items()))}
),
sides AS (
  SELECT home_team AS team_id, 'home' AS side, home_score AS rf, visiting_score AS ra FROM gl
  UNION ALL
  SELECT visiting_team AS team_id, 'away' AS side, visiting_score AS rf, home_score AS ra FROM gl
)
SELECT s.team_id, t.nickname, s.side,
       COUNT(*) AS n_games,
       CAST(SUM(CASE WHEN s.rf > s.ra THEN 1 ELSE 0 END) AS BIGINT) AS n_wins,
       CAST(SUM(s.rf) AS BIGINT) AS runs_for,
       CAST(SUM(s.ra) AS BIGINT) AS runs_against,
       CAST(SUM(s.rf - s.ra) AS BIGINT) AS run_diff
FROM sides s JOIN teams t ON s.team_id = t.team_id
GROUP BY 1, 2, 3
ORDER BY 1, 3
"""


@query("q48_game_team_splits", oracle=_Q48_SQL, covers="S1,J2,A2,A8,O7,T16")
def q48_game_team_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-shaped end-to-end: write the canned hw5-format game log +
    teams dimension as CSV, ingest both through the S1 explicit-schema
    reader (yyyyMMdd dates, headerless — hw5/gl2024.csv, hw5/teams.csv),
    then compute the home/away run-differential splits the reference's
    dashboard implies (gl2024.csv fields 10-11). Teams is a fixed-size
    dim -> forced broadcast; the log side scales and never shuffles
    until the (team, side) aggregate."""
    base = os.path.join(_SCRATCH, os.path.basename(sf_dir.rstrip("/")))
    gl_path, teams_path = os.path.join(base, "game_logs_csv"), os.path.join(base, "teams_csv")
    os.makedirs(gl_path, exist_ok=True)
    os.makedirs(teams_path, exist_ok=True)
    with open(os.path.join(gl_path, "gl.csv"), "w") as f:
        f.write(_game_log_csv())
    with open(os.path.join(teams_path, "teams.csv"), "w") as f:
        f.write(_teams_csv())

    gl = read_csv(spark, gl_path, GAME_LOGS, header=False, date_format="yyyyMMdd")
    teams = read_csv(spark, teams_path, TEAMS, header=False).select("team_id", "nickname")

    home = gl.select(
        F.col("home_team").alias("team_id"),
        F.lit("home").alias("side"),
        F.col("home_score").alias("rf"),
        F.col("visiting_score").alias("ra"),
    )
    away = gl.select(
        F.col("visiting_team").alias("team_id"),
        F.lit("away").alias("side"),
        F.col("visiting_score").alias("rf"),
        F.col("home_score").alias("ra"),
    )
    return (
        home.unionByName(away)
        .join(F.broadcast(teams), "team_id")
        .groupBy("team_id", "nickname", "side")
        .agg(
            F.count("*").alias("n_games"),
            F.sum(F.when(F.col("rf") > F.col("ra"), 1).otherwise(0)).cast("bigint").alias("n_wins"),
            F.sum("rf").cast("bigint").alias("runs_for"),
            F.sum("ra").cast("bigint").alias("runs_against"),
            F.sum(F.col("rf") - F.col("ra")).cast("bigint").alias("run_diff"),
        )
        .orderBy("team_id", "side")
    )


# ---------------------------------------------------------------------------
# Q49 — config-driven weighted topic scoring (topic_weights +
#        priority list, config.py:166-183) over the documents corpus
# ---------------------------------------------------------------------------

_TOPIC_WEIGHTS = {"spark": 1.5, "vector": 2.0, "window": 1.25, "join": 1.75, "shuffle": 1.5, "general": 0.5}
_PRIORITY_SOURCES = ["src0", "src1", "src2"]
_EVENT_WEIGHTS = {"click": 1.0, "view": 0.5, "purchase": 5.0, "signup": 2.0, "error": 0.0}

_TOPIC_CASE = "CASE topic " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _TOPIC_WEIGHTS.items()
) + " END"

_Q49_SQL = f"""
WITH topics AS (
  SELECT CASE WHEN regexp_matches(text, '(spark|vector|window|join|shuffle)')
              THEN regexp_extract(text, '(spark|vector|window|join|shuffle)', 1)
              ELSE 'general' END AS topic,
         source IN ({", ".join(repr(s) for s in _PRIORITY_SOURCES)}) AS priority
  FROM documents
)
SELECT 'topic_weights' AS part, topic AS key, priority, COUNT(*) AS n_docs,
       CAST(ROUND(SUM(CAST(({_TOPIC_CASE}) * (CASE WHEN priority THEN 2.0 ELSE 1.0 END)
                           AS DECIMAL(18,6))), 2) AS DOUBLE) AS score
FROM topics
GROUP BY 2, 3
UNION ALL
SELECT 'weighted_day',
       CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR),
       CAST(NULL AS BOOLEAN),
       COUNT(*),
       CAST(ROUND(SUM(CAST(value * (CASE event_type
              WHEN 'click' THEN 1.0 WHEN 'view' THEN 0.5 WHEN 'purchase' THEN 5.0
              WHEN 'signup' THEN 2.0 WHEN 'error' THEN 0.0 END) AS DECIMAL(18,6))), 2) AS DOUBLE)
FROM events
GROUP BY 2
UNION ALL
SELECT 'json_bucket',
       CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS VARCHAR),
       CAST(NULL AS BOOLEAN),
       COUNT(*),
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
FROM events
GROUP BY 2
ORDER BY part, key, priority
"""


@query("q49_config_topic_weights", oracle=_Q49_SQL, covers="A10,T20,T4,T6,T14,A2")
def q49_config_topic_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config-driven scoring family, tagged union (round 7 merges the
    former q31 event-scoring branches in, freeing that window slot for
    the winnowing query):

    * 'topic_weights' — the reference's topic_weights map
      (config.py:166-174) as a literal-map lookup plus the
      priority-list boost (config.py:177-183) as set membership; the
      corpus never shuffles until the (topic, priority) aggregate.
    * 'weighted_day' — per-day weighted event score via the same
      literal-map device (A10/T20).
    * 'json_bucket' — from_json over events.props (T14), bucketed sums.

    All weighted sums run in the decimal domain per the determinism
    contract."""
    docs = load_table(spark, sf_dir, "documents")
    topic_re = "(spark|vector|window|join|shuffle)"
    topic = F.when(
        F.col("text").rlike(topic_re), F.regexp_extract("text", topic_re, 1)
    ).otherwise(F.lit("general"))
    weights = F.create_map(*[F.lit(x) for kv in _TOPIC_WEIGHTS.items() for x in kv])
    priority = F.col("source").isin(*_PRIORITY_SOURCES)
    scored = docs.select(
        topic.alias("key"),
        priority.alias("priority"),
    ).withColumn(
        "w",
        (weights.getItem(F.col("key")) * F.when(F.col("priority"), 2.0).otherwise(1.0)).cast("decimal(18,6)"),
    )
    topics_b = (
        scored.groupBy("key", "priority")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum("w"), 2).cast("double").alias("score"),
        )
        .select(F.lit("topic_weights").alias("part"), "key", "priority", "n_docs", "score")
    )
    events = load_table(spark, sf_dir, "events")
    ev_weights = F.create_map(*[F.lit(x) for kv in _EVENT_WEIGHTS.items() for x in kv])
    weighted = (F.col("value") * ev_weights.getItem(F.col("event_type"))).cast("decimal(18,6)")
    null_prio = F.lit(None).cast("boolean").alias("priority")
    day_b = (
        events.groupBy(F.date_trunc("day", "ts").cast("date").cast("string").alias("key"))
        .agg(F.count("*").alias("n_docs"), F.round(F.sum(weighted), 2).cast("double").alias("score"))
        .select(F.lit("weighted_day").alias("part"), "key", null_prio, "n_docs", "score")
    )
    k = F.from_json("props", "k INT").getField("k")
    json_b = (
        events.groupBy((k % 10).cast("string").alias("key"))
        .agg(F.count("*").alias("n_docs"), F.round(F.sum(dec("value")), 2).cast("double").alias("score"))
        .select(F.lit("json_bucket").alias("part"), "key", null_prio, "n_docs", "score")
    )
    return topics_b.unionByName(day_b).unionByName(json_b).orderBy("part", "key", "priority")