"""Streaming batch-equivalents — SURVEY §2.10 Q32-Q34 (ST2/ST4/ST6).

The reference is a daily incremental batch pipeline (Airflow cron,
mlb_pipeline_dag.py:39, catchup=False :40) — i.e. tumbling 24 h windows
with latest-only semantics and idempotent keyed upserts (pipeline.py:69).
Here the same windowing semantics are declared over the static ``events``
table in DuckDB-expressible form; the engine-side Structured Streaming
formulations (readStream + window/session_window/dropDuplicates with
watermarks) live in ``streaming/jobs.py`` and are asserted equal to these
batch results in tests/test_streaming.py (SURVEY §5.2.5).

Gap arithmetic uses exact epoch microseconds (unix_micros / epoch_us) —
no double truncation ambiguity between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import dec
from .registry import query

# ---------------------------------------------------------------------------
# Q32 — tumbling 1h window counts per event_type (ST2 batch form)
# ---------------------------------------------------------------------------

_Q32_SQL = """
SELECT date_trunc('hour', ts) AS win_start, event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("q32_tumbling_hourly", oracle=_Q32_SQL, covers="ST2,A2,T11", bench=True)
def q32_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_trunc("hour", "ts").alias("win_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("total_value"),
        )
        .orderBy("win_start", "event_type")
    )


# ---------------------------------------------------------------------------
# Q33 — gap-based sessionization, 30 min (ST4 batch form)
# ---------------------------------------------------------------------------

_Q33_SQL = """
WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
), marked AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
  FROM ordered
), sessions AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id,
         ts_us
  FROM marked
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         FLOOR((MAX(ts_us) - MIN(ts_us)) / 1000000) AS dur_sec
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n_events) AS BIGINT) AS n_events,
       MAX(n_events) AS max_session_events,
       CAST(MAX(dur_sec) AS BIGINT) AS max_session_dur_sec
FROM per_session
GROUP BY user_id
ORDER BY user_id
"""


@query("q33_sessionization", oracle=_Q33_SQL, covers="ST4,O5,O6", bench=True)
def q33_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lag -> new-session flag -> running-sum session id: two window passes
    # over ONE shuffle of the user key (same partitioning, Catalyst reuses
    # the exchange). State per user is a scalar, so skewed users cost
    # sort time, not memory.
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w_order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_run = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    sessions = (
        events.withColumn("prev_us", F.lag("ts_us").over(w_order))
        .withColumn(
            "new_session",
            F.when(F.col("prev_us").isNull() | (F.col("ts_us") - F.col("prev_us") > 1_800_000_000), 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(w_run))
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        # floor, not cast: DuckDB's double->BIGINT cast rounds while
        # Spark's truncates — floor on both sides is engine-neutral
        F.floor((F.max("ts_us") - F.min("ts_us")) / 1_000_000).alias("dur_sec"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
            F.max("dur_sec").cast("bigint").alias("max_session_dur_sec"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Q41 — sliding 1h window / 15min slide counts (ST3 batch form)
# ---------------------------------------------------------------------------

_Q41_SQL = """
WITH e AS (SELECT epoch_us(ts) AS us, event_type FROM events),
w AS (
  SELECT make_timestamp((us // 900000000) * 900000000 - CAST(k.k AS BIGINT) * 900000000) AS win_start,
         event_type
  FROM e, (SELECT unnest([0, 1, 2, 3]) AS k) k
),
unioned AS (
  SELECT event_id, ts, event_type FROM events
  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
  UNION ALL
  SELECT event_id, ts, event_type FROM events
  WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-02-15'
),
deduped AS (
  SELECT event_id, event_type
  FROM (SELECT event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, event_type) AS rn
        FROM unioned)
  WHERE rn = 1
)
SELECT 'sliding' AS part, win_start, event_type, COUNT(*) AS n_events
FROM w
GROUP BY 2, 3
UNION ALL
SELECT 'stream_dedup', CAST(NULL AS TIMESTAMP), event_type, COUNT(*)
FROM deduped
GROUP BY 3
ORDER BY part, win_start, event_type
"""


@query("q41_sliding_window", oracle=_Q41_SQL, covers="ST3,ST6,O7,A3,A2,T11")
def q41_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window counts: every event lands in exactly window/slide =
    4 overlapping epoch-aligned windows. Spark's ``F.window`` explodes to
    the same 4 window starts the oracle derives with exact integer
    microsecond arithmetic (floor-to-slide minus k slides) — no float
    time math on either side. The streaming form of the same window spec
    runs in streaming/jobs.py (tests assert each event is counted 4x)."""
    # Windowed-events family, tagged union (round 7 merges the former
    # q34 stream-dedup branch in, freeing that window slot for PageRank).
    events = load_table(spark, sf_dir, "events")
    sliding = (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.lit("sliding").alias("part"),
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
        )
    )
    ev = events.select("event_id", "ts", "event_type")
    s1 = ev.filter((F.col("ts") >= F.lit("2024-01-01")) & (F.col("ts") < F.lit("2024-02-01")))
    s2 = ev.filter((F.col("ts") >= F.lit("2024-01-15")) & (F.col("ts") < F.lit("2024-02-15")))
    w = Window.partitionBy("event_id").orderBy("ts", "event_type")
    deduped = s1.unionByName(s2).withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    dedup_b = (
        deduped.groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.lit("stream_dedup").alias("part"),
            F.lit(None).cast("timestamp").alias("win_start"),
            "event_type",
            "n_events",
        )
    )
    return sliding.unionByName(dedup_b).orderBy("part", "win_start", "event_type")


# ---------------------------------------------------------------------------
# R20 — time-series resample to OHLC bars (the downsampling pass a
#        metrics/feature pipeline runs before modeling): open/close via
#        min_by/max_by on a UNIQUE BIGINT order key (epoch micros
#        composed with event_id — timestamp ties would otherwise make
#        open/close nondeterministic), high/low/volume as plain aggs.
# ---------------------------------------------------------------------------

_R20_SQL = """
WITH e AS (
  SELECT event_type,
         make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS bar_start,
         epoch_us(ts) * 1000 + event_id % 1000 AS ord,
         value
  FROM events
)
SELECT event_type, bar_start,
       arg_min(value, ord) AS open,
       arg_max(value, ord) AS close,
       CAST(ROUND(MAX(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS high,
       CAST(ROUND(MIN(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS low,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS volume
FROM e
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("r20_ohlc_resample", oracle=_R20_SQL, covers="A2,T11,O5")
def r20_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type. min_by/max_by pick open/close
    by a composed unique BIGINT (no window, no sort — one combinable
    agg); money math in the decimal domain."""
    events = load_table(spark, sf_dir, "events")
    ord_key = (
        F.unix_micros("ts") * F.lit(1000) + F.col("event_id") % F.lit(1000)
    )
    e = events.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bar_start"),
        ord_key.alias("ord"),
        "value",
    )
    return (
        e.groupBy("event_type", "bar_start")
        .agg(
            F.min_by("value", "ord").alias("open"),
            F.max_by("value", "ord").alias("close"),
            F.round(F.max(dec("value")), 2).cast("double").alias("high"),
            F.round(F.min(dec("value")), 2).cast("double").alias("low"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("volume"),
        )
        .orderBy("event_type", "bar_start")
    )


# ---------------------------------------------------------------------------
# R21 — ordered-funnel analysis: users progressing view -> click ->
#        purchase IN ORDER, each step strictly after the previous
#        step's first occurrence AND within a 1-day conversion window
#        (without the window every user on this dense data completes
#        the funnel and the steps verify nothing). Two grouped mins +
#        two equi-joins — no per-user sort; counts are exact integers.
# ---------------------------------------------------------------------------

_R21_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 1 DAY
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 1 DAY
  GROUP BY e.user_id
)
SELECT step, n_users FROM (
  SELECT 1 AS step_ord, 'view' AS step, COUNT(*) AS n_users FROM v
  UNION ALL
  SELECT 2, 'view>click', COUNT(*) FROM c
  UNION ALL
  SELECT 3, 'view>click>purchase', COUNT(*) FROM p
) ORDER BY step_ord
"""


@query("r21_funnel_steps", oracle=_R21_SQL, covers="A2,J4,O7")
def r21_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    def first_after(etype: str, prev, prev_t: str, out_t: str):
        e = events.filter(F.col("event_type") == etype)
        if prev is None:
            return e.groupBy("user_id").agg(F.min("ts").alias(out_t))
        return (
            e.join(prev, "user_id")
            .filter(
                (F.col("ts") > F.col(prev_t))
                & (F.col("ts") <= F.col(prev_t) + F.expr("INTERVAL 1 DAY"))
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_t))
        )

    v = first_after("view", None, "", "t1")
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c, "t2", "t3")
    count = lambda df, tag: df.agg(F.count(F.lit(1)).alias("n_users")).select(  # noqa: E731
        F.lit(tag).alias("step"), "n_users"
    )
    return (
        count(v, "view")
        .unionByName(count(c, "view>click"))
        .unionByName(count(p, "view>click>purchase"))
    )


# ---------------------------------------------------------------------------
# R22 — cohort retention matrix: users bucketed by first-seen month,
#        counted per months-since-cohort. Month distance is integer
#        year*12+month arithmetic — no date subtraction semantics to
#        disagree on. Two grouped passes + one equi-join.
# ---------------------------------------------------------------------------

_R22_SQL = """
WITH f AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT e.user_id,
         CAST(date_trunc('month', f.first_ts) AS DATE) AS cohort_month,
         (year(e.ts) * 12 + month(e.ts))
           - (year(f.first_ts) * 12 + month(f.first_ts)) AS months_since
  FROM events e JOIN f ON e.user_id = f.user_id
)
SELECT cohort_month, months_since, COUNT(*) AS n_users
FROM act
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("r22_cohort_retention", oracle=_R22_SQL, covers="A2,A3,J1,T11")
def r22_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    f = events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    mo = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    act = (
        events.join(f, "user_id")
        .select(
            "user_id",
            F.date_trunc("month", "first_ts").cast("date").alias("cohort_month"),
            (mo(F.col("ts")) - mo(F.col("first_ts"))).alias("months_since"),
        )
        .distinct()
    )
    return (
        act.groupBy("cohort_month", "months_since")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_month", "months_since")
    )


# ---------------------------------------------------------------------------
# Q26 (ex-r58, rotated into the driver window round 10) — native
#        session_window batch aggregation: Spark's
#        built-in session assignment cross-validated against the
#        classic gap-rule SQL (new session when the gap to the
#        previous event exceeds 30 minutes; session end = last event
#        + gap, Spark's convention). Pins the ENGINE API itself — if
#        session_window's semantics ever drift from the documented
#        rule, the hash breaks. The break rule is strictly > (not >=):
#        measured on Spark 4.1.2, an event arriving EXACTLY gap-width
#        after the previous one MERGES into the session (new window
#        start == current session end still merges) — boundary pinned
#        in tests/test_streaming.py with an exact-1800s pair on both
#        engines.
# ---------------------------------------------------------------------------

_R58_BODY = """
WITH e AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
),
s AS (
  SELECT user_id, ts, value,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM e
)
SELECT 'fixed' AS part, user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM s
GROUP BY user_id, sid
"""

_R66_BODY = """
WITH e AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         CASE WHEN event_type = 'view' THEN 1800000000 ELSE 600000000 END AS gap_us
  FROM events
),
w AS (
  SELECT *,
         MAX(us + gap_us) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_end
  FROM e
),
m AS (
  SELECT *, CASE WHEN max_end IS NULL OR us > max_end THEN 1 ELSE 0 END AS brk
  FROM w
),
s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM m
)
SELECT 'dynamic' AS part, user_id,
       make_timestamp(MIN(us)) AS session_start,
       make_timestamp(MAX(us + gap_us)) AS session_end,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM s
GROUP BY user_id, sid
"""

_Q26_SQL = (
    "SELECT * FROM (\n"
    + _R58_BODY
    + ")\nUNION ALL\nSELECT * FROM (\n"
    + _R66_BODY
    + ")\nORDER BY part, user_id, session_start"
)


@query("q26_session_window", oracle=_Q26_SQL, covers="ST4,A2,T11")
def q26_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window family, tagged union (round 11: the dynamic-gap
    form r66 rotated INTO the driver window as the 'dynamic' branch —
    VERDICT r10 ask #3):
    * 'fixed' — native session_window with a constant 30-minute gap,
      cross-validated against the classic LAG gap-rule SQL (ex-r58);
    * 'dynamic' — per-event gap ('view' keeps attention 30 min,
      anything else 10 min), where merge semantics are transitive
      interval-chaining: the faithful twin breaks when an event starts
      strictly after the RUNNING MAX of prior window ends (ex-r66).
    Both branches pin the ENGINE API bit-for-bit; the exactly-gap-width
    boundary (equality MERGES on Spark 4.1.2) is pinned on both engines
    in tests/test_streaming.py."""
    from ..functions.numeric import dsum

    events = load_table(spark, sf_dir, "events")

    def sessions(gap, tag: str) -> DataFrame:
        return (
            events.groupBy("user_id", F.session_window("ts", gap))
            .agg(
                F.count("*").alias("n_events"),
                dsum("value").alias("total_value"),
            )
            .select(
                F.lit(tag).alias("part"),
                "user_id",
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events",
                "total_value",
            )
        )

    dyn_gap = F.when(F.col("event_type") == "view", F.lit("30 minutes")).otherwise(
        F.lit("10 minutes")
    )
    # the fixed branch passes a PLAIN string so the static-gap API
    # path stays pinned (a lit column would route through the
    # dynamic-gap evaluator)
    return (
        sessions("30 minutes", "fixed")
        .unionByName(sessions(dyn_gap, "dynamic"))
        .orderBy("part", "user_id", "session_start")
    )


