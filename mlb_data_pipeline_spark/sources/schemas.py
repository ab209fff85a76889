"""Explicit StructTypes for the reference-shaped tables (FIXTURES.md §B).

The reference infers everything (hw5/load_csv.py:16 inferSchema=True —
a full extra pass and type drift between files); the engine declares
schemas once so reads are single-pass and deterministic.
"""

from __future__ import annotations

from pyspark.sql import types as T

# B1 — scraped article records (pipeline.py:24-38)
ARTICLES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("title", T.StringType(), True),  # missing <h1> -> NULL (ref: 'Untitled', pipeline.py:31)
        T.StructField("body", T.StringType(), True),
        T.StructField("scraped_at", T.TimestampType(), False),
    ]
)

# B2 — teams dimension (hw5/teams.csv: headerless, 4 cols)
TEAMS = T.StructType(
    [
        T.StructField("team_id", T.StringType(), False),
        T.StructField("league", T.StringType(), False),
        T.StructField("city", T.StringType(), False),
        T.StructField("nickname", T.StringType(), False),
    ]
)

# B3 — analytic subset of the 161-col Retrosheet game log (hw5/gl2024.csv)
GAME_LOGS = T.StructType(
    [
        T.StructField("game_date", T.DateType(), False),
        T.StructField("game_num", T.IntegerType(), False),
        T.StructField("day_of_week", T.StringType(), False),
        T.StructField("visiting_team", T.StringType(), False),
        T.StructField("visiting_league", T.StringType(), False),
        T.StructField("home_team", T.StringType(), False),
        T.StructField("home_league", T.StringType(), False),
        T.StructField("visiting_score", T.IntegerType(), False),
        T.StructField("home_score", T.IntegerType(), False),
        T.StructField("game_length_outs", T.IntegerType(), True),
        T.StructField("day_night", T.StringType(), True),
        T.StructField("park_id", T.StringType(), True),
        T.StructField("attendance", T.IntegerType(), True),
        T.StructField("duration_min", T.IntegerType(), True),
        T.StructField("visiting_hits", T.IntegerType(), True),
        T.StructField("home_hits", T.IntegerType(), True),
        T.StructField("visiting_errors", T.IntegerType(), True),
        T.StructField("home_errors", T.IntegerType(), True),
        T.StructField("winning_pitcher", T.StringType(), True),
        T.StructField("losing_pitcher", T.StringType(), True),
    ]
)

# B4 — Statcast-style rate stats (hw5/player_stats_2024.csv: header row
# with embedded comma in the first column name, quoted numerics)
PLAYER_STATS = T.StructType(
    [
        T.StructField("player_name", T.StringType(), False),
        T.StructField("player_id", T.LongType(), False),
        T.StructField("year", T.IntegerType(), False),
        T.StructField("pa", T.IntegerType(), True),
        T.StructField("k_percent", T.DoubleType(), True),
        T.StructField("bb_percent", T.DoubleType(), True),
        T.StructField("woba", T.DoubleType(), True),
        T.StructField("xwoba", T.DoubleType(), True),
        T.StructField("sweet_spot_percent", T.DoubleType(), True),
        T.StructField("barrel_batted_rate", T.DoubleType(), True),
        T.StructField("hard_hit_percent", T.DoubleType(), True),
        T.StructField("avg_best_speed", T.DoubleType(), True),
        T.StructField("avg_hyper_speed", T.DoubleType(), True),
        T.StructField("whiff_percent", T.DoubleType(), True),
        T.StructField("swing_percent", T.DoubleType(), True),
    ]
)

# B5 — nested MLB Stats API schedule payload (mlb_schedule_to_gcs.py:33-49)
SCHEDULE_PAYLOAD = T.StructType(
    [
        T.StructField("totalGames", T.IntegerType(), True),
        T.StructField(
            "dates",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("date", T.StringType(), True),
                        T.StructField(
                            "games",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("gamePk", T.LongType(), True),
                                        T.StructField("gameDate", T.StringType(), True),
                                        T.StructField(
                                            "teams",
                                            T.StructType(
                                                [
                                                    T.StructField("away", _side := T.StructType(
                                                        [
                                                            T.StructField(
                                                                "team",
                                                                T.StructType(
                                                                    [
                                                                        T.StructField("id", T.IntegerType(), True),
                                                                        T.StructField("name", T.StringType(), True),
                                                                    ]
                                                                ),
                                                                True,
                                                            ),
                                                            T.StructField("score", T.IntegerType(), True),
                                                        ]
                                                    ), True),
                                                    T.StructField("home", _side, True),
                                                ]
                                            ),
                                            True,
                                        ),
                                        T.StructField(
                                            "venue",
                                            T.StructType(
                                                [
                                                    T.StructField("id", T.IntegerType(), True),
                                                    T.StructField("name", T.StringType(), True),
                                                ]
                                            ),
                                            True,
                                        ),
                                        T.StructField(
                                            "status",
                                            T.StructType([T.StructField("detailedState", T.StringType(), True)]),
                                            True,
                                        ),
                                    ]
                                )
                            ),
                            True,
                        ),
                    ]
                )
            ),
            True,
        ),
    ]
)
