"""Deterministic reference-shaped fixtures (FIXTURES.md §B, seed=42).

Pure-Python generators (random.Random(42) — no global RNG state) that
emit the MLB-shaped tables the reference processes: articles with the
markdown noise / bullet / ``key: value`` quirks its parsers handle
(pipeline.py:268-281, specialized_agents.py:81-116,
orchestrator.py:201-248), the 30-team dimension (hw5/teams.csv), game
logs (hw5/gl2024.csv analytic subset), player stats with the raw-CSV
quoting quirks (hw5/player_stats_2024.csv:1), and nested schedule
payloads (mlb_schedule_to_gcs.py:33-49).
"""

from __future__ import annotations

import datetime as dt
import json
import random

TEAM_ROWS = [
    ("ANA", "A", "Anaheim", "Angels"), ("ARI", "N", "Phoenix", "Diamondbacks"),
    ("ATL", "N", "Atlanta", "Braves"), ("BAL", "A", "Baltimore", "Orioles"),
    ("BOS", "A", "Boston", "Red Sox"), ("CHA", "A", "Chicago", "White Sox"),
    ("CHN", "N", "Chicago", "Cubs"), ("CIN", "N", "Cincinnati", "Reds"),
    ("CLE", "A", "Cleveland", "Guardians"), ("COL", "N", "Denver", "Rockies"),
    ("DET", "A", "Detroit", "Tigers"), ("HOU", "A", "Houston", "Astros"),
    ("KCA", "A", "Kansas City", "Royals"), ("LAN", "N", "Los Angeles", "Dodgers"),
    ("MIA", "N", "Miami", "Marlins"), ("MIL", "N", "Milwaukee", "Brewers"),
    ("MIN", "A", "Minneapolis", "Twins"), ("NYA", "A", "New York", "Yankees"),
    ("NYN", "N", "New York", "Mets"), ("OAK", "A", "Oakland", "Athletics"),
    ("PHI", "N", "Philadelphia", "Phillies"), ("PIT", "N", "Pittsburgh", "Pirates"),
    ("SDN", "N", "San Diego", "Padres"), ("SEA", "A", "Seattle", "Mariners"),
    ("SFN", "N", "San Francisco", "Giants"), ("SLN", "N", "St. Louis", "Cardinals"),
    ("TBA", "A", "St. Petersburg", "Rays"), ("TEX", "A", "Arlington", "Rangers"),
    ("TOR", "A", "Toronto", "Blue Jays"), ("WAS", "N", "Washington", "Nationals"),
]

_WORDS = (
    "season opener pitcher slugger bullpen shutout homer rally inning "
    "walk-off steal roster trade deadline ace prospect Sánchez outfield "
    "double header extra innings pennant clincher no-hitter grand slam"
).split()


def articles_rows(n: int = 200, seed: int = 42) -> list[tuple]:
    rng = random.Random(seed)
    rows = []
    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    for i in range(n):
        url = f"https://example.com/mlb/article-{i:04d}"
        title = None if rng.random() < 0.05 else f"Headline {i}: {rng.choice(_WORDS)} {rng.choice(_WORDS)}"
        if rng.random() < 0.02:
            body = ""
        else:
            paras = [" ".join(rng.choices(_WORDS, k=rng.randint(6, 18))) for _ in range(rng.randint(2, 5))]
            noise = ["***", "---", f"Topic: {rng.choice(_WORDS)}", f"Source: src{rng.randint(0, 9)}"]
            bullets = [f"- {rng.choice(_WORDS)} {rng.choice(_WORDS)}" for _ in range(rng.randint(0, 3))]
            lines = paras + noise + bullets
            rng.shuffle(lines)
            body = "\n".join(lines)
        scraped_at = base + dt.timedelta(days=i % 30, seconds=i * 37 % 86400)
        rows.append((url, title, body, scraped_at))
    return rows


def game_logs_rows(n: int = 400, seed: int = 42) -> list[tuple]:
    rng = random.Random(seed)
    rows = []
    start = dt.date(2024, 3, 20)
    teams = [t[0] for t in TEAM_ROWS]
    leagues = {t[0]: t[1] for t in TEAM_ROWS}
    dow = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
    for i in range(n):
        d = start + dt.timedelta(days=i % 200)
        vt, ht = rng.sample(teams, 2)
        double_header = rng.random() < 0.05
        game_num = rng.choice([1, 2]) if double_header else 0
        extra = rng.random() < 0.08
        outs = rng.choice([60, 66, 72]) if extra else 54
        vs, hs = rng.randint(0, 12), rng.randint(0, 12)
        rows.append(
            (
                d, game_num, dow[d.weekday()], vt, leagues[vt], ht, leagues[ht], vs, hs,
                outs, rng.choice(["D", "N"]),
                (f"PRK{rng.randint(100, 130)}" if rng.random() > 0.01 else f"ORPHAN{rng.randint(0, 9)}"),
                None if rng.random() < 0.03 else rng.randint(8000, 55000),
                rng.randint(140, 260),
                rng.randint(2, 18), rng.randint(2, 18), rng.randint(0, 4), rng.randint(0, 4),
                f"pitch{rng.randint(1, 99):03d}", f"pitch{rng.randint(100, 199):03d}",
            )
        )
    return rows


def player_stats_rows(n: int = 130, seed: int = 42) -> list[tuple]:
    rng = random.Random(seed)
    last = ["Sánchez", "Smith", "Ohtani", "Judge", "Betts", "Núñez", "O'Neill", "De La Cruz"]
    first = ["Luis", "Mike", "Shohei", "Aaron", "Mookie", "José", "Tyler", "Elly"]
    rows = []
    for i in range(n):
        rows.append(
            (
                f"{rng.choice(last)}, {rng.choice(first)}",
                600000 + i,
                2024,
                rng.randint(100, 700),
                round(rng.uniform(10, 35), 1),
                round(rng.uniform(3, 18), 1),
                round(rng.uniform(0.250, 0.420), 3),
                round(rng.uniform(0.250, 0.420), 3),
                round(rng.uniform(25, 45), 1),
                round(rng.uniform(2, 20), 1),
                round(rng.uniform(25, 55), 1),
                round(rng.uniform(95, 105), 2),
                round(rng.uniform(96, 106), 2),
                round(rng.uniform(15, 40), 1),
                round(rng.uniform(38, 58), 1),
            )
        )
    return rows


def player_stats_raw_csv(n: int = 130, seed: int = 42) -> str:
    """Raw-CSV variant with the reference file's quirks: embedded comma in
    the first header name, every numeric quoted (hw5/player_stats_2024.csv:1-2)."""
    header = (
        '"last_name, first_name",player_id,year,pa,k_percent,bb_percent,woba,xwoba,'
        "sweet_spot_percent,barrel_batted_rate,hard_hit_percent,avg_best_speed,"
        "avg_hyper_speed,whiff_percent,swing_percent"
    )
    lines = [header]
    for r in player_stats_rows(n, seed):
        name = '"' + r[0] + '"'
        rest = ",".join(f'"{v}"' if v is not None else "" for v in r[1:])
        lines.append(f"{name},{rest}")
    return "\n".join(lines) + "\n"


def teams_raw_csv() -> str:
    """Headerless 4-column file (hw5/teams.csv shape)."""
    return "\n".join(",".join(t) for t in TEAM_ROWS) + "\n"


def schedule_payloads(days: int = 30, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    payloads = []
    names = {t[0]: f"{t[2]} {t[3]}" for t in TEAM_ROWS}
    team_ids = {t[0]: 100 + i for i, t in enumerate(TEAM_ROWS)}
    codes = list(names)
    for day in range(days):
        date = dt.date(2024, 5, 1) + dt.timedelta(days=day)
        games = []
        for g in range(rng.randint(1, 8)):
            away, home = rng.sample(codes, 2)
            games.append(
                {
                    "gamePk": 700000 + day * 100 + g,
                    "gameDate": f"{date}T{rng.randint(17, 22)}:05:00Z",
                    "teams": {
                        "away": {"team": {"id": team_ids[away], "name": names[away]}, "score": rng.randint(0, 11)},
                        "home": {"team": {"id": team_ids[home], "name": names[home]}, "score": rng.randint(0, 11)},
                    },
                    "venue": {"id": 1000 + team_ids[home], "name": f"{names[home]} Park"},
                    "status": {"detailedState": rng.choice(["Final", "Scheduled", "Postponed"])},
                }
            )
        payloads.append(json.dumps({"totalGames": len(games), "dates": [{"date": str(date), "games": games}]}))
    return payloads
