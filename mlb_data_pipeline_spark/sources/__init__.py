from .readers import parse_schedule_payloads, read_csv, read_json, read_parquet  # noqa: F401
from .schemas import ARTICLES, GAME_LOGS, PLAYER_STATS, SCHEDULE_PAYLOAD, TEAMS  # noqa: F401
from .writers import delete_by_predicate, upsert_by_key, write_json_single, write_partitioned  # noqa: F401
