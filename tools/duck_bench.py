"""Time the DuckDB oracle side of the bench set — the judge's comparison.

Protocol mirrors bench.py: per query, 1 warm-up + 3 timed runs, median.
Prints one JSON line {query: sec} plus the oracled-set totals for both
engines when a fresh Spark bench JSON is passed via --spark-json.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from mlb_data_pipeline_spark.catalog import TABLES, table_path  # noqa: E402
from mlb_data_pipeline_spark.plans import REGISTRY, load_all  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')")
    timings: dict[str, float] = {}
    for name in sorted(n for n, q in REGISTRY.items() if q.bench and q.oracle):
        sql = REGISTRY[name].oracle
        con.execute(sql).fetchall()  # warm-up
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 4)
    total = round(sum(timings.values()), 4)
    print(json.dumps({"duckdb_oracled_bench": timings, "total": total}))


if __name__ == "__main__":
    main()
