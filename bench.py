#!/usr/bin/env python
"""Bench harness (BASELINE.md measurement protocol).

Runs the registry's ``bench=True`` headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``: one untimed warm-up, then ``RUNS`` timed
runs per query, reporting the median. Queries execute through the noop
sink so the full plan runs distributed and nothing is collected to the
driver. Prints exactly ONE JSON line:

    {"metric": "bench_total_sec", "value": N, "unit": "sec",
     "queries": {"q00_...": sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mlb_data_pipeline_spark.plans import REGISTRY, load_all  # noqa: E402
from mlb_data_pipeline_spark.session import get_spark  # noqa: E402

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return float("nan")


def execute(df) -> None:
    """Run the full plan without collecting results to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    load_all()
    spark = get_spark("bench")
    names = sorted(name for name, q in REGISTRY.items() if q.bench)
    timings: dict[str, float] = {}
    for name in names:
        q = REGISTRY[name]
        try:
            execute(q.spark(spark, SF_DIR))  # warm-up (untimed)
            samples = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                execute(q.spark(spark, SF_DIR))
                samples.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(samples), 4)
        except Exception as exc:  # noqa: BLE001 — one bad query must not kill the run
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
