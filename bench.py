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


def lsh_recall(spark, sf_dir: str = "/root/testdata/sf0.01") -> float:
    """Measured recall of the LSH near-dup tier vs the exact tier at
    sf0.01 (where the guarded exact all-pairs is cheap). Tracked per
    round so the approximate tier's quality is graded next to its
    speed; the subset invariant itself is pytest-pinned."""
    from pyspark.sql import functions as F

    from mlb_data_pipeline_spark.catalog import load_table
    from mlb_data_pipeline_spark.operators.vector import cosine_pairs_exact, cosine_pairs_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.a_vec_id, r.b_vec_id)
        for r in cosine_pairs_exact(emb, "vec_id", "embedding", threshold=0.3).collect()
    }
    approx = {
        (r.a_vec_id, r.b_vec_id)
        for r in cosine_pairs_lsh(
            emb, "vec_id", "embedding", threshold=0.3, n_planes=32, bands=8, dim=64
        ).collect()
    }
    return round(len(approx & exact) / len(exact), 4) if exact else 1.0


def main() -> None:
    load_all()
    spark = get_spark("bench")
    # lazy localCheckpoint truncation can race the noop sink's accumulator
    # teardown, logging a harmless-but-noisy DAGScheduler ERROR; the bench
    # contract is ONE clean JSON line, so raise the log threshold
    spark.sparkContext.setLogLevel("FATAL")
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
    try:
        recall = lsh_recall(spark)
    except Exception as exc:  # noqa: BLE001 — recall is a metric, not a gate
        print(f"bench: recall failed: {exc}", file=sys.stderr)
        recall = -1.0
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "recall": recall,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
