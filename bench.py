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
_ROOT = os.path.dirname(os.path.abspath(__file__))
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(_ROOT, "testdata_sf1"))
RUN_SF1 = os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") == "1"
# soft wall for the whole sf1 section: the bench's ONE-JSON-line contract
# must survive even if generation or a pathological run eats the clock
SF1_BUDGET_SEC = float(os.environ.get("SPARK_GRAFT_SF1_BUDGET_SEC", "1200"))


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return float("nan")


def execute(df) -> None:
    """Run the full plan without collecting results to the driver."""
    df.write.format("noop").mode("overwrite").save()


def release() -> None:
    """Drop py4j-held JVM references between queries: Python's deferred
    GC keeps whole executed-plan graphs (incl. lazy localCheckpoint
    RDDs) alive across queries, inflating JVM heap pressure and
    long-session timing jitter."""
    import gc

    gc.collect()


def lsh_recall(spark, sf_dir: str = "/root/testdata/sf0.01", probe_bits: int = 0) -> float:
    """Measured recall of the LSH near-dup tier vs the exact tier at
    sf0.01 (where the guarded exact all-pairs is cheap). Tracked per
    round so the approximate tier's quality is graded next to its
    speed; the subset invariant itself is pytest-pinned.
    ``probe_bits=1`` measures the multi-probe operating point (1.0
    measured recall at sf0.01 for ~3x candidate cost — the knob a
    recall-critical deployment turns)."""
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
            emb, "vec_id", "embedding", threshold=0.3, n_planes=32, bands=8, dim=64,
            probe_bits=probe_bits,
        ).collect()
    }
    return round(len(approx & exact) / len(exact), 4) if exact else 1.0


def ivf_recall(spark, sf_dir: str = "/root/testdata/sf0.01") -> float:
    """Measured recall of the IVF tier at its q58 operating point
    (n_lists=16, n_probe=4) vs the exact broadcast k-NN, 100 queries at
    sf0.01 — tracked per round next to the LSH recall so BOTH
    approximate tiers carry a quality number beside their speed."""
    from pyspark.sql import functions as F

    from mlb_data_pipeline_spark.catalog import load_table
    from mlb_data_pipeline_spark.operators.vector import ivf_knn_join, knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 100)
    exact = {
        (r.query_id, r.vec_id)
        for r in knn_join(emb, queries, "vec_id", "embedding", k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_knn_join(emb, queries, "vec_id", "embedding", k=3, n_lists=16, n_probe=4).collect()
    }
    return round(len(exact & approx) / len(exact), 4) if exact else 1.0


def pq_recall(spark, sf_dir: str = "/root/testdata/sf0.01") -> dict:
    """Measured recall of the PQ tier: ADC-only and with the standard
    exact rerank of a 10x shortlist — both tracked per round so the
    memory tier (8-byte codes vs 256-byte vectors) carries quality
    numbers beside the LSH and IVF tiers."""
    from pyspark.sql import functions as F

    from mlb_data_pipeline_spark.catalog import load_table
    from mlb_data_pipeline_spark.operators.vector import (
        knn_join,
        pq_encode,
        pq_knn_join,
        train_pq_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 100)
    exact = {
        (r.query_id, r.vec_id)
        for r in knn_join(emb, queries, "vec_id", "embedding", k=3).collect()
    }
    books = train_pq_codebooks(emb, "embedding", m_subvectors=8, n_codes=256)
    codes = pq_encode(emb, "embedding", books)
    adc = {
        (r.query_id, r.neighbor_id)
        for r in pq_knn_join(codes, queries, "vec_id", "embedding", k=3, codebooks=books).collect()
    }
    rer = {
        (r.query_id, r.neighbor_id)
        for r in pq_knn_join(
            codes, queries, "vec_id", "embedding", k=3, codebooks=books,
            rerank=30, corpus_vectors=emb,
        ).collect()
    }
    if not exact:
        return {"adc": 1.0, "rerank": 1.0}
    return {
        "adc": round(len(adc & exact) / len(exact), 4),
        "rerank": round(len(rer & exact) / len(exact), 4),
    }


def sf1_section(spark) -> dict:
    """Spark vs DuckDB on the oracled bench queries at sf1 (10x the
    driver's largest scale factor, generated by tools/gen_sf1.py on
    demand). The sub-second sf0.1 walls are dominated by Spark's fixed
    job/stage overhead (~0.2-0.5 s floor at local[32]); this section
    shows where the curves actually sit once per-query work is real.
    Protocol: one untimed warm-up then MIN of two timed runs per engine
    per query — min, not median, because the box is a shared VM and
    intermittent host contention inflates individual runs by 3-7x
    (observed); the minimum is the achievable wall, identically
    measured for both engines."""
    import subprocess

    import duckdb

    from mlb_data_pipeline_spark.catalog import TABLES, table_path

    # the budget clock starts BEFORE generation: a slow or hung gen must
    # not stall the bench past its wall (the one-JSON-line contract), so
    # the subprocess gets the remaining budget as a hard timeout
    section_start = time.perf_counter()
    # completeness, not mere existence: gen_sf1 renames a finished .tmp
    # into place, so a present-but-incomplete dir means an old layout —
    # regenerate rather than bench a subset
    if not all(os.path.exists(table_path(SF1_DIR, t)) for t in TABLES):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(_ROOT, "tools", "gen_sf1.py"), SF1_DIR],
                capture_output=True,
                text=True,
                timeout=SF1_BUDGET_SEC,
            )
        except subprocess.TimeoutExpired:
            return {"sf": 1.0, "truncated": f"sf1 generation exceeded budget {SF1_BUDGET_SEC}s"}
        if proc.returncode != 0:
            raise RuntimeError(f"sf1 generation failed: {proc.stderr.strip()[-2000:]}")

    def over_budget() -> bool:
        return time.perf_counter() - section_start > SF1_BUDGET_SEC

    names = sorted(n for n, q in REGISTRY.items() if q.bench and q.oracle)
    truncated = False
    spark_t: dict[str, float] = {}
    for name in names:
        if over_budget():
            truncated = True
            break
        try:
            execute(REGISTRY[name].spark(spark, SF1_DIR))  # warm-up (untimed)
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                execute(REGISTRY[name].spark(spark, SF1_DIR))
                runs.append(time.perf_counter() - t0)
            spark_t[name] = round(min(runs), 4)
        except Exception as exc:  # noqa: BLE001
            print(f"bench sf1 (spark): {name} failed: {exc}", file=sys.stderr)
            spark_t[name] = -1.0
        release()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF1_DIR, t)}')")
    duck_t: dict[str, float] = {}
    for name in names:
        if name not in spark_t or over_budget():
            truncated = True
            break
        try:
            con.execute(REGISTRY[name].oracle).fetchall()  # warm-up (untimed)
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(REGISTRY[name].oracle).fetchall()
                runs.append(time.perf_counter() - t0)
            duck_t[name] = round(min(runs), 4)
        except Exception as exc:  # noqa: BLE001
            print(f"bench sf1 (duckdb): {name} failed: {exc}", file=sys.stderr)
            duck_t[name] = -1.0
    # totals over the queries BOTH engines completed — a truncated or
    # failed side must not skew the ratio
    common = [n for n in names if spark_t.get(n, -1) >= 0 and duck_t.get(n, -1) >= 0]
    s_tot = round(sum(spark_t[n] for n in common), 4)
    d_tot = round(sum(duck_t[n] for n in common), 4)
    out = {
        "sf": 1.0,
        "runs": "min of 2 (shared-VM contention outliers)",
        "spark_sec": spark_t,
        "duckdb_sec": duck_t,
        "spark_total": s_tot,
        "duckdb_total": d_tot,
        "ratio_spark_over_duckdb": round(s_tot / d_tot, 3) if d_tot > 0 else None,
    }
    if truncated:
        out["truncated"] = f"budget {SF1_BUDGET_SEC}s hit; totals cover {len(common)}/{len(names)} queries"
    return out


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
        release()
    total = round(sum(t for t in timings.values() if t >= 0), 4)
    try:
        recall = lsh_recall(spark)
    except Exception as exc:  # noqa: BLE001 — recall is a metric, not a gate
        print(f"bench: recall failed: {exc}", file=sys.stderr)
        recall = -1.0
    try:
        recall_mp = lsh_recall(spark, probe_bits=1)
    except Exception as exc:  # noqa: BLE001
        print(f"bench: multiprobe recall failed: {exc}", file=sys.stderr)
        recall_mp = -1.0
    try:
        recall_ivf = ivf_recall(spark)
    except Exception as exc:  # noqa: BLE001
        print(f"bench: ivf recall failed: {exc}", file=sys.stderr)
        recall_ivf = -1.0
    try:
        recall_pq = pq_recall(spark)
    except Exception as exc:  # noqa: BLE001
        print(f"bench: pq recall failed: {exc}", file=sys.stderr)
        recall_pq = {"adc": -1.0, "rerank": -1.0}
    out = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "recall": recall,
        "recall_multiprobe": recall_mp,
        "ivf_recall": recall_ivf,
        "pq_recall": recall_pq,
        "sf": _sf_from_dir(SF_DIR),
    }
    if RUN_SF1:
        try:
            out["sf1"] = sf1_section(spark)
        except Exception as exc:  # noqa: BLE001 — sf1 is a datapoint, not a gate
            print(f"bench: sf1 section failed: {exc}", file=sys.stderr)
    # The driver's round record keeps only the LAST 2000 BYTES of stdout
    # (BENCH_r09 lost its whole sf0.1 section to the tail window), so the
    # headline JSON line must fit that budget. Bulk sections — the
    # recorded scaling curve, then per-query maps if ever needed — move
    # to a SIDECAR stderr line instead of padding the line of record.
    scaling_path = os.path.join(_ROOT, "docs", "SCALING.json")
    if os.path.exists(scaling_path):
        try:
            with open(scaling_path) as f:
                print(
                    json.dumps({"scaling_curve_recorded": json.load(f)["curve"]}),
                    file=sys.stderr,
                )
        except Exception as exc:  # noqa: BLE001
            print(f"bench: scaling curve embed failed: {exc}", file=sys.stderr)
    line = json.dumps(out)
    # belt-and-braces: if the line ever outgrows the capture window, shed
    # the most verbose members to stderr until the record parses whole
    for victim in ("sf1", "queries"):
        if len(line.encode()) <= 1900:
            break
        print(json.dumps({f"overflow_{victim}": out.pop(victim, None)}), file=sys.stderr)
        line = json.dumps(out)
    print(line)


if __name__ == "__main__":
    main()
