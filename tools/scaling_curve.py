#!/usr/bin/env python
"""Dedup-family scaling curve: q44 / LSH-scale / q59 walls at
sf0.1 / sf1 / sf3.

The 100 TB claim for the near-dup family is BOUNDED candidate volume:
every candidate generator is a banded equi-join whose expected bucket
collisions are pinned to O(n), not n^2. This script produces the local
evidence — walls, result-pair counts, and planted-pair recall across a
30x size range (sf0.1 -> sf3), built by the same key-offset replication
as the sf1 bench dataset (tools/gen_sf1.py: per-copy token prefixes keep
shingle sets disjoint, so MinHash pair density scales linearly by
construction).

What "linear" means per leg — the claims the curve is evidence FOR:

* q44 (MinHash near-dup, fixed operating point): per-row work is
  constant, so the wall should grow ~linearly with rows and the pair
  count exactly linearly (copy-disjoint shingles). Super-linear wall
  growth here IS an engine fault.
* lsh (auto route): ``lsh_params`` deepens the operating point with the
  corpus — per_band ~ log2(n) keeps expected random-pair candidates
  <= 8n, and single-bit multi-probe emits (per_band + 1) keys per band
  per row. Per-row work therefore grows ~log n BY DESIGN; the expected
  wall shape is n*log n, and the linear quantity is the CANDIDATE
  VOLUME (and hence found pairs vs planted pairs). The recorded
  ``lsh_point`` makes the deepening visible next to the wall.
* q59 (pairs -> connected components -> canonical corpus): CC round
  count depends on clique diameter (constant here), so the wall should
  grow ~linearly in rows.
* inc (incremental delta-vs-corpus near-dup, §2.11 I2): a FIXED
  1000-doc delta probed against each tier's persisted signature store.
  The round-5 headline — delta cost is O(delta), not O(corpus) — made
  measurable: the only corpus-sized term is the store SCAN (3 int
  columns, band-partitioned), so the wall should be near-flat across
  30x corpus growth while the pair count stays EXACTLY constant (the
  delta is drawn from the sf0.1 slice, and the replicas' per-copy
  token prefixes keep their shingles disjoint from it). Super-linear
  delta-wall growth with corpus size is a red flag the curve exists to
  catch. Store build time is recorded separately (``inc_build_sec``) —
  it is the one-time per-corpus-version cost, not the delta cadence.

The driver's synthetic embeddings are isotropic — no true 0.9-cosine
pairs exist — so a curve over the raw tables reports 0 result pairs and
proves only that the machinery runs. To make pair density a measured
quantity, each tier PLANTS one near-dup per 50 vectors: vec_id % 50 == 0
gets a perturbed copy at id = -vec_id - 1 (mix 0.97*v + 0.03*roll(v,1):
cosine(v, v') >= 0.999 for any v, deterministic, no RNG). Planted pairs
are identified in the output by a_vec_id + b_vec_id == -1; recall is
found/planted and pair counts scale linearly with the tier by
construction.

Emits one JSON line: {"curve": [{sf, n_docs, n_vecs, q44_sec,
q44_pairs, lsh_sec, lsh_pairs, lsh_planted, lsh_recall, lsh_point,
q59_sec}...]}. Results are recorded in docs/PERF.md and
docs/SCALING.json (embedded in the bench JSON as
``scaling_curve_recorded``).

Timing protocol: ``--runs N`` (default 2) repeats every tier and keeps
the per-leg MINIMUM — the same protocol as bench.py's sf1 section, for
the same reason: this shared VM shows 2-3x contention outliers (the
identical q44 sf3 plan has measured 8.4 s and 27 s on different runs),
and the minimum is the closest observable to the uncontended wall.
Pair counts and recall are asserted identical across runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # sibling import below

from gen_sf1 import generate  # noqa: E402  (sibling tool module)

from pyspark.sql import functions as F  # noqa: E402

from mlb_data_pipeline_spark.catalog import load_table, table_path  # noqa: E402
from mlb_data_pipeline_spark.operators.vector import cosine_pairs_lsh, lsh_params  # noqa: E402
from mlb_data_pipeline_spark.plans import REGISTRY, load_all  # noqa: E402
from mlb_data_pipeline_spark.session import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

PLANT_EVERY = 50      # one planted near-dup per 50 vectors
PLANT_ALPHA = 0.97    # v' = alpha*v + (1-alpha)*roll(v,1); cos >= 0.999


def _ensure(dst: str, copies: int) -> str:
    if not all(os.path.exists(table_path(dst, t)) for t in TABLES):
        generate(dst, copies)
    return dst


def _timed(fn):
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 4), n


def plant_neardups(emb, every: int = PLANT_EVERY, alpha: float = PLANT_ALPHA):
    """Union ``emb`` with a perturbed copy of every ``every``-th vector at
    id = -vec_id - 1. The mixture with the rolled vector keeps
    cosine(v, v') >= 2*alpha - 1 >= 0.94 for ANY v (and ~0.999 for the
    near-orthogonal roll of an isotropic vector) — safely above the 0.9
    study threshold, with no RNG. Returns (corpus, n_planted)."""
    sample = emb.filter(F.col("vec_id") % every == 0)
    rolled = F.expr("concat(slice(embedding, 2, size(embedding) - 1), slice(embedding, 1, 1))")
    mixed = F.zip_with(
        F.col("embedding"), rolled,
        lambda x, y: x * F.lit(alpha) + y * F.lit(1.0 - alpha),
    )
    planted = sample.select(
        (-F.col("vec_id") - 1).alias("vec_id"),
        mixed.cast("array<float>").alias("embedding"),
        "label",
    )
    return emb.unionByName(planted), sample.count()


def _measure_tier(spark, label: str, sf_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    n_docs, n_vecs = docs.count(), emb.count()
    q44_sec, q44_pairs = _timed(lambda: REGISTRY["q44_minhash_neardup"].spark(spark, sf_dir).count())

    corpus, n_planted = plant_neardups(emb)
    n_corpus = n_vecs + n_planted
    point = lsh_params(n_corpus, 0.9)
    pairs_df = cosine_pairs_lsh(
        corpus, "vec_id", "embedding", threshold=0.9, dim=64, n_rows=n_corpus
    )
    lsh_sec, lsh_pairs = _timed(pairs_df.count)
    found = pairs_df.filter(F.col("a_vec_id") + F.col("b_vec_id") == -1).count()

    q59_sec, _ = _timed(lambda: REGISTRY["q59_neardup_cluster_dedup"].spark(spark, sf_dir).count())

    inc_build_sec, inc_sec, inc_pairs = _measure_incremental(spark, label, sf_dir, docs)
    return {
        "sf": label, "n_docs": n_docs, "n_vecs": n_vecs,
        "q44_sec": q44_sec, "q44_pairs": q44_pairs,
        "lsh_sec": lsh_sec, "lsh_pairs": lsh_pairs,
        "lsh_planted": n_planted,
        "lsh_recall": round(found / n_planted, 4) if n_planted else None,
        "lsh_point": {"n_planes": point[0], "bands": point[1], "probe_bits": point[2]},
        "q59_sec": q59_sec,
        "inc_build_sec": inc_build_sec, "inc_sec": inc_sec, "inc_pairs": inc_pairs,
    }


INC_DELTA_DOCS = 1000  # fixed delta size at every tier


def _measure_incremental(spark, label: str, sf_dir: str, docs):
    """Fixed-size delta vs this tier's persisted signature store: the
    wall of ONE incremental-dedup day at 1x/10x/30x corpus. The store
    builds once per tier (timed separately; reused across --runs); the
    delta is the same 1000 sf0.1 documents remapped to negative ids so
    every tier probes the identical workload — near-dup of its copy-0
    slice, disjoint from the prefixed replicas."""
    from mlb_data_pipeline_spark.operators.dedup import (
        build_signature_store,
        incremental_neardup_pairs,
    )
    from mlb_data_pipeline_spark.sources.writers import target_exists

    store = os.path.join("/tmp/spark_graft_scaling", label.replace(".", "_"), "sigstore")
    inc_build_sec = None
    if not target_exists(spark, store + "/signatures"):
        inc_build_sec, _ = _timed(
            lambda: build_signature_store(docs, "doc_id", "text", store, n_hashes=4, shingle_n=3)
        )
    delta = (
        load_table(spark, "/root/testdata/sf0.1", "documents")
        .orderBy("doc_id")
        .limit(INC_DELTA_DOCS)
        .select((-F.col("doc_id") - 1).alias("doc_id"), "text")
        .localCheckpoint(eager=True)  # delta prep excluded from the probe wall
    )
    inc_sec, inc_pairs = _timed(
        lambda: incremental_neardup_pairs(delta, store, "doc_id", "text", threshold=0.3).count()
    )
    return inc_build_sec, inc_sec, inc_pairs


def _merge_min(a: dict, b: dict) -> dict:
    for k in ("q44_pairs", "lsh_pairs", "lsh_planted", "lsh_recall", "inc_pairs"):
        assert a[k] == b[k], f"non-deterministic {k}: {a[k]} != {b[k]}"
    out = dict(a)
    for k in ("q44_sec", "lsh_sec", "q59_sec", "inc_sec"):
        out[k] = min(a[k], b[k])
    out["inc_build_sec"] = a["inc_build_sec"] if a["inc_build_sec"] is not None else b["inc_build_sec"]
    return out


def main(runs: int = 2) -> None:
    load_all()
    spark = get_spark("scaling-curve")
    tiers = [
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", _ensure(os.path.join(_ROOT, "testdata_sf1"), 10)),
        ("sf3", _ensure(os.path.join(_ROOT, "testdata_sf3"), 30)),
    ]
    curve = []
    for label, sf_dir in tiers:
        best = _measure_tier(spark, label, sf_dir)
        for _ in range(runs - 1):
            best = _merge_min(best, _measure_tier(spark, label, sf_dir))
        curve.append(best)
        print(json.dumps(best), file=sys.stderr)
    print(json.dumps({"curve": curve, "runs": f"min of {runs} (shared-VM contention outliers)"}))


if __name__ == "__main__":
    main(int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 2)
