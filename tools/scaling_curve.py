#!/usr/bin/env python
"""Dedup-family scaling curve: q44 / LSH-scale / q59 walls at
sf0.1 / sf1 / sf3.

The 100 TB claim for the near-dup family is LINEAR candidate volume:
every candidate generator is a banded equi-join whose expected bucket
collisions scale with rows, not rows^2. This script produces the local
evidence — walls and result-pair counts across a 30x size range
(sf0.1 -> sf3), built by the same key-offset replication as the sf1
bench dataset (tools/gen_sf1.py: per-copy token prefixes keep shingle
sets disjoint, so pair density scales linearly by construction and any
super-linear wall growth is the ENGINE's fault, not the data's).

Measured queries:

* q44  — MinHash near-dup on documents (the oracled bench query);
* lsh  — cosine_pairs_lsh on embeddings through the AUTO route
         (lsh_params picks the operating point per corpus size; this is
         the configuration a deployment runs, unlike q52's pinned 4-bit
         recall-study point whose candidate volume is quadratic in
         spirit and must not be extrapolated);
* q59  — MinHash pairs -> connected components -> canonical corpus.

Emits one JSON line: {"curve": [{sf, n_docs, n_vecs, q44_sec,
lsh_sec, q59_sec, q44_pairs, lsh_pairs}...]}. Results are recorded in
docs/PERF.md and docs/SCALING.json.
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

from mlb_data_pipeline_spark.catalog import load_table, table_path  # noqa: E402
from mlb_data_pipeline_spark.operators.vector import cosine_pairs_lsh  # noqa: E402
from mlb_data_pipeline_spark.plans import REGISTRY, load_all  # noqa: E402
from mlb_data_pipeline_spark.session import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _ensure(dst: str, copies: int) -> str:
    if not all(os.path.exists(table_path(dst, t)) for t in TABLES):
        generate(dst, copies)
    return dst


def _timed(fn):
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 4), n


def main() -> None:
    load_all()
    spark = get_spark("scaling-curve")
    tiers = [
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", _ensure(os.path.join(_ROOT, "testdata_sf1"), 10)),
        ("sf3", _ensure(os.path.join(_ROOT, "testdata_sf3"), 30)),
    ]
    curve = []
    for label, sf_dir in tiers:
        docs = load_table(spark, sf_dir, "documents")
        emb = load_table(spark, sf_dir, "embeddings")
        n_docs, n_vecs = docs.count(), emb.count()
        q44_sec, q44_pairs = _timed(lambda: REGISTRY["q44_minhash_neardup"].spark(spark, sf_dir).count())
        lsh_sec, lsh_pairs = _timed(
            lambda: cosine_pairs_lsh(
                emb, "vec_id", "embedding", threshold=0.9, dim=64, n_rows=n_vecs
            ).count()
        )
        q59_sec, _ = _timed(lambda: REGISTRY["q59_neardup_cluster_dedup"].spark(spark, sf_dir).count())
        curve.append(
            {
                "sf": label, "n_docs": n_docs, "n_vecs": n_vecs,
                "q44_sec": q44_sec, "q44_pairs": q44_pairs,
                "lsh_sec": lsh_sec, "lsh_pairs": lsh_pairs,
                "q59_sec": q59_sec,
            }
        )
        print(json.dumps(curve[-1]), file=sys.stderr)
    print(json.dumps({"curve": curve}))


if __name__ == "__main__":
    main()
