"""Persisted Bloom seen-keys store: definite/maybe gate semantics,
idempotent appends, saturation stats, and the streaming maintenance
leg."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlb_data_pipeline_spark.operators.bloomstore import (
    append_bloom_store,
    bloom_store_filter,
    bloom_store_stats,
    build_bloom_store,
)


def _urls(spark, lo, hi):
    return spark.range(lo, hi).select(F.concat(F.lit("url-"), F.col("id")).alias("url"))


def test_bloom_store_gate_partitions_input_with_no_false_negatives(spark, tmp_path):
    path = str(tmp_path / "bloom")
    build_bloom_store(_urls(spark, 0, 1000), ["url"], path, expected_items=5000)
    probe = _urls(spark, 500, 1500)  # 500 seen, 500 new
    new = bloom_store_filter(probe, ["url"], path, keep="new")
    maybe = bloom_store_filter(probe, ["url"], path, keep="maybe_seen")
    n_new, n_maybe = new.count(), maybe.count()
    assert n_new + n_maybe == 1000  # the two modes partition the input
    # NO false negatives: every truly-seen key must land in maybe_seen
    assert {f"url-{i}" for i in range(500, 1000)} <= {r.url for r in maybe.collect()}
    # false positives bounded loosely: at fpp=0.01 over 500 new keys,
    # even 10x the expectation stays under 50
    assert n_maybe - 500 < 50
    with pytest.raises(ValueError):
        bloom_store_filter(probe, ["url"], path, keep="nope")
    with pytest.raises(ValueError):
        build_bloom_store(_urls(spark, 0, 1), ["url"], str(tmp_path / "x"), fpp=0.0)


def test_bloom_store_append_is_idempotent_and_monotone(spark, tmp_path):
    path = str(tmp_path / "bloom")
    build_bloom_store(_urls(spark, 0, 200), ["url"], path, expected_items=2000)
    append_bloom_store(_urls(spark, 200, 400), ["url"], path)
    s1 = tuple(bloom_store_stats(spark, path).collect()[0])
    # replay: bit_or of already-set bits — the store must not move
    append_bloom_store(_urls(spark, 200, 400), ["url"], path)
    s2 = tuple(bloom_store_stats(spark, path).collect()[0])
    assert s1 == s2
    # everything appended is now maybe_seen; untouched keys still pass as new
    assert bloom_store_filter(_urls(spark, 0, 400), ["url"], path, keep="maybe_seen").count() == 400
    assert bloom_store_filter(_urls(spark, 5000, 5100), ["url"], path, keep="new").count() >= 98
    # stats are sane: fill in (0,1), implied fpp grows with appends
    row = bloom_store_stats(spark, path).collect()[0]
    assert 0.0 < row.fill < 1.0 and 0.0 < row.implied_fpp < 1.0


def test_bloom_store_stream_equals_batch_build(spark, tmp_path):
    """Streamed appends leave the store equivalent to one batch build
    over the union: same gate verdict for every probe key, and a
    replayed stream is a no-op (bit_or idempotence, no guard needed)."""
    from mlb_data_pipeline_spark.streaming import bloom_store_stream

    src = str(tmp_path / "src")
    _urls(spark, 0, 300).coalesce(1).write.mode("append").parquet(src)
    _urls(spark, 300, 600).coalesce(1).write.mode("append").parquet(src)
    store = str(tmp_path / "store")
    build_bloom_store(
        _urls(spark, 0, 0), ["url"], store, expected_items=5000
    )  # empty bootstrap, lifetime-sized
    stream = (
        spark.readStream.schema("url STRING").option("maxFilesPerTrigger", "1").parquet(src)
    )
    bloom_store_stream(stream, ["url"], store, str(tmp_path / "ckpt"))

    whole = str(tmp_path / "whole")
    build_bloom_store(_urls(spark, 0, 600), ["url"], whole, expected_items=5000)
    probe = _urls(spark, 0, 1200)
    streamed = {r.url for r in bloom_store_filter(probe, ["url"], store, keep="maybe_seen").collect()}
    batch = {r.url for r in bloom_store_filter(probe, ["url"], whole, keep="maybe_seen").collect()}
    assert streamed == batch
    # cross-batch coverage: keys from BOTH micro-batches are maybe_seen
    assert {"url-0", "url-299", "url-300", "url-599"} <= streamed
    # replay the same files through a fresh checkpoint: store unchanged
    s1 = tuple(bloom_store_stats(spark, store).collect()[0])
    stream2 = (
        spark.readStream.schema("url STRING").option("maxFilesPerTrigger", "1").parquet(src)
    )
    bloom_store_stream(stream2, ["url"], store, str(tmp_path / "ckpt2"))
    assert tuple(bloom_store_stats(spark, store).collect()[0]) == s1


def test_jaccard_store_stream_equals_batch_appends(spark, tmp_path):
    """Streamed appends to the exact-near-dup store == batch appends:
    a probe after the stream finds pairs against docs from EVERY
    micro-batch, and a replayed stream is a no-op (id guard)."""
    from pyspark.sql import functions as F

    from mlb_data_pipeline_spark.operators.dedup import (
        build_jaccard_store,
        incremental_jaccard_pairs,
    )
    from mlb_data_pipeline_spark.streaming import jaccard_store_stream

    corpus = spark.createDataFrame(
        [(i, " ".join(f"c{i}x{j}" for j in range(6))) for i in range(10)],
        "doc_id BIGINT, text STRING",
    )
    store = str(tmp_path / "jstore")
    build_jaccard_store(corpus, "doc_id", "text", store, 80)
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(100, "p q r s t")], "doc_id BIGINT, text STRING"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(101, "u v w x y")], "doc_id BIGINT, text STRING"
    ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    jaccard_store_stream(stream, store, str(tmp_path / "ckpt"))
    n = spark.read.parquet(store + "/jdocs").count()
    assert n == 12  # both micro-batches landed
    # probe sees docs from both micro-batches
    probe = spark.createDataFrame(
        [(200, "p q r s t"), (201, "u v w x y")], "doc_id BIGINT, text STRING"
    )
    got = {(r.id_a, r.id_b) for r in incremental_jaccard_pairs(probe, store, "doc_id", "text").collect()}
    assert {(100, 200), (101, 201)} <= got
    # replay through a fresh checkpoint: no-op
    stream2 = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    jaccard_store_stream(stream2, store, str(tmp_path / "ckpt2"))
    assert spark.read.parquet(store + "/jdocs").count() == n
