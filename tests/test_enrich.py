"""UDF surface invariants (U1-U4, U6) + fake embedder determinism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mlb_data_pipeline_spark.catalog import load_table
from mlb_data_pipeline_spark.functions.embed import embed_column, fake_encode
from mlb_data_pipeline_spark.operators.enrich import (
    MockLLMClient,
    demean_per_group,
    llm_enrich,
    normalize_url_udf,
    rms_udaf,
)


def test_normalize_url_udf(spark):
    df = spark.createDataFrame(
        [("https://Example.com/A/",), ("http://x.io",), (None,)], "url STRING"
    ).select(normalize_url_udf("url").alias("n"))
    assert [r.n for r in df.collect()] == ["example.com/a", "x.io", None]


def test_demean_matches_window_builtin(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    from pyspark.sql import Window

    got = demean_per_group(customer, ["c_nationkey"], "c_acctbal", "delta")
    want = customer.select(
        "c_nationkey",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
        (F.col("c_acctbal") - F.min("c_acctbal").over(Window.partitionBy("c_nationkey"))).alias("delta"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_rms_udaf_matches_builtin(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    rms = rms_udaf()
    got = {r[0]: r[1] for r in orders.groupBy("o_orderstatus").agg(rms(F.col("o_totalprice"))).collect()}
    want = {
        r[0]: r[1]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.sqrt(F.avg(F.col("o_totalprice") * F.col("o_totalprice"))))
        .collect()
    }
    assert got.keys() == want.keys()
    for k in got:
        assert math.isclose(got[k], want[k], rel_tol=1e-9)


def test_llm_enrich_deterministic_and_batched(spark):
    df = spark.createDataFrame([(i, f"prompt {i}") for i in range(100)], "id INT, prompt STRING")
    a = {(r.id, r.completion) for r in llm_enrich(df, "prompt", batch_size=7).collect()}
    b = {(r.id, r.completion) for r in llm_enrich(df.repartition(8), "prompt", batch_size=64).collect()}
    assert a == b  # independent of partitioning and batch size
    direct = MockLLMClient().complete(["prompt 3"])[0]
    assert ("3", direct) in {(str(i), c) for i, c in a} or (3, direct) in a


def test_fake_embedder_deterministic_unit_norm(spark):
    df = spark.createDataFrame([("alpha",), ("beta",), ("alpha",)], "text STRING")
    rows = embed_column(df, "text").collect()
    vecs = {r.text: r.embedding for r in rows}
    assert vecs["alpha"] == [float(f) for f in vecs["alpha"]]  # array<float>
    assert math.isclose(sum(v * v for v in vecs["alpha"]), 1.0, rel_tol=1e-5)
    # same text -> same vector; matches the driver-side encoder
    local = fake_encode("alpha")
    assert all(math.isclose(a, b, rel_tol=1e-6) for a, b in zip(vecs["alpha"], local))


def test_fake_encode_matches_duckdb_sha256_mirror():
    """The q15 oracle's claim (plans/enrich_queries.py): DuckDB's
    sha256 + UBIGINT hex cast + power-of-two scaling + sequential
    list_dot_product fold reproduce fake_encode BIT-FOR-BIT, so the
    embed-retrieval pipeline is hash-checkable end-to-end."""
    import duckdb

    text = "how does a hash join shuffle partition data"
    sql = """
    WITH raw AS (
      SELECT list_transform(range(64), i ->
        CAST(CAST(('0x' || substr(sha256(CAST(i AS VARCHAR) || '|' || $1), 1, 16)) AS UBIGINT) AS DOUBLE)
          / 9223372036854775808.0 - 1.0) AS r
    )
    SELECT list_transform(r, v -> v / sqrt(list_dot_product(r, r))) FROM raw
    """
    got = duckdb.connect().execute(sql, [text]).fetchone()[0]
    want = fake_encode(text)
    assert got == want  # exact equality, all 64 doubles


def test_compression_ratio_orders_redundancy(spark):
    from mlb_data_pipeline_spark.operators.enrich import compression_ratio_udf

    ratio = compression_ratio_udf()
    rows = [
        (1, "spam spam spam spam spam spam spam spam spam spam " * 20),
        (2, "the committee convened thursday to review quarterly findings and dissenting appendices"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r.doc_id: r.r for r in df.select("doc_id", ratio(F.col("text")).alias("r")).collect()}
    assert got[1] < got[2] < 1.5  # heavy repetition compresses far below prose
    assert got[1] < 0.1
    assert got[3] == 1.0 and got[4] == 1.0
    # deterministic across invocations
    again = {r.doc_id: r.r for r in df.select("doc_id", ratio(F.col("text")).alias("r")).collect()}
    assert got == again
