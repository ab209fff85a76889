"""Connected components + canonical near-dup dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlb_data_pipeline_spark.operators.dedup import connected_components, neardup_dedup


def test_connected_components_chains(spark):
    # chain 1-2-3-4, pair 10-11, isolated nodes via df
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a BIGINT, id_b BIGINT"
    )
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_neardup_dedup_keeps_canonical_and_singletons(spark):
    df = spark.createDataFrame([(i, f"doc{i}") for i in range(8)], "doc_id BIGINT, text STRING")
    pairs = spark.createDataFrame([(1, 2), (2, 5), (6, 7)], "id_a BIGINT, id_b BIGINT")
    kept = sorted(r.doc_id for r in neardup_dedup(df, pairs, "doc_id").collect())
    # cluster {1,2,5} -> keep 1; cluster {6,7} -> keep 6; 0,3,4 singletons
    assert kept == [0, 1, 3, 4, 6]


def test_connected_components_raises_when_iterations_exhausted(spark):
    # chain 1-2-3-4 needs >1 round; partially-propagated labels must
    # never be returned silently
    import pytest

    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "id_a BIGINT, id_b BIGINT")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=1)


def test_neardup_dedup_with_id_col_named_id(spark):
    # regression: a caller id_col literally named "id" must survive the
    # internal component join (Spark's drop() removes ALL name matches)
    df = spark.createDataFrame([(i, f"doc{i}") for i in range(5)], "id BIGINT, text STRING")
    pairs = spark.createDataFrame([(1, 3)], "id_a BIGINT, id_b BIGINT")
    out = neardup_dedup(df, pairs, "id")
    assert out.columns == ["id", "text"]
    assert sorted(r.id for r in out.collect()) == [0, 1, 2, 4]


def test_dedup_idempotent_on_deduped_corpus(spark):
    df = spark.createDataFrame([(i, f"doc{i}") for i in range(6)], "doc_id BIGINT, text STRING")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a BIGINT, id_b BIGINT")
    once = neardup_dedup(df, pairs, "doc_id")
    # pairs among kept rows are gone -> empty pair set -> identity
    empty = spark.createDataFrame([], "id_a BIGINT, id_b BIGINT")
    twice = neardup_dedup(once, empty, "doc_id")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
