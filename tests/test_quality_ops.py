

def test_outlier_flags_planted(spark):
    from mlb_data_pipeline_spark.operators.quality import outlier_flags

    # the spike must beat z=3 even though it inflates the variance itself:
    # with 19 points near 10 and one at 1000, z(1000) ≈ 4.2
    rows = [("a", float(v)) for v in [10, 11, 9, 10, 12, 10, 11, 9, 10, 11] * 2] + [
        ("a", 1000.0)
    ] + [
        ("b", 5.0), ("b", 5.0), ("b", 5.0)
    ]
    df = spark.createDataFrame(rows, "grp STRING, value DOUBLE")
    got = outlier_flags(df, "value", ["grp"]).collect()
    outliers = [(r.grp, r.value) for r in got if r.is_outlier]
    assert outliers == [("a", 1000.0)]          # the planted spike, nothing else
    assert all(not r.is_outlier for r in got if r.grp == "b")  # zero-variance group


def test_outlier_flags_singleton_group(spark):
    from mlb_data_pipeline_spark.operators.quality import outlier_flags

    df = spark.createDataFrame([("solo", 42.0)], "grp STRING, value DOUBLE")
    [r] = outlier_flags(df, "value", ["grp"]).collect()
    assert not r.is_outlier


# ---------------------------------------------------------------------------
# train_quality_model / score_quality (r29): the trained-classifier
# quality tier
# ---------------------------------------------------------------------------


def _labeled_quality_corpus(spark):
    import random

    random.seed(11)
    good = "the quick brown fox jumps over a lazy dog by the still river".split()
    bad = ["z%04x" % random.randrange(1 << 16) for _ in range(80)]
    rows = [(i, " ".join(random.choices(good, k=25)), 1) for i in range(150)]
    rows += [(i + 150, " ".join(random.choices(bad, k=25)), 0) for i in range(150)]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, label INT")


def test_quality_model_separates_held_out(spark):
    from mlb_data_pipeline_spark.operators.quality import score_quality, train_quality_model

    df = _labeled_quality_corpus(spark)
    model = train_quality_model(df.filter("doc_id % 5 != 0"))
    scored = score_quality(model, df.filter("doc_id % 5 = 0")).collect()
    acc = sum(1 for r in scored if (r.quality_prob >= 0.5) == (r.label == 1)) / len(scored)
    assert acc >= 0.95  # disjoint vocabularies: a linear model nails this


def test_quality_scoring_frozen_model_deterministic(spark, tmp_path):
    """Scoring with a FROZEN model is a per-row function of the text:
    identical across partitionings and across a save/load round-trip
    (training itself may be partitioning-sensitive — the frozen
    weights, not the fit, are the deployment contract)."""
    from pyspark.ml import PipelineModel

    from mlb_data_pipeline_spark.operators.quality import score_quality, train_quality_model

    df = _labeled_quality_corpus(spark)
    model = train_quality_model(df)
    a = {r.doc_id: r.quality_prob for r in score_quality(model, df).collect()}
    b = {r.doc_id: r.quality_prob for r in score_quality(model, df.repartition(17)).collect()}
    assert a == b
    path = str(tmp_path / "qmodel")
    model.write().overwrite().save(path)
    c = {r.doc_id: r.quality_prob for r in score_quality(PipelineModel.load(path), df).collect()}
    assert a == c
