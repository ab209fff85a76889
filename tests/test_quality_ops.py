

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
