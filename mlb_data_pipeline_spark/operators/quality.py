"""Data-quality expectation checks (mini-Deequ) — the validation layer
a lake pipeline runs between staging and publish.

Reference analogue: the warehouse raw→staging→analytics layering
(/root/reference/README.md architecture; sources/warehouse.py here)
implies a promotion gate, but the reference validates nothing — a bad
scrape propagates straight to the dashboards. These checks make the
gate explicit: declarative rules compiled into ONE aggregation pass
(never one job per rule), plus an optional referential check (one
anti-join per foreign key).

100 TB notes: all row-level rules fold into a single map-side partial
aggregate over one scan; `unique` adds a count distinct (one shuffle);
referential integrity is a left-anti join on the key — the same
bounded shapes as everything else in the engine. Output is a tiny
(check, violations, passed) frame a scheduler can gate on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect_not_null(col: str) -> tuple[str, Column]:
    """Violations = rows where ``col`` is null."""
    return f"not_null({col})", F.sum(F.col(col).isNull().cast("long"))


def expect_unique(col: str) -> tuple[str, Column]:
    """Violations = rows beyond the first per value (count - distinct)."""
    return f"unique({col})", F.count(F.col(col)) - F.countDistinct(F.col(col))


def expect_range(col: str, lo, hi) -> tuple[str, Column]:
    """Violations = non-null rows outside [lo, hi]."""
    c = F.col(col)
    return (
        f"range({col},{lo},{hi})",
        F.sum((c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))).cast("long")),
    )


def expect_regex(col: str, pattern: str) -> tuple[str, Column]:
    """Violations = non-null rows not fully matching ``pattern``."""
    c = F.col(col)
    return (
        f"regex({col})",
        F.sum((c.isNotNull() & ~c.rlike(pattern)).cast("long")),
    )


def quality_report(df: DataFrame, checks: list[tuple[str, Column]]) -> DataFrame:
    """Run every row-level check in ONE aggregation pass and return
    (check, violations, passed), one row per rule, ordered by check
    name. ``checks`` are (name, violation-count aggregate) pairs from
    the ``expect_*`` builders (or hand-built aggregates with the same
    contract: violations == 0 means pass)."""
    aggs = [expr.cast("long").alias(f"__c{i}") for i, (_, expr) in enumerate(checks)]
    row = df.agg(*aggs)
    pairs = [item for i, (name, _) in enumerate(checks) for item in (F.lit(name), F.col(f"__c{i}"))]
    stacked = row.select(
        F.explode(F.map_from_arrays(
            F.array(*pairs[0::2]), F.array(*pairs[1::2])
        )).alias("check", "violations")
    )
    return stacked.select(
        "check", "violations", (F.col("violations") == 0).alias("passed")
    ).orderBy("check")


def expect_foreign_key(child: DataFrame, child_key: str, parent: DataFrame, parent_key: str) -> DataFrame:
    """Referential-integrity check as a (check, violations, passed) row:
    violations = child rows whose key has no parent (left-anti join —
    one shuffle on the key, never a collect)."""
    orphans = child.select(F.col(child_key).alias("__k")).join(
        parent.select(F.col(parent_key).alias("__k")), "__k", "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).alias("violations")).select(
        F.lit(f"foreign_key({child_key}->{parent_key})").alias("check"),
        F.col("violations").cast("long"),
        (F.col("violations") == 0).alias("passed"),
    )


def outlier_flags(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    z: int = 3,
) -> DataFrame:
    """Per-group z-score outlier flag WITHOUT sqrt or mean division.

    (x - mean)^2 > z^2 * var  ⟺  (n*x - Σx)^2 > z^2 * (n*Σx² - (Σx)²)

    Multiplying through by n² removes every division and the sqrt, so
    the group moments (n, Σx, Σx²) are computed EXACTLY in the decimal
    domain (order-independent), and the final comparison is a fixed
    sequence of IEEE-double ops on those exact inputs — bit-identical
    across engines and partition orders, where a naive stddev_pop
    comparison would be neither. Population variance semantics; groups
    with n = 1 have var 0 and are never outliers (lhs = 0 ≤ 0 = rhs is
    false only when x deviates, which it can't for n = 1).

    One shuffle for the moments, broadcast back by group key.
    """
    from ..functions.numeric import dec

    x2 = dec(value_col) * dec(value_col)
    moments = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(dec(value_col)).alias("__sx"),
        F.sum(x2).alias("__sxx"),
    )
    j = df.join(F.broadcast(moments), group_cols)
    n_d = F.col("__n").cast("double")
    sx_d = F.col("__sx").cast("double")
    sxx_d = F.col("__sxx").cast("double")
    # plain multiplies, not pow(): libm pow differs across engines
    diff = n_d * F.col(value_col) - sx_d
    rhs = F.lit(float(z * z)) * (n_d * sxx_d - sx_d * sx_d)
    return (
        j.withColumn("__diff", diff)
        .withColumn("is_outlier", F.col("__diff") * F.col("__diff") > rhs)
        .drop("__n", "__sx", "__sxx", "__diff")
    )


# ---------------------------------------------------------------------------
# Model-based quality filter — the trained-classifier tier above the
# heuristic rule packs (gopher_signals, text profiles). CCNet and the
# GPT-3 data work both gate web text with a linear classifier over
# hashed bag-of-ngram features trained on a small "good vs bad" seed
# set; this is that operator Spark-first: HashingTF (murmur3 feature
# hashing, vocabulary-free so the feature space never needs a
# corpus-wide fit) + MLlib logistic regression. Training touches the
# SEED SET (thousands of rows); scoring the 100 TB corpus is one
# narrow pass through the saved model's coefficient vector — no
# shuffle, no vocabulary broadcast beyond n_features weights.
# ---------------------------------------------------------------------------


def train_quality_model(
    labeled_docs: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 1 << 16,
    reg_param: float = 1e-3,
    max_iter: int = 50,
):
    """Fit the quality classifier on a labeled seed set (label 1 =
    keep-worthy, 0 = reject). Returns a PipelineModel; persist with
    ``model.write().overwrite().save(path)`` and reload with
    ``PipelineModel.load`` — the deployment trains once on the curated
    seed set and scores every ingest delta with the frozen weights.
    Tokenization matches the engine's text contract (lower,
    ``[a-z0-9]+``)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    tokens = labeled_docs.withColumn(
        "__toks", F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
    )
    pipe = Pipeline(
        stages=[
            HashingTF(inputCol="__toks", outputCol="__feat", numFeatures=n_features),
            LogisticRegression(
                featuresCol="__feat",
                labelCol=label_col,
                regParam=reg_param,
                maxIter=max_iter,
                standardization=False,
            ),
        ]
    )
    fitted = pipe.fit(tokens)
    # Strip the training summary: the freshly fitted LR model references
    # it, and the summary holds the SparkSession — shipping the model
    # inside a plan that crosses an RDD boundary then dies with
    # "Task not serializable". Persisted models carry no summary, so a
    # disk round-trip is the supported way to drop it (and matches the
    # deployment shape: train once, load frozen weights everywhere).
    import shutil
    import tempfile

    from pyspark.ml import PipelineModel

    tmp = tempfile.mkdtemp(prefix="quality_model_")
    try:
        fitted.write().overwrite().save(tmp)
        return PipelineModel.load(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def score_quality(model, docs: DataFrame, *, text_col: str = "text", score_col: str = "quality_prob") -> DataFrame:
    """Score documents with a trained quality model: appends
    ``score_col`` = P(keep | text). One narrow pass — hashing and the
    coefficient dot product are per-row, the model ships as task
    literals; filter on the score to gate an ingest."""
    from pyspark.ml.functions import vector_to_array

    tokens = docs.withColumn(
        "__toks", F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
    )
    scored = model.transform(tokens)
    prob = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.withColumn(score_col, prob).drop(
        "__toks", "__feat", "rawPrediction", "probability", "prediction"
    )
