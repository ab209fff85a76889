"""S12 — warehouse layering: raw → staging → analytics.

The reference declares this as BigQuery datasets (terraform/main.tf:46-66)
with dbt materializations (dbt/dbt_project.yml:22-27: staging = views,
marts = tables) but ships no model SQL. The Spark-native form: one SQL
database per layer over parquet; staging models are unmaterialized views
(pure Catalyst rewrites — zero storage, predicate pushdown flows through
them into the raw scans); marts are materialized parquet tables.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession, Window

LAYERS = ("raw", "staging", "analytics")


def drop_table(spark: SparkSession, layer: str, name: str) -> None:
    """Drop a managed table AND its on-disk location. The warehouse dir
    outlives the in-memory catalog (a new session starts with an empty
    catalog over the same ``spark-warehouse/``), so a plain DROP TABLE IF
    EXISTS misses orphaned locations and the next save fails with
    LOCATION_ALREADY_EXISTS."""
    spark.sql(f"DROP TABLE IF EXISTS {layer}.{name}")
    try:
        loc = urlparse(spark.catalog.getDatabase(layer).locationUri).path
        shutil.rmtree(os.path.join(loc, name), ignore_errors=True)
    except Exception:  # layer database absent — nothing on disk to clean  # noqa: BLE001
        pass


def create_layers(spark: SparkSession, warehouse_dir: str | None = None) -> None:
    for layer in LAYERS:
        loc = f" LOCATION '{warehouse_dir}/{layer}.db'" if warehouse_dir else ""
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {layer}{loc}")


def load_raw(spark: SparkSession, name: str, df: DataFrame, partition_cols: list[str] | None = None) -> None:
    """Materialize a source table into the raw layer."""
    drop_table(spark, "raw", name)
    writer = df.write.mode("overwrite").format("parquet")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.saveAsTable(f"raw.{name}")


def create_staging_view(spark: SparkSession, name: str, sql: str) -> None:
    """Staging model = view (dbt `staging: +materialized: view`)."""
    spark.sql(f"CREATE OR REPLACE VIEW staging.{name} AS {sql}")


def materialize_mart(spark: SparkSession, name: str, sql: str) -> None:
    """Mart = materialized table (dbt `marts: +materialized: table`)."""
    drop_table(spark, "analytics", name)
    spark.sql(f"CREATE TABLE analytics.{name} USING parquet AS {sql}")


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str = "change_ts",
) -> DataFrame:
    """Slowly-changing-dimension Type-2 merge — the warehouse-history
    half of S12 the reference's dbt layering implies but never ships:
    ``current`` is the versioned dimension (keys + attrs + valid_from +
    valid_to, NULL valid_to = open row); ``changes`` carries new
    attribute values stamped ``ts_col``. Per key: an attribute change
    CLOSES the open row (valid_to = change ts) and INSERTS a new open
    row; an identical change is a no-op; an unseen key inserts its
    first open row; closed history always passes through untouched.
    A change stamped EARLIER than the open row's valid_from is dropped
    as stale (out-of-order protection: last-writer-wins by timestamp,
    so the history never contains an inverted valid_to < valid_from
    interval — the case a late-replayed older batch would otherwise
    create).

    Multiple changes per key in one batch collapse to the latest by
    (ts desc) first — one window — so the operator is idempotent on
    re-delivered change feeds. Change detection hashes each attr
    separately and concats the digests (injection-proof: no value can
    shift bytes into a neighbor — the ``dataset_diff`` contract).
    Everything is equi-joins + unions on the key: one shuffle family,
    no driver-side state, history growth is O(changed keys) per batch.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    fp = lambda side: F.md5(  # noqa: E731
        F.concat(
            *[
                F.coalesce(F.md5(F.col(f"{side}{c}").cast("string")), F.lit("-"))
                for c in attr_cols
            ]
        )
    )
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *key_cols,
            *[F.col(c).alias(f"__n_{c}") for c in attr_cols],
            F.col(ts_col).alias("__ts"),
        )
    )
    open_rows = current.filter(F.col("valid_to").isNull())
    closed_rows = current.filter(F.col("valid_to").isNotNull())
    j = open_rows.join(latest, key_cols, "full_outer")
    differs = fp("") != fp("__n_")
    has_open = F.col("valid_from").isNotNull()
    has_chg = F.col("__ts").isNotNull()
    # Out-of-order guard: a change stamped BEFORE the open row's
    # valid_from is stale information (the open row already reflects a
    # newer state). Closing with it would write valid_to < valid_from —
    # an inverted interval — so late changes are no-ops (the streaming
    # form's late-arriving replayed batch lands here). Pinned by test.
    late = has_open & has_chg & (F.col("__ts") < F.col("valid_from"))
    # surviving open rows: untouched keys, no-op changes, late changes
    keep_open = j.filter(has_open & (~has_chg | ~differs | late)).select(
        *key_cols, *attr_cols, "valid_from", "valid_to"
    )
    # closed by this batch
    newly_closed = j.filter(has_open & has_chg & differs & ~late).select(
        *key_cols, *attr_cols, "valid_from", F.col("__ts").alias("valid_to")
    )
    # inserted by this batch (changed keys and brand-new keys)
    new_open = j.filter(has_chg & (~has_open | (differs & ~late))).select(
        *key_cols,
        *[F.col(f"__n_{c}").alias(c) for c in attr_cols],
        F.col("__ts").alias("valid_from"),
        F.lit(None).cast(current.schema["valid_to"].dataType).alias("valid_to"),
    )
    return closed_rows.select(*key_cols, *attr_cols, "valid_from", "valid_to").unionByName(
        keep_open
    ).unionByName(newly_closed).unionByName(new_open)


def build_rollup_store(
    df: DataFrame,
    path: str,
    partition_col: str,
    group_cols: list[str],
    value_col: str,
) -> None:
    """Incremental-aggregation store (materialized partial rollup —
    the warehouse pattern behind every 'daily partition feeds monthly
    dashboards' mart): persist per-(partition, groups) PARTIAL
    aggregates (n + an exact DECIMAL sum) partitioned by
    ``partition_col``. Coarser rollups then combine partials
    (sum-of-sums, count-of-counts) without touching fact rows, and a
    late-arriving day overwrites ONE partition directory. The partial
    sum stays in the decimal domain end-to-end, so partial-of-partials
    is exact and order-independent — combining partials is
    bit-identical to aggregating the facts directly (the r02 oracle).
    Overwrites ``path``."""
    from pyspark.sql import functions as F

    from ..functions.numeric import dec

    (
        df.groupBy(partition_col, *group_cols)
        .agg(
            F.count("*").alias("n"),
            # pinned store type: maintenance rewrites (CDC retractions)
            # must write the SAME decimal width or partition footers fork
            F.sum(dec(value_col)).cast("decimal(30,6)").alias("partial_sum"),
        )
        .repartition(F.col(partition_col))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path.rstrip("/"))
    )


def rollup_from_store(
    spark: SparkSession,
    path: str,
    group_exprs: list,
    scale: int = 2,
) -> DataFrame:
    """Combine persisted partials to any coarser grain: sum-of-counts,
    sum-of-partial-sums (exact decimal), rounded to ``scale`` at the
    END — one scan of the (tiny) partial table, zero fact scans."""
    from pyspark.sql import functions as F

    p = spark.read.parquet(path.rstrip("/"))
    return p.groupBy(*group_exprs).agg(
        F.sum("n").alias("n"),
        F.round(F.sum("partial_sum"), scale).cast("double").alias("total"),
    )


def apply_changelog(
    base: DataFrame,
    log: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """CDC apply: materialize a table from a base snapshot plus a
    change log of (keys..., seq, op, attrs...) rows where op is
    'I'/'U' (upsert) or 'D' (delete) — the Debezium/binlog-consumer
    shape next to ``scd2_apply`` (which keeps history; this keeps the
    LATEST state).

    Per key only the HIGHEST-``seq_col`` log row decides: earlier ops
    are superseded (so the apply is idempotent on replayed/compacted
    logs and insensitive to log duplication). ``seq_col`` must be a
    total order per key (a binlog offset / LSN; a bare timestamp with
    ties is not enough — compose one the way r20 composes its order
    key). One window over the log (shuffle on key), one anti-join on
    the base, one union — the log is delta-sized, the base is scanned
    once."""
    from pyspark.sql import functions as F

    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    latest = (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    untouched = base.join(latest.select(*key_cols), key_cols, "left_anti")
    upserts = latest.filter(F.col(op_col) != "D").select(*base.columns)
    return untouched.unionByName(upserts)


def update_rollup_store_cdc(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    partition_col: str,
    group_cols: list[str],
    value_col: str,
    op_col: str = "op",
    old_prefix: str = "old_",
) -> None:
    """Incremental view maintenance WITH RETRACTIONS: keep the partial
    rollup store current from a CDC changelog without re-aggregating
    any fact partition. Change rows carry the Debezium shape — new
    image columns plus ``old_``-prefixed before-image columns:

    * ``I``: +1 / +value at the NEW (partition, groups);
    * ``D``: -1 / -old_value at the OLD key;
    * ``U``: both — which handles rows that MOVE between groups or
      partitions, and nets to a pure value delta when they don't.

    Signed partials aggregate like any partial (sum-of-sums in the
    exact decimal domain), merge into the store rows of TOUCHED
    partitions only, and land via dynamic partition overwrite — cost
    is O(changes + touched partition partials), never O(store) or
    O(facts). Groups whose count nets to zero leave the store.
    Combined with ``rollup_from_store`` the maintained store stays
    bit-identical to re-aggregating the CDC-applied facts (the r57
    oracle). The changelog must be the NET effect per row version
    (dedup replays with ``apply_changelog``'s seq rule first);
    re-applying the same changelog would double the deltas."""
    from pyspark.sql import functions as F

    from ..functions.numeric import dec

    new_side = changes.filter(F.col(op_col).isin("I", "U")).select(
        F.col(partition_col),
        *[F.col(c) for c in group_cols],
        F.lit(1).cast("long").alias("__dn"),
        dec(value_col).alias("__dv"),
    )
    old_side = changes.filter(F.col(op_col).isin("U", "D")).select(
        *[F.col(old_prefix + c).alias(c) for c in (partition_col, *group_cols)],
        F.lit(-1).cast("long").alias("__dn"),
        (-dec(old_prefix + value_col)).alias("__dv"),
    )
    delta = (
        new_side.unionByName(old_side)
        .groupBy(partition_col, *group_cols)
        .agg(F.sum("__dn").alias("n"), F.sum("__dv").cast("decimal(30,6)").alias("partial_sum"))
    )
    _merge_signed_delta(spark, path, delta, partition_col, group_cols)


def _merge_signed_delta(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    partition_col: str,
    group_cols: list[str],
) -> None:
    """The IVM merge tail shared by the CDC-changelog and the
    snapshot-CDC maintainers: signed partials merge into TOUCHED
    partitions only (dynamic overwrite), zero-count groups leave the
    store, emptied partition dirs drop explicitly (escaped paths)."""
    from pyspark.sql import functions as F

    # touched partitions: bounded metadata collect (partition values)
    touched = [r[0] for r in delta.select(partition_col).distinct().collect()]
    if not touched:
        return
    base = path.rstrip("/")
    cur = spark.read.parquet(base).filter(F.col(partition_col).isin(touched))
    merged = (
        cur.select(partition_col, *group_cols, "n", "partial_sum")
        .unionByName(delta)
        .groupBy(partition_col, *group_cols)
        .agg(
            F.sum("n").alias("n"),
            F.sum("partial_sum").cast("decimal(30,6)").alias("partial_sum"),
        )
        .filter(F.col("n") != 0)
        .localCheckpoint(eager=True)  # sever lineage from the dirs being replaced
    )
    (
        merged.repartition(F.col(partition_col))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(base)
    )
    # a partition whose every group nets to zero produces NO merged
    # rows, so dynamic overwrite never touches its directory — the
    # stale partials would silently survive. Drop those dirs explicitly.
    surviving = {r[0] for r in merged.select(partition_col).distinct().collect()}
    emptied = [p for p in touched if p not in surviving]
    if emptied:
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        for p in emptied:
            # directory names carry Spark's partition-path escaping
            # (space, ':', '%', ... -> %XX): escape the value the same
            # way Spark's writer did, or fs.exists() misses the real
            # directory and the stale partials silently survive
            esc = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(
                str(p)
            )
            dirpath = jvm.org.apache.hadoop.fs.Path(f"{base}/{partition_col}={esc}")
            fs = dirpath.getFileSystem(conf)
            if fs.exists(dirpath):
                fs.delete(dirpath, True)


def refresh_rollup_from_lake(
    spark: SparkSession,
    lake_path: str,
    store_path: str,
    partition_col: str,
    group_cols: list[str],
    value_col: str,
) -> dict:
    """Materialized-view maintenance driven by the LAKE'S OWN COMMIT
    LOG (round 11 — snapshots x IVM): the rollup store remembers the
    lake version it reflects (``_ivm_state.json``); a refresh reads
    ``snapshots.read_changes(last, head)`` — the net row diff computed
    from the file-set diff, shared files cancel UNOPENED — folds it to
    signed partials (+n/+value per insert multiplicity, -n/-value per
    delete), and merges into touched partitions only. No changelog
    infrastructure: any append / DELETE / UPDATE / MERGE / rollback
    that committed since the last refresh flows through, and the
    refresh cost is the CHURN between the two versions, never the
    facts or the store.

    First call (no state) builds the store from the current snapshot.
    Returns {"built"|"refreshed"|"noop", from_version, to_version}."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from ..functions.numeric import dec
    from ..operators.snapshots import current_version, read_changes, read_snapshot

    head = current_version(lake_path)
    if head is None:
        raise ValueError(f"{lake_path!r} is not a snapshot lake (no commits)")
    state_file = _os.path.join(store_path.rstrip("/"), "_ivm_state.json")
    if not _os.path.exists(state_file):
        build_rollup_store(
            read_snapshot(spark, lake_path), store_path, partition_col, group_cols, value_col
        )
        with open(state_file + ".tmp", "w") as fh:
            _json.dump({"lake_version": head}, fh)
        _os.replace(state_file + ".tmp", state_file)
        return {"status": "built", "from_version": None, "to_version": head}
    with open(state_file) as fh:
        last = int(_json.load(fh)["lake_version"])
    if last == head:
        return {"status": "noop", "from_version": last, "to_version": head}
    try:
        ch = read_changes(spark, lake_path, last, head)
    except ValueError:
        # the remembered base version was expired by vacuum_lake: the
        # incremental path is gone, but the store must not be bricked
        # (round 12, ADVICE fix) — rebuild wholesale from the current
        # snapshot, exactly the first-call path
        import shutil as _shutil

        _shutil.rmtree(store_path, ignore_errors=True)
        build_rollup_store(
            read_snapshot(spark, lake_path), store_path, partition_col, group_cols, value_col
        )
        with open(state_file + ".tmp", "w") as fh:
            _json.dump({"lake_version": head}, fh)
        _os.replace(state_file + ".tmp", state_file)
        return {"status": "rebuilt", "from_version": last, "to_version": head}
    sign = F.when(F.col("__change") == "insert", F.lit(1)).otherwise(F.lit(-1))
    delta = (
        ch.groupBy(partition_col, *group_cols)
        .agg(
            F.sum(sign * F.col("__n")).cast("long").alias("n"),
            F.sum(sign.cast("decimal(30,6)") * dec(value_col) * F.col("__n"))
            .cast("decimal(30,6)")
            .alias("partial_sum"),
        )
        .filter((F.col("n") != 0) | (F.col("partial_sum") != 0))
    )
    _merge_signed_delta(spark, store_path, delta, partition_col, group_cols)
    with open(state_file + ".tmp", "w") as fh:
        _json.dump({"lake_version": head}, fh)
    _os.replace(state_file + ".tmp", state_file)
    return {"status": "refreshed", "from_version": last, "to_version": head}
