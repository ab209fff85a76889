"""Catalog: named access to the engine's tables.

The driver testdata (TESTDATA.md) is a TPC-H-ish star schema plus
``events`` (stream), ``documents`` (text corpus) and ``embeddings``
(vector table), one parquet file per table under a scale-factor dir.

``load_tables`` returns plain DataFrames; ``register_views`` additionally
registers them as temp views so the SQL surface works. Reads use the
parquet footer schema (no inference cost); filters/projections push down
to the scan (Parquet row-group stats + column projection).

Loaded tables are cached per (application, sf_dir, table): a DataFrame is
an immutable analyzed plan over an immutable testdata path, so re-loading
re-pays file listing + footer analysis for nothing — a catalog's whole job
is to hand out resolved relations (same role as the oracle's DuckDB
views). The cache is keyed by applicationId so a restarted session never
sees another session's plans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Resolve ``name`` to a DataFrame over ``sf_dir``'s parquet.

    SESSION SIDE EFFECT: on a cache-miss load this pins
    ``spark.sql.session.timeZone`` to UTC — the engine's determinism
    contract (and the DuckDB oracle's naive-timestamp semantics) assume
    it, and a vanilla driver session carries the host zone. A caller who
    deliberately pinned a different zone gets it overridden; a warning
    is emitted so the override is never silent (cache hits skip the pin,
    so without the warning behavior would depend on load order).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    tz = spark.conf.get("spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC"):
        if tz:  # never silent: a deliberate caller pin is being clobbered
            import warnings

            warnings.warn(
                f"load_table is overriding session timeZone {tz!r} -> UTC "
                "(engine determinism contract); results are UTC-normalized",
                stacklevel=2,
            )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # The driver may hand us a vanilla session; this conf is
        # runtime-settable and required to read TIMESTAMP(NANOS) parquet.
        # Set only when missing so repeated loads don't churn session state.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long (nanosAsLong); values are exact
        # microseconds, so integer-divide — no precision loss.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Parquet written with isAdjustedToUTC=false reads as TIMESTAMP_NTZ;
    # the engine (and every oracle) is built on session-TZ TIMESTAMP with
    # the session pinned to UTC, where the two are value-identical but
    # NTZ breaks instant-typed functions (unix_micros etc.). Normalize at
    # the catalog boundary — a zero-cost projection, wall-clock values
    # unchanged.
    ntz_cols = [fld for fld, dtype in df.dtypes if dtype == "timestamp_ntz"]
    if ntz_cols:
        from pyspark.sql import functions as F

        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


# ---------------------------------------------------------------------------
# Lake-table catalog with AUTOMATIC manifest-assisted planning (round 10).
#
# pruned_read / bloom_skippable_files (operators/layout.py) are opt-in:
# a user writing plain ``spark.read.parquet`` gets no file skipping from
# the manifests they built. Registering a lake table here closes that
# gap — ``lake_scan(spark, name, predicate)`` derives the box / Bloom
# probes FROM the predicate itself and routes the read through
# ``pruned_read`` with no caller opt-in, then applies the exact
# predicate on top (pruning stays a superset guarantee, so an
# unparseable conjunct only costs skipping, never rows). This is the
# Python-side analogue of a Catalyst data-skipping rule: the table
# registration is the "catalog", the predicate→box extraction is the
# planning hook.
#
# Supported conjunct shapes (top-level AND only, the same fragment a
# row-group pruner handles): ``col BETWEEN a AND b``, ``col >= a``,
# ``col > a``, ``col <= b``, ``col < b``, ``col = v`` (numeric -> box
# point; quoted string -> Bloom probe when a Bloom manifest is
# registered for the column), ``col IN (v1, v2, ...)`` (strings ->
# Bloom IN-list). Anything else contributes no skip clause.
# ---------------------------------------------------------------------------

_LAKE_TABLES: dict[tuple[str, str], dict] = {}

_INF = float("inf")


def register_lake_table(
    spark: SparkSession,
    name: str,
    path: str,
    scan_manifest: str | None = None,
    bloom_manifests: dict[str, str] | None = None,
) -> None:
    """Register a parquet lake directory plus its (optional) persisted
    manifests under ``name``. Scoped per application like the table
    cache — a restarted session re-registers."""
    _LAKE_TABLES[(spark.sparkContext.applicationId, name)] = {
        "path": path,
        "scan_manifest": scan_manifest,
        "bloom_manifests": dict(bloom_manifests or {}),
    }


_NUM = r"-?\d+(?:\.\d+)?"
_STR = r"'(?:[^']*)'"
_LIT = f"(?:{_NUM}|{_STR})"
_COL = r"[A-Za-z_][A-Za-z0-9_]*"


def _parse_lit(tok: str):
    tok = tok.strip()
    if tok.startswith("'"):
        return tok[1:-1]
    return float(tok) if "." in tok else int(tok)


def _extract_skip_clauses(predicate: str) -> tuple[dict, dict]:
    """(box, equals) from the predicate's top-level AND conjuncts.
    box: {col: (lo, hi)} with +-inf open ends (folded per column);
    equals: {col: scalar-or-list} for string equality / IN."""
    import re

    box: dict[str, list[float]] = {}
    equals: dict[str, object] = {}
    # keyword detection and the raw-text BETWEEN scan must not see
    # INSIDE string literals ("note = 'a OR b'", "c = 'x BETWEEN 1
    # AND 2'"): scrub literal contents first — equality extraction
    # below still reads the originals from the conjunct loop
    scrubbed = re.sub(_STR, "''", predicate)
    # disjunctions / negations make per-conjunct extraction UNSOUND (a
    # BETWEEN inside an OR branch must not prune the other branch's
    # files): bail to must-read-everything on any OR / NOT
    if re.search(r"(?i)\b(OR|NOT)\b", scrubbed):
        return {}, {}

    def fold(col: str, lo, hi) -> None:
        cur = box.setdefault(col, [-_INF, _INF])
        cur[0] = max(cur[0], lo)
        cur[1] = min(cur[1], hi)

    # BETWEEN first, from the scrubbed text: splitting on AND would
    # sever "x BETWEEN a AND b" into un-matchable fragments, and the
    # bounds of interest are numeric (never inside a string literal)
    for m in re.finditer(
        rf"({_COL})\s+(?i:BETWEEN)\s+({_LIT})\s+(?i:AND)\s+({_LIT})", scrubbed
    ):
        lo, hi = _parse_lit(m.group(2)), _parse_lit(m.group(3))
        if not isinstance(lo, str) and not isinstance(hi, str):
            fold(m.group(1), lo, hi)

    def _unwrap(c: str) -> str:
        # strip only BALANCED outer parens — a blind strip("()") would
        # eat an IN-list's closing paren
        c = c.strip()
        while c.startswith("(") and c.endswith(")"):
            depth = 0
            ok = True
            for ch in c[1:-1]:
                depth += {"(": 1, ")": -1}.get(ch, 0)
                if depth < 0:
                    ok = False
                    break
            if not ok:
                break
            c = c[1:-1].strip()
        return c

    for conj in re.split(r"(?i)\s+AND\s+", predicate.strip()):
        c = _unwrap(conj)
        m = re.fullmatch(rf"({_COL})\s*(>=|>|<=|<|=|==)\s*({_LIT})", c)
        if m:
            col, op, lit = m.group(1), m.group(2), _parse_lit(m.group(3))
            if op in ("=", "=="):
                # numeric equality skips BOTH ways: a box point for the
                # min/max manifest AND a Bloom probe if one is
                # registered for the column (dtype-pinned, so the int
                # literal hashes like the built column)
                equals[col] = lit
                if not isinstance(lit, str):
                    fold(col, lit, lit)
            elif isinstance(lit, str):
                continue
            elif op in (">=", ">"):
                fold(col, lit, _INF)
            else:
                fold(col, -_INF, lit)
            continue
        m = re.fullmatch(rf"({_COL})\s+(?i:IN)\s*\(({_LIT}(?:\s*,\s*{_LIT})*)\)", c)
        if m:
            vals = [_parse_lit(t) for t in re.findall(_LIT, m.group(2))]
            if vals:
                equals[m.group(1)] = vals
                if not any(isinstance(v, str) for v in vals):
                    fold(m.group(1), min(vals), max(vals))
        # unmatched conjunct: contributes no skip clause (must-read)
    return {c: (lo, hi) for c, (lo, hi) in box.items()}, equals


def lake_scan(spark: SparkSession, name: str, predicate: str | None = None) -> DataFrame:
    """Read a registered lake table, automatically skipping files the
    persisted manifests prove irrelevant to ``predicate`` — then apply
    the exact predicate. With no registered manifests (or no usable
    conjunct) this degrades to the plain whole-lake read + filter."""
    ent = _LAKE_TABLES.get((spark.sparkContext.applicationId, name))
    if ent is None:
        raise KeyError(f"unknown lake table {name!r}; register_lake_table first")
    if not predicate:
        return spark.read.parquet(ent["path"])
    box, equals = _extract_skip_clauses(predicate)
    blooms = [
        (ent["bloom_manifests"][c], v)
        for c, v in equals.items()
        if c in ent["bloom_manifests"]
    ]
    if ent["scan_manifest"] is None and not blooms:
        return spark.read.parquet(ent["path"]).filter(predicate)
    from .operators.layout import pruned_read

    if ent["scan_manifest"] is None:
        raise ValueError(
            f"lake table {name!r} has bloom manifests but no scan manifest; "
            "register scan_manifest (save_scan_manifest) — pruned_read "
            "needs the file inventory for its staleness guard"
        )
    df = pruned_read(spark, ent["path"], ent["scan_manifest"], box, bloom_filters=blooms)
    return df.filter(predicate)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
