"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

The driver compares row-count + schema + order-insensitive value-hash at
sf0.01. This harness is stricter: it aligns columns by name, sorts rows by
every column, and requires exact value equality (bit-exact for floats) —
if this passes, any reasonable canonicalization the driver uses passes.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from mlb_data_pipeline_spark.catalog import TABLES, table_path

_NULL = "\x00<NULL>"


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    return con


def _canon_cell(v):
    if v is None:
        return _NULL
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    if hasattr(v, "tzinfo") and getattr(v, "tzinfo", None) is not None:
        return v.replace(tzinfo=None)
    if hasattr(v, "tolist"):  # numpy scalars / arrays
        v = v.tolist() if getattr(v, "ndim", 0) else v.item()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    return v


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(row[i]) for i in order) for row in rows]
    return sorted(out, key=repr)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> None:
    scols = list(spark_df.columns)
    srows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={sorted(scols)} duckdb={sorted(dcols)}"
    )
    assert len(srows) == len(drows), f"{name}: row count spark={len(srows)} duckdb={len(drows)}"
    sc, dc = canon_rows(scols, srows), canon_rows(dcols, drows)
    for i, (a, b) in enumerate(zip(sc, dc)):
        assert a == b, f"{name}: row {i} differs\n spark={a}\n duckdb={b}"
