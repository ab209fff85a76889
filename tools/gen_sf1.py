#!/usr/bin/env python
"""Generate an sf1 dataset (10x sf0.1) for the larger-scale bench datapoint.

The driver provides sf0.001/sf0.01/sf0.1 only (TESTDATA.md, read-only);
the >2x per-query Spark/DuckDB ratios at sf0.1 are fixed-overhead
artifacts at sub-second walls, so bench.py runs the oracled bench set at
sf1 as well to show the crossover. This script builds sf1 by 10x
key-offset replication of sf0.1 (deterministic, no RNG):

* dimensions (region, nation) copy as-is — TPC-H dimensions don't grow;
* fact/entity keys shift by copy_index * (max_key + 1), preserving
  referential structure and join fan-outs exactly;
* document text is token-prefixed per copy ("c3" + token), so shingle
  sets across copies are disjoint: near-dup pair density scales
  LINEARLY (10x), not quadratically (100x) — replicating text verbatim
  would make every doc a member of a 10-doc duplicate clique and turn
  the dedup bench into a different (and unrealistically dense) problem;
* embeddings rotate by copy_index, which preserves norms but decorrelates
  copies (sha-derived coordinates are direction-random), for the same
  linear-density reason.

Output: ./testdata_sf1/*.parquet next to the repo root (git-ignored,
~250 MB). bench.py regenerates it on demand when absent.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.1")
_DEFAULT_DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1")
COPIES = 10


def _src(t: str) -> str:
    return f"read_parquet('{SRC}/{t}.parquet')"


def generate(dst: str = _DEFAULT_DST, copies: int = COPIES) -> str:
    """Build into a sibling .tmp dir and rename at the end: a killed or
    failed run never leaves a half-populated ``dst`` that downstream
    existence checks would mistake for a complete dataset."""
    import shutil

    tmp = dst.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({copies})) AS c")

    def base(t: str, k: str) -> int:
        return con.execute(f"SELECT max({k}) + 1 FROM {_src(t)}").fetchone()[0]

    c_b, s_b, p_b, o_b = base("customer", "c_custkey"), base("supplier", "s_suppkey"), base("part", "p_partkey"), base("orders", "o_orderkey")
    e_b, u_b = base("events", "event_id"), base("events", "user_id")
    d_b, v_b = base("documents", "doc_id"), base("embeddings", "vec_id")

    sqls = {
        "region": f"SELECT * FROM {_src('region')}",
        "nation": f"SELECT * FROM {_src('nation')}",
        "customer": f"""
            SELECT c_custkey + c * {c_b} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM {_src('customer')}, copies""",
        "supplier": f"""
            SELECT s_suppkey + c * {s_b} AS s_suppkey, s_name, s_nationkey, s_acctbal
            FROM {_src('supplier')}, copies""",
        "part": f"""
            SELECT p_partkey + c * {p_b} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
            FROM {_src('part')}, copies""",
        "orders": f"""
            SELECT o_orderkey + c * {o_b} AS o_orderkey, o_custkey + c * {c_b} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {_src('orders')}, copies""",
        "lineitem": f"""
            SELECT l_orderkey + c * {o_b} AS l_orderkey, l_partkey + c * {p_b} AS l_partkey,
                   l_suppkey + c * {s_b} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {_src('lineitem')}, copies""",
        "events": f"""
            SELECT event_id + c * {e_b} AS event_id, ts, user_id + c * {u_b} AS user_id,
                   event_type, value, props
            FROM {_src('events')}, copies""",
        "documents": f"""
            SELECT doc_id, text, lang, source, CAST(length(text) AS BIGINT) AS n_chars
            FROM (
              SELECT doc_id + c * {d_b} AS doc_id,
                     CASE WHEN c = 0 THEN text
                          -- prefix every token ('a b' -> 'c3a c3b'): plain
                          -- string replace, ~10x faster than a per-token
                          -- list_transform at 50k docs
                          ELSE 'c' || CAST(c AS VARCHAR)
                               || replace(text, ' ', ' c' || CAST(c AS VARCHAR))
                     END AS text,
                     lang, source
              FROM {_src('documents')}, copies
            )""",
        "embeddings": f"""
            SELECT vec_id + c * {v_b} AS vec_id,
                   CASE WHEN c = 0 THEN embedding
                        ELSE list_concat(embedding[c + 1:], embedding[1:c])
                   END AS embedding,
                   label
            FROM {_src('embeddings')}, copies""",
    }
    for t, sql in sqls.items():
        con.execute(f"COPY ({sql}) TO '{tmp}/{t}.parquet' (FORMAT PARQUET)")
    shutil.rmtree(dst, ignore_errors=True)
    os.replace(tmp, dst)
    return dst


if __name__ == "__main__":
    out = generate(
        sys.argv[1] if len(sys.argv) > 1 else _DEFAULT_DST,
        int(sys.argv[2]) if len(sys.argv) > 2 else COPIES,
    )
    print(out)
