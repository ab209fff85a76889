"""Round 14 — the metadata LOG STORE seam's contract
(operators/logstore.py, VERDICT r13 ask #5): the snapshot layer's
atomicity rests on exactly these primitives, so the contract is pinned
independently of any lake, and the routing is pinned by counting the
seam's calls during a real commit."""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from mlb_data_pipeline_spark.operators.logstore import (
    PosixLogStore,
    get_log_store,
    set_log_store,
)


def test_put_exclusive_single_winner(tmp_path):
    store = PosixLogStore()
    target = str(tmp_path / "meta" / "v000000000001.json")
    store.put_exclusive(target, b'{"version": 1}')
    with pytest.raises(FileExistsError):
        store.put_exclusive(target, b'{"version": "loser"}')
    # the winner's content is untouched and complete
    assert store.read(target) == b'{"version": 1}'
    # no stage debris left behind
    assert sorted(store.list(str(tmp_path / "meta"))) == ["v000000000001.json"]


def test_put_exclusive_many_racers_one_winner(tmp_path):
    """N threads race the same target: exactly one succeeds, and the
    surviving content is exactly one racer's full payload (atomic —
    never interleaved)."""
    store = PosixLogStore()
    target = str(tmp_path / "v000000000007.json")
    wins, errs = [], []
    payloads = [json.dumps({"writer": i}).encode() for i in range(8)]

    def racer(i):
        try:
            store.put_exclusive(target, payloads[i])
            wins.append(i)
        except FileExistsError:
            errs.append(i)

    ts = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert len(wins) == 1 and len(errs) == 7
    assert store.read(target) == payloads[wins[0]]


def test_list_read_exists_delete_roundtrip(tmp_path):
    store = PosixLogStore()
    d = str(tmp_path / "chain")
    assert store.list(d) == []  # missing dir: empty, not an error
    for v in (1, 2, 3):
        store.put_exclusive(os.path.join(d, f"v{v:012d}.json"), b"{}")
    assert len(store.list(d)) == 3
    assert store.exists(os.path.join(d, "v000000000002.json"))
    store.delete(os.path.join(d, "v000000000002.json"))
    assert not store.exists(os.path.join(d, "v000000000002.json"))
    store.delete_tree(d)
    assert store.list(d) == []


def test_data_path_is_executor_openable(tmp_path):
    store = PosixLogStore()
    p = store.data_path(str(tmp_path), "part-0.parquet")
    assert p == os.path.join(str(tmp_path), "part-0.parquet")


def test_snapshot_layer_routes_through_the_seam(spark, tmp_path):
    """A real commit + read must flow through get_log_store(): swap in
    a counting wrapper and watch put_exclusive/read/list fire. Zero
    semantic change — the wrapped store IS the POSIX store."""
    from mlb_data_pipeline_spark.operators.snapshots import (
        lake_write,
        read_snapshot,
        snapshot_info,
    )

    class Counting(PosixLogStore):
        def __init__(self):
            self.calls = {"put_exclusive": 0, "read": 0, "list": 0}

        def put_exclusive(self, path, data):
            self.calls["put_exclusive"] += 1
            return super().put_exclusive(path, data)

        def read(self, path):
            self.calls["read"] += 1
            return super().read(path)

        def list(self, dirpath):
            self.calls["list"] += 1
            return super().list(dirpath)

    counting = Counting()
    prev = get_log_store()
    set_log_store(counting)
    try:
        lake = str(tmp_path / "lake")
        df = spark.range(0, 10).select(F.col("id").alias("k"))
        lake_write(spark, df.coalesce(1), lake)
        assert counting.calls["put_exclusive"] == 1  # the v1 record
        assert snapshot_info(lake)["version"] == 1
        assert read_snapshot(spark, lake).count() == 10
        assert counting.calls["read"] >= 1 and counting.calls["list"] >= 1
    finally:
        set_log_store(prev)
