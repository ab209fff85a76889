"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`).

The round-7 modernization of the feed-source family: instead of a
driver-side fetch helper returning a DataFrame (sources/feeds.py
rss_source), the RSS corpus becomes a REAL pluggable source —
``spark.dataSource.register(RssDataSource)`` then
``spark.read.format("rss").load(path)`` — so feed ingestion composes
with everything the reader API gives (schema enforcement, partitioned
parallel reads: ONE partition per feed file, each parsed executor-side).

Parsing reuses the same regex item extraction as the classic helper
(CDATA, RFC-822 pubDate), so both paths stay semantics-identical —
pinned by test and by the r25 oracle.
"""

from __future__ import annotations

import glob
import os
import re
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

RSS_DDL = "link string, title string, published_ts timestamp, feed_file string"

_ITEM_RE = re.compile(r"<item>(.*?)</item>", re.S)
_TITLE_RE = re.compile(r"<title>(?:<!\[CDATA\[(.*?)\]\]>|(.*?))</title>", re.S)
_LINK_RE = re.compile(r"<link>(.*?)</link>", re.S)
_PUB_RE = re.compile(r"<pubDate>(.*?)</pubDate>", re.S)


def parse_rss_items(xml: str) -> list[tuple[str, str, datetime | None]]:
    """(link, title, published_ts) per <item> — CDATA-aware, RFC-822
    pubDate parsed to a naive UTC timestamp (the engine's session TZ)."""
    out = []
    for m in _ITEM_RE.finditer(xml):
        body = m.group(1)
        t = _TITLE_RE.search(body)
        l = _LINK_RE.search(body)  # noqa: E741
        p = _PUB_RE.search(body)
        title = (t.group(1) or t.group(2)).strip() if t else None
        link = l.group(1).strip() if l else None
        ts = None
        if p:
            ts = (
                datetime.strptime(p.group(1).strip(), "%a, %d %b %Y %H:%M:%S %Z")
                .replace(tzinfo=timezone.utc)
                .astimezone(timezone.utc)
                .replace(tzinfo=None)
            )
        out.append((link, title, ts))
    return out


class _RssFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class RssDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("rss source needs a path: .load('/dir/of/xml')")

    def partitions(self):
        # one partition per feed file: files parse in parallel on
        # executors, and a 100k-feed crawl scales with the file count
        files = sorted(glob.glob(os.path.join(self.path, "*.xml")))
        if not files:
            raise FileNotFoundError(f"no *.xml feeds under {self.path}")
        return [_RssFilePartition(f) for f in files]

    def read(self, partition: _RssFilePartition):
        with open(partition.path, encoding="utf-8") as fh:
            xml = fh.read()
        base = os.path.basename(partition.path)
        for link, title, ts in parse_rss_items(xml):
            yield (link, title, ts, base)


class RssDataSource(DataSource):
    """``spark.read.format("rss").load(dir)`` — register with
    ``spark.dataSource.register(RssDataSource)`` once per session."""

    @classmethod
    def name(cls) -> str:
        return "rss"

    def schema(self) -> str:
        return RSS_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return RssDataSourceReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> "RssStreamReader":
        return RssStreamReader(self.options)


class RssStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the source: `spark.readStream.format("rss")`.

    Offset = the sorted list boundary of feed files already consumed
    (a filename high-water mark — files must arrive with ascending
    names, the standard drop-dir contract). Each micro-batch parses
    only the NEW files; `readBetweenOffsets` replays a committed range
    deterministically for recovery, so delivery is exactly-once into
    the checkpointed sink."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("rss stream needs a path: .load('/dir/of/xml')")

    def initialOffset(self) -> dict:
        return {"last_file": ""}

    def _files_after(self, last: str, upto: str | None = None) -> list[str]:
        files = sorted(
            os.path.basename(f) for f in glob.glob(os.path.join(self.path, "*.xml"))
        )
        return [
            f for f in files if f > last and (upto is None or f <= upto)
        ]

    def _parse(self, names: list[str]) -> list[tuple]:
        # Materialized (not a generator): the simple-stream harness pickles
        # the batch into its prefetch cache. Bounded by one micro-batch of
        # NEW feed files, not the corpus.
        rows = []
        for name in names:
            with open(os.path.join(self.path, name), encoding="utf-8") as fh:
                xml = fh.read()
            for link, title, ts in parse_rss_items(xml):
                rows.append((link, title, ts, name))
        return rows

    def read(self, start: dict):
        fresh = self._files_after(start.get("last_file", ""))
        end = {"last_file": fresh[-1]} if fresh else dict(start)
        return self._parse(fresh), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._parse(
            self._files_after(start.get("last_file", ""), end.get("last_file"))
        )
