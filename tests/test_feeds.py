"""Feed sources (S4/S5/S6) with stub fetchers + binary sink (S9)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from mlb_data_pipeline_spark.sources.feeds import (
    rest_json_source,
    rss_source,
    scrape_articles,
    todays_links,
    write_binary_files,
)
from mlb_data_pipeline_spark.sources.fixtures import schedule_payloads
from mlb_data_pipeline_spark.sources.readers import parse_schedule_payloads

_RSS = """<?xml version="1.0"?><rss><channel>
<item><title>Walk-off win</title><link>https://x/1</link><pubDate>Wed, 01 May 2024 18:00:00 GMT</pubDate></item>
<item><title><![CDATA[Trade news]]></title><link>https://x/2</link><pubDate>Tue, 30 Apr 2024 12:00:00 GMT</pubDate></item>
<item><title>Old story</title><link>https://x/3</link><pubDate>Mon, 01 Apr 2024 09:00:00 GMT</pubDate></item>
</channel></rss>"""


def test_rest_json_source_roundtrip(spark):
    payloads = dict(zip(["https://api/sched?d=1", "https://api/sched?d=2"], schedule_payloads(2)))
    raw = rest_json_source(spark, list(payloads), payloads.__getitem__)
    assert raw.count() == 2
    games = parse_schedule_payloads(raw)
    assert games.count() > 0
    assert games.filter(F.col("game_pk").isNull()).count() == 0


def test_rss_source_and_today_filter(spark):
    feed = rss_source(spark, ["https://feed/a"], lambda u: _RSS).cache()
    rows = {r.link: r for r in feed.collect()}
    assert set(rows) == {"https://x/1", "https://x/2", "https://x/3"}
    assert rows["https://x/2"].title == "Trade news"  # CDATA unwrapped
    assert rows["https://x/1"].published_ts is not None

    links = {r.link for r in todays_links(feed, "2024-05-01").collect()}
    assert links == {"https://x/1"}
    # no links "today" -> top-3 fallback (mlb_pipeline_dag.py:53-57)
    links = {r.link for r in todays_links(feed, "2024-06-01", fallback_n=2).collect()}
    assert links == {"https://x/1", "https://x/2"}


def test_rss_single_digit_day_parses(spark):
    # RFC 822 allows "9 Mar 2024" (no leading zero) — pattern must be
    # lenient "d", not "dd"
    xml = (
        '<?xml version="1.0"?><rss><channel>'
        "<item><title>One digit</title><link>https://x/9</link>"
        "<pubDate>Fri, 9 Mar 2024 08:05:00 GMT</pubDate></item>"
        "</channel></rss>"
    )
    feed = rss_source(spark, ["https://feed/b"], lambda u: xml)
    row = feed.first()
    assert row.published_ts is not None
    assert row.published_ts.strftime("%Y-%m-%d") == "2024-03-09"


def test_scrape_articles_title_and_body(spark):
    pages = spark.createDataFrame(
        [
            ("u1", "<html><h1>Big <b>Win</b></h1><p>First para.</p><p>Second <i>one</i>.</p></html>"),
            ("u2", "<html><p>No headline here.</p></html>"),
            ("u3", "<html><h1>Empty body</h1></html>"),
        ],
        "url STRING, html STRING",
    )
    got = {r.url: (r.title, r.body) for r in scrape_articles(pages).collect()}
    assert got["u1"] == ("Big Win", "First para. Second one.")
    assert got["u2"][0] is None  # missing <h1> -> NULL (caller defaults 'Untitled')
    assert got["u3"] == ("Empty body", "")


def test_write_binary_files_layout(spark, tmp_path):
    root = str(tmp_path / "media")
    df = spark.createDataFrame(
        [
            ("audio", dt.date(2024, 5, 1), "ep1.mp3", b"\x00\x01\x02"),
            ("audio", dt.date(2024, 5, 2), "ep2.mp3", b"\xff" * 10),
            ("scripts", dt.date(2024, 5, 1), "ep1.txt", b"hello"),
        ],
        "kind STRING, dt DATE, file_name STRING, payload BINARY",
    )
    write_binary_files(df, root)
    assert open(os.path.join(root, "audio", "20240501", "ep1.mp3"), "rb").read() == b"\x00\x01\x02"
    assert open(os.path.join(root, "audio", "20240502", "ep2.mp3"), "rb").read() == b"\xff" * 10
    assert open(os.path.join(root, "scripts", "20240501", "ep1.txt"), "rb").read() == b"hello"


def test_python_datasource_matches_classic_helper(spark, tmp_path):
    """The pluggable spark.read.format('rss') source and the classic
    rss_source helper must parse identically (same regex kernel)."""
    from mlb_data_pipeline_spark.sources.feeds import rss_source
    from mlb_data_pipeline_spark.sources.pydatasource import RssDataSource

    xml = """<?xml version="1.0"?><rss><channel>
<item><title><![CDATA[A &amp; B]]></title><link>https://x/1</link>
<pubDate>Thu, 28 Mar 2024 14:00:00 GMT</pubDate></item>
<item><title>No date item</title><link>https://x/2</link></item>
</channel></rss>"""
    (tmp_path / "f.xml").write_text(xml)
    spark.dataSource.register(RssDataSource)
    via_source = {
        (r.link, r.title, r.published_ts)
        for r in spark.read.format("rss").load(str(tmp_path)).collect()
    }
    via_helper = {
        (r.link, r.title, r.published_ts)
        for r in rss_source(spark, ["u"], fetcher=lambda u: xml).collect()
    }
    assert via_source == via_helper
    assert ("https://x/2", "No date item", None) in via_source


def test_python_datasource_partition_per_file(spark, tmp_path):
    from mlb_data_pipeline_spark.sources.pydatasource import RssDataSource

    for i in range(3):
        (tmp_path / f"f{i}.xml").write_text(
            f"<rss><channel><item><title>t{i}</title><link>l{i}</link></item></channel></rss>"
        )
    spark.dataSource.register(RssDataSource)
    df = spark.read.format("rss").load(str(tmp_path))
    assert df.rdd.getNumPartitions() == 3  # one partition per feed file
    assert {r.feed_file for r in df.collect()} == {"f0.xml", "f1.xml", "f2.xml"}
    import pytest

    with pytest.raises(Exception):
        spark.read.format("rss").load(str(tmp_path / "empty")).collect()


def test_python_datasource_streaming(spark, tmp_path):
    """spark.readStream.format('rss'): micro-batches advance a filename
    high-water mark; a second availableNow run with the SAME checkpoint
    picks up only files that arrived in between."""
    from mlb_data_pipeline_spark.sources.pydatasource import RssDataSource

    feed_dir = tmp_path / "feeds"
    feed_dir.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def feed(name, n):
        items = "".join(
            f"<item><title>{name}-t{i}</title><link>{name}/l{i}</link></item>"
            for i in range(n)
        )
        (feed_dir / f"{name}.xml").write_text(f"<rss><channel>{items}</channel></rss>")

    feed("a", 2)
    feed("b", 1)
    spark.dataSource.register(RssDataSource)

    def run():
        q = (
            spark.readStream.format("rss")
            .load(str(feed_dir))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    first = {(r.link, r.feed_file) for r in spark.read.parquet(out).collect()}
    assert first == {("a/l0", "a.xml"), ("a/l1", "a.xml"), ("b/l0", "b.xml")}
    feed("c", 1)
    run()
    second = {(r.link, r.feed_file) for r in spark.read.parquet(out).collect()}
    assert second == first | {("c/l0", "c.xml")}  # only the new file, no replays
