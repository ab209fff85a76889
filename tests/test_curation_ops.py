

def test_gopher_signals_rules(spark):
    from mlb_data_pipeline_spark.operators.curation import gopher_signals

    good = "the quick brown fox jumps over the lazy dog and then some " * 5
    rows = [
        (1, good),                                    # passes everything
        (2, "tiny text"),                             # word-count + stopwords fail
        (3, "- a\n- b\n- c\n* d\n• e"),               # all-bullet lines
        (4, ("trailing off... \nmore... \nagain... \nok " + good)),  # ellipsis lines
        (5, ("#### " * 30) + good),                   # symbol-heavy
        (6, "12 34 56 78 90 " * 20),                  # no alphabetic words
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r.doc_id: r for r in gopher_signals(df).collect()}
    assert got[1].gopher_pass
    assert not got[2].r_word_count and not got[2].r_stopwords
    assert not got[3].r_bullet_lines and got[3].n_bullet_lines == 5
    assert not got[4].r_ellipsis_lines and got[4].n_ellipsis_lines == 3
    assert not got[5].r_symbol_ratio and got[5].n_symbols == 120
    assert not got[6].r_alpha_words and got[6].n_alpha_words == 0
    # integer cross-multiplication == the published ratio semantics
    r = got[5]
    assert (10 * r.n_symbols <= r.n_words) == r.r_symbol_ratio


def test_time_split_boundaries_and_embargo(spark):
    import datetime

    import pytest
    from pyspark.sql import functions as F

    from mlb_data_pipeline_spark.operators.curation import time_split

    df = spark.createDataFrame(
        [(i, datetime.datetime(1996, 1, 1) + datetime.timedelta(days=i)) for i in range(10)],
        "id INT, ts TIMESTAMP",
    )
    got = {r.id: r.split for r in time_split(df, "ts", "1996-01-05", embargo_days=2, drop_embargo=False).collect()}
    # strict-before train, cutoff itself is embargoed, test starts at +embargo
    assert got == {0: "train", 1: "train", 2: "train", 3: "train",
                   4: "embargo", 5: "embargo",
                   6: "test", 7: "test", 8: "test", 9: "test"}
    dropped = {r.id for r in time_split(df, "ts", "1996-01-05", embargo_days=2).collect()}
    assert dropped == {0, 1, 2, 3, 6, 7, 8, 9}
    # zero embargo: the cutoff row goes straight to test, nothing dropped
    z = {r.id: r.split for r in time_split(df, "ts", "1996-01-05").collect()}
    assert z[4] == "test" and len(z) == 10
    # date-typed column takes the same boundaries
    d = df.withColumn("d", F.col("ts").cast("date"))
    gd = {r.id: r.split for r in time_split(d, "d", "1996-01-05", embargo_days=2).collect()}
    assert gd == {k: v for k, v in got.items() if v != "embargo"}
    with pytest.raises(ValueError):
        time_split(df, "ts", "1996-01-05", embargo_days=-1)


def test_length_buckets_and_padding_waste(spark):
    import pytest

    from mlb_data_pipeline_spark.operators.curation import (
        length_buckets,
        padding_waste_report,
    )

    df = spark.createDataFrame([(8,), (16,), (17,), (30,), (100,)], "dl INT")
    got = {r.dl: r.bucket for r in length_buckets(df, "dl", [16, 32]).collect()}
    # inclusive upper edges; overflow labeled -1
    assert got == {8: 16, 16: 16, 17: 32, 30: 32, 100: -1}
    rep = {r.bucket: r for r in padding_waste_report(df, "dl", [16, 32]).collect()}
    # bucket 16: rows (8,16), max 16 -> bucketed pad = 8; global max 100
    assert rep[16].pad_bucketed == (16 - 8) + (16 - 16)
    assert rep[16].pad_global == (100 - 8) + (100 - 16)
    assert rep[16].tokens_saved == 2 * (100 - 16)
    # overflow bucket pads nothing beyond itself vs global
    assert rep[-1].pad_bucketed == 0 and rep[-1].tokens_saved == 0
    # every bucket: saved == global - bucketed (accounting identity)
    for r in rep.values():
        assert r.tokens_saved == r.pad_global - r.pad_bucketed
    with pytest.raises(ValueError):
        length_buckets(df, "dl", [])
    with pytest.raises(ValueError):
        length_buckets(df, "dl", [32, 16])


def test_mixture_allocation_water_filling_properties(spark):
    """Allocation respects caps, exhausts the budget when capacity
    allows, redistributes a saturated source's unused share, and
    matches an independent iterative water-filling solver on a fuzz
    sweep (including budget 0, budget > total, single source)."""
    import random

    import pytest

    from mlb_data_pipeline_spark.operators.curation import mixture_allocation

    def reference(avail, weights, budget):
        alloc, B, active = {}, budget, set(avail)
        while active:
            W = sum(weights[s] for s in active)
            sat = {s for s in active if avail[s] * W <= weights[s] * B}
            if not sat:
                for s in active:
                    alloc[s] = (weights[s] * B) // W
                return alloc
            for s in sat:
                alloc[s] = avail[s]
                B -= avail[s]
                active.discard(s)
        return alloc

    random.seed(17)
    cases = [
        ({"a": 100, "b": 100}, {"a": 1, "b": 1}, 0),
        ({"a": 100, "b": 100}, {"a": 1, "b": 1}, 1000),   # budget > total
        ({"a": 10, "b": 1000}, {"a": 5, "b": 1}, 600),    # a saturates
        ({"a": 7}, {"a": 3}, 5),                           # single source
    ]
    cases += [
        (
            {f"s{i}": random.randint(0, 2000) for i in range(random.randint(1, 5))},
            None, random.randint(0, 4000),
        )
        for _ in range(10)
    ]
    for avail, weights, budget in cases:
        if weights is None:
            weights = {s: random.randint(1, 9) for s in avail}
        rows = [(s, a) for s, a in avail.items()]
        df = spark.createDataFrame(rows, "source STRING, n_tok BIGINT")
        got = {r.source: r.alloc for r in mixture_allocation(df, "source", "n_tok", weights, budget).collect()}
        assert got == reference(avail, weights, budget), (avail, weights, budget, got)
        assert all(got[s] <= avail[s] for s in avail)
    # unlisted strata are excluded, never silently budgeted
    df = spark.createDataFrame([("a", 50), ("ghost", 50)], "source STRING, n_tok BIGINT")
    out = mixture_allocation(df, "source", "n_tok", {"a": 1}, 100)
    assert {r.source for r in out.collect()} == {"a"}
    with pytest.raises(ValueError):
        mixture_allocation(df, "source", "n_tok", {"a": 0}, 10)
    with pytest.raises(ValueError):
        mixture_allocation(df, "source", "n_tok", {"a": 1}, -1)


def test_hash_fold_group_integrity_and_determinism(spark):
    import pytest
    from pyspark.sql import functions as F

    from mlb_data_pipeline_spark.operators.curation import hash_fold

    df = spark.createDataFrame(
        [(i, i % 20) for i in range(400)], "row_id INT, group_id INT"
    )
    out = hash_fold(df, "group_id", 4, salt="s")
    # a group never straddles folds
    assert out.groupBy("group_id").agg(F.count_distinct("fold").alias("k")).filter("k > 1").count() == 0
    # all folds in range and populated (20 groups over 4 folds)
    folds = {r.fold for r in out.select("fold").distinct().collect()}
    assert folds <= {0, 1, 2, 3} and len(folds) >= 2
    # partition-count independent
    again = {(r.row_id, r.fold) for r in hash_fold(df.repartition(7), "group_id", 4, salt="s").collect()}
    assert again == {(r.row_id, r.fold) for r in out.collect()}
    # different salts give different assignments somewhere
    other = {(r.row_id, r.fold) for r in hash_fold(df, "group_id", 4, salt="t").collect()}
    assert other != again
    with pytest.raises(ValueError):
        hash_fold(df, "group_id", 1)


def test_cdc_chunks_reassembly_and_insertion_stability(spark):
    """Chunks reassemble the doc exactly; a prefix insertion changes
    only the first chunk's text (boundaries are content-defined, so
    downstream cut characters are unchanged); short docs come back
    whole; chunk indices are dense from 0."""
    import random

    import pytest

    from mlb_data_pipeline_spark.operators.curation import cdc_chunks

    random.seed(3)
    base = "".join(random.choice("abcdef gh") for _ in range(400))
    docs = spark.createDataFrame(
        [(1, base), (2, "XY" + base), (3, "hi")], "doc_id BIGINT, text STRING"
    )
    rows = cdc_chunks(docs, "doc_id", "text", window=8, divisor=32).collect()
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_idx)):
        by_doc.setdefault(r.doc_id, []).append(r)
    assert "".join(r.chunk_text for r in by_doc[1]) == base
    assert "".join(r.chunk_text for r in by_doc[2]) == "XY" + base
    assert [r.chunk_text for r in by_doc[3]] == ["hi"]  # sub-window doc: one chunk
    # insertion stability: every chunk except the first is shared
    c1 = [r.chunk_text for r in by_doc[1]]
    c2 = [r.chunk_text for r in by_doc[2]]
    assert c1[1:] == c2[1:] and c1[0] != c2[0]
    # indices dense, offsets consistent
    for chunks in by_doc.values():
        assert [r.chunk_idx for r in chunks] == list(range(len(chunks)))
        pos = 0
        for r in chunks:
            assert r.char_start == pos and r.n_chars == len(r.chunk_text)
            pos += r.n_chars
    with pytest.raises(ValueError):
        cdc_chunks(docs, "doc_id", "text", window=0)
    with pytest.raises(ValueError):
        cdc_chunks(docs, "doc_id", "text", divisor=0)


def test_duplicate_chunk_fraction_flags_shared_boilerplate(spark):
    """Docs sharing a footer paragraph score dup chunks even though the
    docs as wholes are unique; a fully-unique doc scores zero; a doc
    whose whole text is copied scores everything."""
    import random

    from mlb_data_pipeline_spark.operators.curation import duplicate_chunk_fraction

    random.seed(4)

    def prose(n):
        return "".join(random.choice("abcdef gh") for _ in range(n))

    footer = prose(150)
    unique_a, unique_b, unique_c = prose(300), prose(300), prose(300)
    rows = [
        (1, unique_a + footer),
        (2, unique_b + footer),
        (3, unique_c),          # fully unique
        (4, unique_a + footer), # whole-text copy of 1
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r.doc_id: r for r in duplicate_chunk_fraction(docs, "doc_id", "text", divisor=32).collect()}
    assert got[3].n_dup_chunks == 0
    # docs 1 and 4 are identical: every chunk duplicated
    assert got[1].n_dup_chunks == got[1].n_chunks
    assert got[4].n_dup_chunks == got[4].n_chunks
    # doc 2 shares only the footer region: some but not all chunks
    assert 0 < got[2].n_dup_chunks < got[2].n_chunks


def test_remove_duplicate_chunks_keeps_canonical_and_unique_prose(spark):
    import random

    from mlb_data_pipeline_spark.operators.curation import remove_duplicate_chunks

    random.seed(4)

    def prose(n):
        return "".join(random.choice("abcdef gh") for _ in range(n))

    footer = prose(150)
    ua, ub = prose(300), prose(300)
    docs = spark.createDataFrame(
        [(1, ua + footer), (2, ub + footer), (3, ua + footer)],
        "doc_id BIGINT, text STRING",
    )
    got = {r.doc_id: r for r in remove_duplicate_chunks(docs, "doc_id", "text", divisor=32).collect()}
    # doc 1 is canonical for everything it carries: untouched
    assert got[1].clean_text == ua + footer and got[1].n_removed == 0
    # doc 2 keeps its unique prose, loses the shared footer region
    assert got[2].clean_text.startswith(ub[:100])
    assert 0 < got[2].n_removed < got[2].n_chunks
    assert footer[-50:] not in got[2].clean_text
    # doc 3 duplicates doc 1 entirely: rebuilt empty, row still present
    assert got[3].clean_text == "" and got[3].n_removed == got[3].n_chunks
    # corpus-wide: every chunk's text survives exactly once
    total_kept = sum(len(r.clean_text) for r in got.values())
    assert total_kept == len(ua + footer) + len(got[2].clean_text)


def test_boilerplate_store_day2_contract(spark, tmp_path):
    """The store makes yesterday's boilerplate visible to today's delta
    without reading corpus text; appends make today visible to
    tomorrow; replayed appends add nothing; probe reads only the
    store's parquet."""
    import random

    from mlb_data_pipeline_spark.operators.curation import (
        append_boilerplate_store,
        build_boilerplate_store,
        remove_known_boilerplate,
    )

    random.seed(6)

    def prose(n):
        return "".join(random.choice("abcdef gh") for _ in range(n))

    footer = prose(150)
    corpus = spark.createDataFrame(
        [(1, prose(300) + footer), (2, prose(300))], "doc_id BIGINT, text STRING"
    )
    store = str(tmp_path / "bp")
    build_boilerplate_store(corpus, "doc_id", "text", store, divisor=32)

    fresh = prose(250)
    delta = spark.createDataFrame(
        [(10, fresh + footer), (11, fresh)], "doc_id BIGINT, text STRING"
    )
    out = remove_known_boilerplate(delta, store, "doc_id", "text")
    # probe never reads corpus text: only the store parquet is input
    assert all("bp" in f for f in out.inputFiles())
    got = {r.doc_id: r for r in out.collect()}
    # doc 10: loses the corpus footer, keeps its fresh prose (it owns it)
    assert footer[-40:] not in got[10].clean_text
    assert got[10].clean_text.startswith(fresh[:80])
    # doc 11 repeats doc 10's fresh prose within the delta: min-id owns
    # every shared chunk; only doc 11's FINAL chunk survives (it ends at
    # end-of-doc, while doc 10's corresponding chunk runs on into the
    # footer, so their texts differ)
    assert got[11].n_removed >= got[11].n_chunks - 1
    assert len(got[11].clean_text) < len(fresh) // 2

    append_boilerplate_store(delta, "doc_id", "text", store)
    n = spark.read.parquet(store).count()
    append_boilerplate_store(delta, "doc_id", "text", store)  # replay
    assert spark.read.parquet(store).count() == n
    # day 3: the delta's fresh prose is corpus now
    day3 = spark.createDataFrame([(20, fresh)], "doc_id BIGINT, text STRING")
    g3 = remove_known_boilerplate(day3, store, "doc_id", "text").collect()[0]
    assert g3.clean_text == "" and g3.n_removed == g3.n_chunks
