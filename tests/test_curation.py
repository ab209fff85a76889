"""Curation operator invariants (q60-q63 family)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlb_data_pipeline_spark.operators.curation import (
    hash_split,
    pack_sequences,
    redact,
    repeated_ngram_fraction,
)


def test_hash_split_deterministic_and_partition_independent(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id BIGINT")
    a = {r.doc_id: r.split for r in hash_split(df, "doc_id").collect()}
    b = {r.doc_id: r.split for r in hash_split(df.repartition(13), "doc_id").collect()}
    assert a == b  # membership is a function of the key alone
    # buckets are md5-uniform: the 80/10/10 target holds within a few %
    n = len(a)
    frac = {s: sum(1 for v in a.values() if v == s) / n for s in ("train", "val", "test")}
    assert abs(frac["train"] - 0.80) < 0.05
    assert abs(frac["val"] - 0.10) < 0.03
    assert abs(frac["test"] - 0.10) < 0.03


def test_hash_split_stable_under_subsetting(spark):
    # late-arriving rows for known keys must land in the same split
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id BIGINT")
    full = {r.doc_id: r.split for r in hash_split(df, "doc_id").collect()}
    sub = {r.doc_id: r.split for r in hash_split(df.filter(F.col("doc_id") % 3 == 0), "doc_id").collect()}
    assert all(full[k] == v for k, v in sub.items())


def test_repeated_ngram_fraction_bounds_and_signal(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),                # all trigrams distinct
            (2, "x y z x y z x y z x y z"),        # heavy repetition
            (3, "one two"),                        # < n tokens -> 0.0
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {r.doc_id: r.frac for r in df.select("doc_id", repeated_ngram_fraction("text").alias("frac")).collect()}
    assert got[1] == 0.0
    assert 0.5 < got[2] < 1.0  # 10 trigram slots, only 3 distinct
    assert got[3] == 0.0


def test_pack_sequences_chunk_invariants(spark):
    rows = [(i, 100 + (i * 37) % 300) for i in range(200)]  # sizes 100..399
    df = spark.createDataFrame(rows, "doc_id BIGINT, n_tok INT")
    packed = pack_sequences(df, "doc_id", "n_tok", budget=1000).collect()
    by_doc = sorted(packed, key=lambda r: r.doc_id)
    chunks = [r.chunk_id for r in by_doc]
    assert chunks[0] == 0
    assert all(a <= b for a, b in zip(chunks, chunks[1:]))  # nondecreasing in order
    # each row's chunk is exactly floor(cum_before / budget)
    cum = 0
    for r in by_doc:
        assert r.chunk_id == cum // 1000
        cum += r.n_tok
    # chunk ids are contiguous (bin-fill never skips a bin: sizes < budget)
    assert sorted(set(chunks)) == list(range(max(chunks) + 1))


def test_redact_scrubs_and_is_idempotent(spark):
    df = spark.createDataFrame(
        [("write me at a.b+c@mail.example.org or call 415-555-0199, ok?",)], "text STRING"
    )
    once = df.select(redact("text").alias("r"))
    [row] = once.collect()
    assert "<EMAIL>" in row.r and "<PHONE>" in row.r
    assert "@" not in row.r and "415-555" not in row.r
    [row2] = once.select(redact("r").alias("r2")).collect()
    assert row2.r2 == row.r  # idempotent: placeholders don't re-match


def test_stratified_hash_sample_monotone_and_strict(spark):
    """Mixing-sampler invariants: deterministic across calls, a smaller
    fraction selects a SUBSET of a larger one (same salt), unlisted
    strata are dropped entirely, and kept fractions land near target."""
    from mlb_data_pipeline_spark.operators.curation import stratified_hash_sample

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "k BIGINT, s STRING")
    small = {r.k for r in stratified_hash_sample(df, "k", "s", {"a": 0.2}).collect()}
    big = {r.k for r in stratified_hash_sample(df, "k", "s", {"a": 0.5}).collect()}
    again = {r.k for r in stratified_hash_sample(df, "k", "s", {"a": 0.2}).collect()}
    assert small == again  # deterministic
    assert small <= big  # monotone in fraction
    assert all(k % 2 == 0 for k in big)  # stratum "b" unlisted -> dropped
    assert 0.14 < len(small) / 1000 < 0.26 and 0.42 < len(big) / 1000 < 0.58
    salted = {r.k for r in stratified_hash_sample(df, "k", "s", {"a": 0.2}, salt="x").collect()}
    assert salted != small  # different salt -> different (independent) sample


def test_cross_corpus_span_overlap_flags_contamination(spark):
    """A corpus doc embedding a benchmark doc's 8-token span is flagged;
    clean docs are not; benchmark-side spans are never frequency-capped."""
    from mlb_data_pipeline_spark.operators.dedup import cross_corpus_span_overlap

    probe = " ".join(f"p{j}" for j in range(8))
    bench = spark.createDataFrame([(900, probe + " " + " ".join(f"e{j}" for j in range(10)))],
                                  "doc_id BIGINT, text STRING")
    corpus = spark.createDataFrame(
        [(0, " ".join(f"a{j}" for j in range(30)) + " " + probe),
         (1, " ".join(f"b{j}" for j in range(30)))],
        "doc_id BIGINT, text STRING",
    )
    got = {(r.corpus_id, r.bench_id): r.n_shared_spans
           for r in cross_corpus_span_overlap(corpus, bench, "doc_id", "text").collect()}
    assert got == {(0, 900): 1}


def test_quality_report_detects_planted_violations(spark):
    """Each expectation fires on its planted bad row and only that row;
    a clean frame passes everything."""
    from mlb_data_pipeline_spark.operators.quality import (
        expect_foreign_key,
        expect_not_null,
        expect_range,
        expect_regex,
        expect_unique,
        quality_report,
    )

    df = spark.createDataFrame(
        [
            (1, "a@x.org", 10.0),
            (2, "b@y.org", 20.0),
            (2, "dup-key", 30.0),      # unique violation
            (3, None, 40.0),           # not_null violation
            (4, "no-at-sign", -5.0),   # regex + range violations
        ],
        "k BIGINT, email STRING, amount DOUBLE",
    )
    rep = {r.check: (r.violations, r.passed) for r in quality_report(
        df,
        [
            expect_not_null("email"),
            expect_unique("k"),
            expect_range("amount", 0, 100),
            expect_regex("email", r"^[^@]+@[^@]+$"),
        ],
    ).collect()}
    assert rep["not_null(email)"] == (1, False)
    assert rep["unique(k)"] == (1, False)
    assert rep["range(amount,0,100)"] == (1, False)
    assert rep["regex(email)"] == (2, False)  # "dup-key" and "no-at-sign"

    parent = spark.createDataFrame([(1,), (2,)], "pk BIGINT")
    child = spark.createDataFrame([(1,), (2,), (9,)], "fk BIGINT")
    [fk] = expect_foreign_key(child, "fk", parent, "pk").collect()
    assert (fk.violations, fk.passed) == (1, False)

    clean = quality_report(df.filter("k = 1"), [expect_not_null("email"), expect_unique("k")])
    assert all(r.passed for r in clean.collect())


def test_heavy_hitter_sketch_exact_at_capacity(spark, sf_dir):
    """approx_top_k with capacity >> distinct tokens must equal the
    exact token frequency head (same counts, same membership)."""
    from pyspark.sql import functions as F

    from mlb_data_pipeline_spark.plans import REGISTRY, load_all

    load_all()
    got = {(r.token, r.n) for r in REGISTRY["q72_heavy_hitter_tokens"].spark(spark, sf_dir).collect()}
    from mlb_data_pipeline_spark.catalog import load_table

    exact = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok").count()
        .orderBy(F.col("count").desc(), "tok")
        .limit(len(got))
    )
    # membership + counts match on the unambiguous head (ties at the
    # cutoff may order differently — compare count multisets and the
    # strictly-above-cutoff members)
    exact_rows = [(r.tok, r["count"]) for r in exact.collect()]
    assert sorted(n for _, n in got) == sorted(n for _, n in exact_rows)
    cutoff = min(n for _, n in exact_rows)
    assert {t for t, n in exact_rows if n > cutoff} <= {t for t, _ in got}


def test_chunk_text_windows_and_offsets(spark):
    from mlb_data_pipeline_spark.operators.curation import chunk_text

    text = "abcdefghijklmnopqrstuvwxyz"  # 26 chars
    df = spark.createDataFrame([(1, text), (2, "short"), (3, "")], "doc_id long, text string")
    out = chunk_text(df, "doc_id", "text", size=10, overlap=4)
    rows = sorted(
        ((r["doc_id"], r["chunk_idx"], r["char_start"], r["chunk_text"]) for r in out.collect())
    )
    # doc 1: starts 0, 6, 12, 18, 24 (step 6); last windows shorter
    assert [r for r in rows if r[0] == 1] == [
        (1, 0, 0, "abcdefghij"),
        (1, 1, 6, "ghijklmnop"),
        (1, 2, 12, "mnopqrstuv"),
        (1, 3, 18, "stuvwxyz"),
        (1, 4, 24, "yz"),
    ]
    # every chunk re-anchors exactly into the source by its offset
    for _, _, start, chunk in (r for r in rows if r[0] == 1):
        assert text[start : start + len(chunk)] == chunk
    # consecutive windows overlap by exactly `overlap` chars
    assert rows[0][3][-4:] == rows[1][3][:4]
    # short doc -> one window; empty doc -> zero
    assert [r for r in rows if r[0] == 2] == [(2, 0, 0, "short")]
    assert not [r for r in rows if r[0] == 3]


def test_chunk_text_validation(spark):
    import pytest as _pytest

    from mlb_data_pipeline_spark.operators.curation import chunk_text

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    for size, overlap in ((0, 0), (5, 5), (5, -1), (5, 7)):
        with _pytest.raises(ValueError):
            chunk_text(df, "doc_id", "text", size=size, overlap=overlap)


def test_chunk_text_is_narrow(spark):
    from mlb_data_pipeline_spark.operators.curation import chunk_text

    df = spark.createDataFrame([(1, "hello world " * 30)], "doc_id long, text string")
    plan = (
        chunk_text(df, "doc_id", "text", size=50, overlap=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # no shuffle: sequence+posexplode+substring only


def test_temperature_mix_upweights_small_strata(spark):
    import pytest as _pytest

    from mlb_data_pipeline_spark.operators.curation import temperature_mix

    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "k long, src string")
    kept, fractions = temperature_mix(df, "k", "src", temperature=2.0)
    fr = {r["src"]: r for r in fractions.collect()}
    # T=2, budget=500: w=sqrt(p); small gets (sqrt(.1)/Z*500)/100 = 1.25 -> capped
    assert fr["small"]["fraction"] == 1.0
    assert abs(fr["big"]["fraction"] - 0.41666) < 1e-3
    kc = {r["src"]: r["count"] for r in kept.groupBy("src").count().collect()}
    assert kc["small"] == 100  # fraction 1.0 keeps everything
    assert abs(kc["big"] - 375) < 60  # hash-Bernoulli around n*frac
    with _pytest.raises(ValueError):
        temperature_mix(df, "k", "src", temperature=0.0)


def test_temperature_mix_t1_is_natural_distribution(spark):
    from pyspark.sql import functions as F

    from mlb_data_pipeline_spark.operators.curation import temperature_mix

    rows = [(i, "a") for i in range(600)] + [(10_000 + i, "b") for i in range(200)]
    df = spark.createDataFrame(rows, "k long, src string")
    _, fractions = temperature_mix(df, "k", "src", temperature=1.0)
    fr = {r["src"]: r["fraction"] for r in fractions.collect()}
    # T=1: w = p, so every stratum keeps exactly budget/N = 0.5
    assert abs(fr["a"] - 0.5) < 1e-12 and abs(fr["b"] - 0.5) < 1e-12


def test_temperature_mix_monotone_in_budget(spark):
    from pyspark.sql import functions as F

    from mlb_data_pipeline_spark.operators.curation import temperature_mix

    rows = [(i, "a") for i in range(400)] + [(10_000 + i, "b") for i in range(100)]
    df = spark.createDataFrame(rows, "k long, src string")
    small, _ = temperature_mix(df, "k", "src", temperature=2.0, budget_rows_expr=F.lit(100.0))
    large, _ = temperature_mix(df, "k", "src", temperature=2.0, budget_rows_expr=F.lit(300.0))
    s = {r["k"] for r in small.collect()}
    l = {r["k"] for r in large.collect()}
    # md5-threshold selection: a smaller budget is a SUBSET of a larger one
    assert s <= l and len(s) < len(l)


def test_normalize_url_collapses_variants(spark):
    from mlb_data_pipeline_spark.functions.textfn import normalize_url, url_domain

    variants = [
        "https://example.com/a/b",
        "http://example.com/a/b",
        "https://www.example.com/a/b",
        "HTTP://WWW.Example.com/a/b",
        "https://example.com/a/b/",
        "https://example.com/a/b#section-2",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(variants)], "i int, url string")
    out = df.select(normalize_url("url").alias("c"), url_domain(normalize_url("url")).alias("d")).collect()
    assert {r["c"] for r in out} == {"example.com/a/b"}
    assert {r["d"] for r in out} == {"example.com"}


def test_normalize_url_keeps_query_strips_port_idempotent(spark):
    from mlb_data_pipeline_spark.functions.textfn import normalize_url, url_domain

    df = spark.createDataFrame(
        [(1, "https://shop.example.com:8443/item?id=5&ref=a#top")], "i int, url string"
    )
    row = df.select(
        normalize_url("url").alias("c"),
        url_domain(normalize_url("url")).alias("d"),
        normalize_url(normalize_url("url")).alias("twice"),
    ).collect()[0]
    assert row["c"] == "shop.example.com:8443/item?id=5&ref=a"  # query kept
    assert row["d"] == "shop.example.com"  # port stripped from domain
    assert row["twice"] == row["c"]  # idempotent


def test_group_quota_sample_exact_k_nested_and_deterministic(spark):
    from mlb_data_pipeline_spark.operators.curation import group_quota_sample

    rows = [(i, "s" + str(i % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, source STRING")
    k10 = group_quota_sample(df, ["source"], "doc_id", k=10)
    got = k10.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in got} == {"s0": 10, "s1": 10, "s2": 10}
    # deterministic across invocations
    a = {r.doc_id for r in k10.collect()}
    b = {r.doc_id for r in group_quota_sample(df, ["source"], "doc_id", k=10).collect()}
    assert a == b
    # nested: the 5-quota sample is a subset of the 10-quota sample
    k5 = {r.doc_id for r in group_quota_sample(df, ["source"], "doc_id", k=5).collect()}
    assert k5 < a and len(k5) == 15
    # different salt -> different selection (overwhelmingly)
    salted = {r.doc_id for r in group_quota_sample(df, ["source"], "doc_id", k=10, salt="x").collect()}
    assert salted != a
    # k larger than the stratum keeps everything
    small = spark.createDataFrame([(1, "z"), (2, "z")], "doc_id BIGINT, source STRING")
    assert group_quota_sample(small, ["source"], "doc_id", k=99).count() == 2


def test_pseudonymize_preserves_join_semantics_and_null(spark):
    import pytest

    from mlb_data_pipeline_spark.operators.curation import pseudonymize, pseudonymize_sql

    df = spark.createDataFrame([(1,), (1,), (2,), (None,)], "uid BIGINT")
    out = df.select(pseudonymize("uid", "s1").alias("t")).collect()
    toks = [r.t for r in out]
    assert toks[0] == toks[1] and toks[0] != toks[2]  # same-in same-out, distinct kept
    assert toks[3] is None  # NULL stays NULL
    assert all(t is None or len(t) == 64 for t in toks)
    # different salt -> unlinkable
    other = df.select(pseudonymize("uid", "s2").alias("t")).collect()
    assert other[0].t != toks[0]
    with pytest.raises(ValueError):
        pseudonymize_sql("uid", "bad'salt")


def test_seeded_shuffle_contiguous_deterministic_salted(spark):
    from mlb_data_pipeline_spark.operators.curation import seeded_shuffle

    import pytest as _pytest

    df = spark.range(0, 200).withColumnRenamed("id", "k")
    out = seeded_shuffle(df, "k", n_shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.position)
    assert set(by_shard) <= set(range(4)) and len(by_shard) == 4
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), shard
    # deterministic: same (salt, key) -> same (shard, position)
    again = seeded_shuffle(df, "k", n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # growing the corpus never moves existing keys relative to each other
    grown = seeded_shuffle(
        spark.range(0, 300).withColumnRenamed("id", "k"), "k", n_shards=4
    ).collect()
    pos0 = {(r.shard, r.k): r.position for r in out}
    posg = {(r.shard, r.k): r.position for r in grown if r.k < 200}
    for shard in range(4):
        old = sorted((p, k) for (s, k), p in pos0.items() if s == shard)
        new = sorted((p, k) for (s, k), p in posg.items() if s == shard)
        assert [k for _, k in old] == [k for _, k in new], shard
    # a new salt is a different permutation (overwhelmingly)
    salted = seeded_shuffle(df, "k", n_shards=4, salt="v2").collect()
    assert sorted(map(tuple, salted)) != sorted(map(tuple, out))
    with _pytest.raises(ValueError):
        seeded_shuffle(df, "k", n_shards=0)


def test_weighted_sample_proportional_deterministic_excludes_nonpositive(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from mlb_data_pipeline_spark.operators.curation import weighted_sample

    # 500 heavy rows (w=50) vs 500 light rows (w=1): a 200-sample
    # should be overwhelmingly heavy (E[light] ~ 200/51 ~ 4)
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 500, F.lit(50.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    got = weighted_sample(df, "k", "w", 200).collect()
    assert len(got) == 200
    heavy = sum(1 for r in got if r.k < 500)
    assert heavy > 170
    # deterministic; new salt -> different sample
    again = weighted_sample(df, "k", "w", 200).collect()
    assert [r.k for r in got] == [r.k for r in again]
    salted = weighted_sample(df, "k", "w", 200, salt="v2").collect()
    assert [r.k for r in salted] != [r.k for r in got]
    # zero/NULL weights are never sampled; k > n returns all eligible
    bad = spark.createDataFrame(
        [(1, 0.0), (2, None), (3, 2.0)], "k BIGINT, w DOUBLE"
    )
    kept = weighted_sample(bad, "k", "w", 10).collect()
    assert [r.k for r in kept] == [3]
    with _pytest.raises(ValueError):
        weighted_sample(df, "k", "w", 0)


# ---------------------------------------------------------------------------
# gumbel_topk + dsir_logratio (DSIR data selection, r26/r27)
# ---------------------------------------------------------------------------


def test_gumbel_topk_deterministic_and_salted(spark):
    from mlb_data_pipeline_spark.operators.curation import gumbel_topk

    df = spark.createDataFrame(
        [(i, float(-(i % 7))) for i in range(500)], "doc_id BIGINT, lw DOUBLE"
    )
    a = {r.doc_id for r in gumbel_topk(df, "doc_id", "lw", 50, salt="s1").collect()}
    b = {r.doc_id for r in gumbel_topk(df.repartition(11), "doc_id", "lw", 50, salt="s1").collect()}
    c = {r.doc_id for r in gumbel_topk(df, "doc_id", "lw", 50, salt="s2").collect()}
    assert a == b  # draw is a function of (salt, key) alone
    assert a != c  # re-salting re-draws
    assert len(a) == 50


def test_gumbel_topk_proportional_to_exp_logweight(spark):
    """Group A's log weight exceeds B's by ln(20): with 100 of each and
    k=50, A's expected share is ~95%; assert it dominates."""
    import math

    from mlb_data_pipeline_spark.operators.curation import gumbel_topk

    rows = [(i, math.log(20.0)) for i in range(100)] + [
        (i, 0.0) for i in range(100, 200)
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, lw DOUBLE")
    picked = {r.doc_id for r in gumbel_topk(df, "doc_id", "lw", 50, salt="p").collect()}
    n_heavy = sum(1 for d in picked if d < 100)
    assert n_heavy >= 40  # E ~ 47.5 of 50


def test_gumbel_topk_excludes_null_logweight_accepts_negative(spark):
    from mlb_data_pipeline_spark.operators.curation import gumbel_topk

    df = spark.createDataFrame(
        [(1, -5.0), (2, None), (3, -700.0)], "doc_id BIGINT, lw DOUBLE"
    )
    got = {r.doc_id for r in gumbel_topk(df, "doc_id", "lw", 3).collect()}
    assert got == {1, 3}  # null never sampled; any finite log weight valid


def test_dsir_logratio_prefers_target_like_docs(spark):
    """Planted domains: target-vocabulary docs must outscore off-domain
    docs, and a doc mixing both lands between."""
    from mlb_data_pipeline_spark.operators.search import dsir_logratio

    tgt_text = "alpha beta gamma delta alpha beta"
    off_text = "zonk quux blorp wibble zonk quux"
    cands = spark.createDataFrame(
        [(1, tgt_text), (2, off_text), (3, "alpha beta zonk quux"), (4, "")],
        "doc_id BIGINT, text STRING",
    )
    target = spark.createDataFrame(
        [(100, "alpha beta gamma delta " * 5)], "doc_id BIGINT, text STRING"
    )
    got = {r.doc_id: r.logratio for r in dsir_logratio(cands, target).collect()}
    assert 4 not in got  # zero-token doc: no likelihood
    assert got[1] > got[3] > got[2]
