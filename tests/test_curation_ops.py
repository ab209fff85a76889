

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
