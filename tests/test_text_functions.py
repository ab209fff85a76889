"""Unicode hygiene functions (textfn round-7 additions)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_nfc_normalize_and_mojibake(spark):
    from mlb_data_pipeline_spark.functions.textfn import fix_mojibake, nfc_normalize

    decomposed = "cafe\u0301"
    mojibake = "caf\u00e9".encode("utf-8").decode("latin-1")  # 'cafÃ©'
    rows = [(1, decomposed), (2, mojibake), (3, "plain ascii"), (4, None)]
    df = spark.createDataFrame(rows, "id BIGINT, s STRING")
    out = {
        r.id: (r.nfc, r.fixed)
        for r in df.select(
            "id",
            nfc_normalize(F.col("s")).alias("nfc"),
            fix_mojibake(F.col("s")).alias("fixed"),
        ).collect()
    }
    assert out[1][0] == "caf\u00e9" and len(out[1][0]) == 4  # composed
    assert out[2][1] == "caf\u00e9"                          # repaired
    assert out[3] == ("plain ascii", "plain ascii")          # untouched
    assert out[4] == (None, None)
    # idempotence: repairing repaired text is a no-op
    fixed_df = df.select("id", fix_mojibake(F.col("s")).alias("s"))
    refixed = {
        r.id: r.s2
        for r in fixed_df.select("id", fix_mojibake(F.col("s")).alias("s2")).collect()
    }
    assert refixed[2] == "caf\u00e9" and refixed[3] == "plain ascii"


def test_bpe_ish_token_count_equals_per_word_ceil_sum(spark):
    # round 15: the chunk-count form (size of greedy 1-4-char word
    # chunks) must equal the per-word ceil(len/4) lambda sum it replaced
    # — a maximal [A-Za-z0-9]+ run of length L greedy-tokenizes into
    # exactly ceil(L/4) pieces. Edges: empty/whitespace/punct-only
    # strings, 4k and 4k+1 word lengths, non-ASCII separators, NULL.
    from pyspark.sql import functions as F

    from mlb_data_pipeline_spark.functions.textfn import WORD_RE, bpe_ish_token_count

    def old_form(c):
        words = F.regexp_extract_all(F.col(c), F.lit(WORD_RE), 0)
        return F.aggregate(
            words, F.lit(0), lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int")
        )

    rows = [
        ("",), ("a",), ("abcd",), ("abcde",), ("abcdefgh",),
        ("abcdefgh xy9 . --- a1b2c3d4e",), ("   ",), ("ürsp abcd1234!",),
        ("word " * 50 + "tail",), (None,),
    ]
    df = spark.createDataFrame(rows, "text STRING")
    out = df.select(
        old_form("text").alias("old"), bpe_ish_token_count("text").alias("new")
    ).collect()
    for r in out:
        assert r.old == r.new, (r.old, r.new)
