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
