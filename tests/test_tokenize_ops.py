"""BPE training: the distributed trainer must learn the exact merge list
a pure-Python reference learns (same tie-breaks), and the Catalyst-fold
merge application must be the standard greedy non-overlapping apply."""

from __future__ import annotations

import pytest

from mlb_data_pipeline_spark.operators.tokenize import (
    _init_symbols,
    apply_merge,
    encode_with_merges,
    train_bpe,
    word_freq_table,
)


def _ref_train_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    freq: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freq[w] = freq.get(w, 0) + 1
    syms = {w: list(w) for w in freq}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq[w]
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        if counts[pair] < 2:
            break
        merges.append(pair)
        left, right = pair
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest new low",
]


@pytest.mark.parametrize("n_merges", [1, 3, 6])
def test_train_bpe_matches_reference(spark, n_merges):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id BIGINT, text STRING")
    assert train_bpe(docs, n_merges) == _ref_train_bpe(TEXTS, n_merges)


def test_apply_merge_greedy_nonoverlapping(spark):
    # "aaaa" with merge (a,a): greedy left-to-right -> [aa, aa], never [aa, a, a] or re-merge to aaaa
    docs = spark.createDataFrame([(1, "aaaa aaa")], "doc_id BIGINT, text STRING")
    sym = _init_symbols(word_freq_table(docs))
    got = {r.word: list(r.syms) for r in apply_merge(sym, "a", "a").collect()}
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aaa"] == ["aa", "a"]


def test_encode_with_merges_roundtrip(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id BIGINT, text STRING")
    merges = train_bpe(docs, 4)
    sym = encode_with_merges(_init_symbols(word_freq_table(docs)), merges)
    rows = {r.word: list(r.syms) for r in sym.collect()}
    # tokens always reassemble to the word, and at least one word compressed
    assert all("".join(s) == w for w, s in rows.items())
    assert any(len(s) < len(w) for w, s in rows.items())


def test_train_bpe_stops_below_min_count(spark):
    # every word unique, every pair count 1 -> zero merges learned
    docs = spark.createDataFrame([(1, "ab cd ef")], "doc_id BIGINT, text STRING")
    assert train_bpe(docs, 5) == []
