"""Exact-substring (repeated n-gram) dedup: Spark spans/cuts vs the
pure-Python twin, plus the gaps-and-islands merge edge cases."""

import pytest

from logagg import dedup, textfns

SF = "/root/testdata/sf0.001"


def _spark_spans(df, n, min_count=2):
    out = {}
    for r in dedup.repeated_ngram_spans(df, n=n, min_count=min_count).collect():
        out.setdefault(int(r["doc_id"]), []).append((r["span_start"], r["span_end"]))
    return {k: sorted(v) for k, v in out.items()}


def test_crafted_matches_twin(spark):
    texts = {
        1: "a b c d e f g h",
        2: "x y c d e f q r",
        3: "c d e f z1 z2 z3 z4",
        4: "p q p q p q p q",  # within-doc repeats merge to one span
        5: "u1 u2 u3",  # shorter than n: no grams, never flagged
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    want = textfns.repeated_ngram_spans_py(texts, n=4, min_count=2)
    got = _spark_spans(df, n=4)
    assert got == {k: sorted(v) for k, v in want.items()}
    assert got[4] == [(0, 8)]  # merged into ONE maximal island
    assert 5 not in got

    cut = {
        r["doc_id"]: r["text"]
        for r in dedup.cut_repeated_spans(
            df, dedup.repeated_ngram_spans(df, n=4)
        ).collect()
    }
    for i, t in texts.items():
        assert cut[i] == textfns.cut_spans_py(t, want.get(i, []))
    assert cut[5] == texts[5]  # untouched docs pass through byte-identical
    assert cut[4] == ""  # fully-repeated doc cut to nothing


def test_adjacent_spans_merge(spark):
    # hits at pos 0 and pos 2 with n=2: [0,2) and [2,4) are ADJACENT and
    # must merge (twin semantics: q <= prev_end merges)
    texts = {1: "a b a b", 2: "a b x y", 3: "x y a b"}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    want = textfns.repeated_ngram_spans_py(texts, n=2, min_count=2)
    assert _spark_spans(df, n=2) == {k: sorted(v) for k, v in want.items()}
    assert _spark_spans(df, n=2)[1] == [(0, 4)]


def test_corpus_matches_twin(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    n = 8
    want = textfns.repeated_ngram_spans_py(texts, n=n, min_count=2)
    got = _spark_spans(docs, n=n)
    assert got == {k: sorted(v) for k, v in want.items()}
    assert want  # the word-soup corpus genuinely repeats 8-gram runs

    cut = {
        r["doc_id"]: r["text"]
        for r in dedup.cut_repeated_spans(
            docs, dedup.repeated_ngram_spans(docs, n=n)
        ).collect()
    }
    changed = 0
    for i, t in texts.items():
        assert cut[i] == textfns.cut_spans_py(t, want.get(i, []))
        changed += cut[i] != t
    assert changed == len(want)


def test_cut_preserves_other_columns(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f", "keep1"), (2, "a b c d x y", "keep2")],
        "doc_id long, text string, extra string",
    )
    spans = dedup.repeated_ngram_spans(df, n=4)
    out = {r["doc_id"]: r for r in dedup.cut_repeated_spans(df, spans).collect()}
    assert out[1]["extra"] == "keep1" and out[2]["extra"] == "keep2"
    assert set(out[1].asDict()) == {"doc_id", "text", "extra"}


def test_min_count_threshold(spark):
    texts = {1: "a b c d", 2: "a b c d", 3: "a b c d"}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    assert set(_spark_spans(df, n=4, min_count=3)) == {1, 2, 3}
    assert _spark_spans(df, n=4, min_count=4) == {}
