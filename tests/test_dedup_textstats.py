"""Dedup + text-analysis differential tests at sf0.001 (hermetic pytest
versions of the driver's sf0.01 oracle checks)."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from logagg import dedup, textfns, textstats


def _pairs_set(rows):
    return {(r["url_a"], r["url_b"], r["shared"], r["na"], r["nb"]) for r in rows}


def test_jaccard_pairs_match_oracle(spark, pages_cache):
    pages = spark.read.parquet(str(pages_cache / "pages.parquet"))
    got = _pairs_set(dedup.jaccard_pairs(pages).collect())
    exp = _pairs_set(pq.read_table(pages_cache / "expected_dupes.parquet").to_pylist())
    assert got == exp and len(exp) > 10


def test_minhash_lsh_recall_and_precision(spark, pages_cache):
    pages = spark.read.parquet(str(pages_cache / "pages.parquet"))
    exact = _pairs_set(pq.read_table(pages_cache / "expected_dupes.parquet").to_pylist())
    # NOTE: lsh verifies against RAW shingle sets (no DF cut) — compare on
    # the pair ids only
    lsh_pairs = {
        (r["url_a"], r["url_b"]) for r in dedup.minhash_lsh_dupes(pages).collect()
    }
    exact_ids = {(a, b) for a, b, *_ in exact}
    recall = len(lsh_pairs & exact_ids) / len(exact_ids)
    assert recall >= 0.9  # banding curve: near-certain at J>=0.8


def test_lang_pred_matches_oracle(spark, pages_cache):
    pages = spark.read.parquet(str(pages_cache / "pages.parquet"))
    got = {
        r["url"]: r["lang_pred"]
        for r in textstats.with_lang_pred(pages).select("url", "lang_pred").collect()
    }
    exp = {
        r["url"]: r["lang_pred"]
        for r in pq.read_table(pages_cache / "expected_langid.parquet").to_pylist()
    }
    assert got == exp
    # and the heuristic is actually informative on this corpus
    langs = {r["url"]: r["lang"] for r in pages.select("url", "lang").collect()}
    acc = sum(1 for u, p in got.items() if p == langs[u]) / len(got)
    assert acc > 0.9


def test_fingerprint_matches_pure_python(spark):
    texts = ["", "a", "hello world", "x" * 1000, "unicode ✓ ok"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["fp"] for r in textstats.doc_fingerprints(df).collect()}
    assert got == {i: textfns.fingerprint(t) for i, t in enumerate(texts)}


def test_quality_score_matches_pure_python(spark):
    rows = [
        (0, "the cache of the pool and a thread", 34),
        (1, "spill probe scan", 16),
        (2, "", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    got = {
        r["doc_id"]: r["q"]
        for r in df.select(
            "doc_id",
            textstats.quality_score(F.col("text"), F.col("n_chars")).alias("q"),
        ).collect()
    }
    for i, t, n in rows:
        assert got[i] == pytest.approx(textfns.quality_score(t, n), abs=1e-12)


def test_bpe_token_count_matches_python_re(spark):
    """BPE-ish pre-token counting: Java regexp_extract_all == Python re on
    adversarial ASCII shapes, and pre-tokens never undercount whitespace
    tokens (BPE merges only split finer, never across)."""
    import re

    from pyspark.sql import functions as F

    from logagg.textstats import BPE_SPLIT_RE, bpe_token_count, token_count

    texts = [
        "the quick brown fox", "a1b2c3", "hello, world!!", "  leading spaces",
        "tabs\tand\nnewlines\x0bmixed", "punct...only!!!", "", "x",
        "CamelCase and UPPER and 12345 numbers", "a-b_c.d/e",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["text"]: (r["bpe"], r["ws"])
        for r in df.select(
            "text",
            bpe_token_count(F.col("text")).alias("bpe"),
            token_count(F.col("text")).alias("ws"),
        ).collect()
    }
    pat = re.compile(BPE_SPLIT_RE)
    for t in texts:
        want = len(pat.findall(t))
        bpe, ws = got[t]
        assert bpe == want, repr(t)
        # whitespace runs are tokens too, so pre-tokens >= whitespace tokens
        assert bpe >= ws, repr(t)


def test_profile_table_exact_and_approximate(spark):
    """profile_table: exact mode matches hand-computed stats; approximate
    mode (the 100 TB path — HLL registers instead of a distinct shuffle)
    agrees on everything but distinct, which lands within 5%."""
    from logagg.textstats import profile_table

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    cols = ["doc_id", "lang", "n_chars"]
    exact = {r["column"]: r.asDict() for r in profile_table(docs, cols).collect()}
    n = docs.count()
    n_langs = docs.select("lang").distinct().count()
    assert exact["doc_id"]["n_rows"] == n and exact["doc_id"]["n_distinct"] == n
    assert exact["lang"]["n_distinct"] == n_langs
    assert all(v["n_nulls"] == 0 for v in exact.values())
    approx = {
        r["column"]: r.asDict()
        for r in profile_table(docs, cols, approximate=True).collect()
    }
    for c in cols:
        assert approx[c]["n_rows"] == exact[c]["n_rows"]
        assert approx[c]["n_nulls"] == exact[c]["n_nulls"]
        assert approx[c]["min_val"] == exact[c]["min_val"]
        assert approx[c]["max_val"] == exact[c]["max_val"]
        assert abs(approx[c]["n_distinct"] - exact[c]["n_distinct"]) <= max(
            1, 0.05 * exact[c]["n_distinct"]
        ), c
