"""BM25 inverted index: token contract (Spark == Python), ranked results
vs the driver-side twin, and the bucket-pruned query plan."""

import pytest

from pyspark.sql import functions as F

from logagg import searchidx


CORPUS = {
    "d1": "the quick brown fox jumps over the lazy dog",
    "d2": "a lazy dog sleeps all day; the dog is very lazy",
    "d3": "quick quick quick — brevity is the soul of wit",
    "d4": "Foxes are wild canids. A fox's den is underground.",
    "d5": "completely unrelated document about spark partitions and shuffles",
    "d6": "",
}


@pytest.fixture()
def index_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bm25") / "idx")
    docs = spark.createDataFrame(
        list(CORPUS.items()), "id string, text string"
    )
    meta = searchidx.build_index(docs, out, num_buckets=8)
    assert meta["n_docs"] == len(CORPUS)
    return out


def test_search_tokens_contract(spark):
    samples = [
        "The QUICK  brown\tfox!",
        "digits 123 mix3d and café ünïcode",  # non-ascii letters split tokens
        "a-b_c.d,e;f",
        "",
        "\x0b\f\r\n   ",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = [
        list(r["toks"])
        for r in df.select(searchidx.search_tokens_col(F.col("t")).alias("toks"))
        .collect()
    ]
    want = [searchidx.search_tokens_py(s) for s in samples]
    assert got == want
    assert want[1] == ["digits", "123", "mix3d", "and", "caf", "n", "code"]


@pytest.mark.parametrize(
    "query",
    ["lazy dog", "quick", "fox den", "the", "spark SHUFFLES!", "absent-term xyzzy"],
)
def test_bm25_matches_twin(spark, index_dir, query):
    got = [
        (r["id"], r["score"])
        for r in searchidx.bm25_search(spark, index_dir, query, k=4).collect()
    ]
    want = searchidx.bm25_search_py(CORPUS, query, k=4)
    assert [i for i, _ in got] == [i for i, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_bm25_empty_query_and_rare_term(spark, index_dir):
    assert searchidx.bm25_search(spark, index_dir, "  ?! ").count() == 0
    # a term present in exactly one doc ranks that doc first
    top = searchidx.bm25_search(spark, index_dir, "underground", k=1).collect()
    assert [r["id"] for r in top] == ["d4"]


def test_query_plan_prunes_buckets_and_pushes_terms(spark, index_dir):
    p = searchidx.query_postings(spark, index_dir, ["lazy", "dog"])
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    # the term IN-list reaches the parquet scan
    assert "PushedFilters: [" in plan and "In(term" in plan
    # and only the needed bucket partitions are actually read
    # (inputFiles() ignores filters — row provenance via input_file_name)
    files = {
        r["f"] for r in p.select(F.input_file_name().alias("f")).distinct().collect()
    }
    n_buckets_read = len({f.split("bucket=")[1].split("/")[0] for f in files})
    assert 1 <= n_buckets_read <= 2


def test_update_index_equals_rebuild(spark, tmp_path):
    """Incremental composition: build on batch 1, update with batch 2 →
    bm25 numerically identical to one rebuild over the union (n_docs,
    avgdl, df, tf all exact)."""
    items = sorted(CORPUS.items())
    b1, b2 = dict(items[:3]), dict(items[3:])
    inc_dir, full_dir = str(tmp_path / "inc"), str(tmp_path / "full")
    searchidx.build_index(
        spark.createDataFrame(list(b1.items()), "id string, text string"),
        inc_dir,
        num_buckets=8,
    )
    meta = searchidx.update_index(
        spark.createDataFrame(list(b2.items()), "id string, text string"), inc_dir
    )
    full_meta = searchidx.build_index(
        spark.createDataFrame(list(CORPUS.items()), "id string, text string"),
        full_dir,
        num_buckets=8,
    )
    assert meta == full_meta
    for q in ("lazy dog", "quick fox", "spark"):
        got = [
            (r["id"], r["score"])
            for r in searchidx.bm25_search(spark, inc_dir, q, k=6).collect()
        ]
        want = [
            (r["id"], r["score"])
            for r in searchidx.bm25_search(spark, full_dir, q, k=6).collect()
        ]
        assert [i for i, _ in got] == [i for i, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12)


def test_snippet_py_window_selection():
    text = "Alpha beta gamma. " * 10 + "The lazy dog met a quick fox today. " + "delta " * 50
    s = searchidx.snippet_py(text, ["dog", "fox"], width=8)
    assert "lazy dog" in s and "quick fox" in s
    assert s.startswith("…") and s.endswith("…")
    # no query terms → prefix window
    s2 = searchidx.snippet_py("plain words only here", ["zzz"], width=2)
    assert s2.startswith("plain words")
    # empty text stays empty
    assert searchidx.snippet_py("", ["x"]) == ""


def test_snippets_spark_matches_kernel(spark, index_dir):
    docs = spark.createDataFrame(list(CORPUS.items()), "id string, text string")
    hits = searchidx.bm25_search(spark, index_dir, "lazy dog", k=3)
    got = searchidx.snippets(docs, hits, "lazy dog", width=6).collect()
    want_ids = [r["id"] for r in hits.collect()]
    assert [r["id"] for r in got] == want_ids
    terms = sorted(set(searchidx.search_tokens_py("lazy dog")))
    for r in got:
        assert r["snippet"] == searchidx.snippet_py(CORPUS[r["id"]], terms, 6)
        assert "dog" in r["snippet"] or "lazy" in r["snippet"]


def test_bm25_corpus_scale(spark, tmp_path):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.col("doc_id").alias("id"), "text")
    )
    out = str(tmp_path / "idx")
    meta = searchidx.build_index(docs, out, num_buckets=16)
    assert meta["n_docs"] == 500
    pdf = docs.toPandas()
    corpus = dict(zip(pdf["id"].astype(str), pdf["text"]))
    # take a mid-frequency word from the corpus itself as the query
    query = searchidx.search_tokens_py(pdf["text"].iloc[0])[3]
    got = [
        (r["id"], r["score"])
        for r in searchidx.bm25_search(spark, out, query, k=10).collect()
    ]
    want = searchidx.bm25_search_py(corpus, query, k=10)
    assert [i for i, _ in got] == [i for i, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)
