"""Round-2 contract tests: asof NULL-value carry, grok NULL input,
cross-engine token whitespace, numpy ANN tie-breaking, the adaptive
stop-shingle cut, and the hypothesis property test for url-meta routing."""

from datetime import datetime

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from logagg import textfns, textstats
from logagg.asof import asof_join
from logagg.grok import GrokPattern, grok_extract_jvm, grok_extract_vectorized
from logagg.schemas import DEDUP_DF_MAX, df_max_for


def test_asof_join_preserves_null_value_from_matched_row(spark):
    # the as-of-matched right row carries value NULL: the join must emit
    # NULL, not leak the older non-null value (DuckDB/kdb ASOF semantics)
    t = lambda m: datetime(2024, 6, 1, 12, m, 0)  # noqa: E731
    left = spark.createDataFrame([(1, 7, t(30))], "event_id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(7, t(0), 11), (7, t(10), None)], "k long, ts timestamp, v long"
    )
    row = asof_join(left, right, key="k", ts="ts", value_cols=["v"]).collect()[0]
    assert row["v"] is None


def test_grok_vectorized_null_input_matches_jvm(spark):
    pat = GrokPattern("code=%{INT:code}")
    df = spark.createDataFrame([("code=42",), (None,), ("nope",)], "msg string")
    jvm = {r["msg"]: r["code"] for r in grok_extract_jvm(df, "msg", pat).collect()}
    vec = {r["msg"]: r["code"] for r in grok_extract_vectorized(df, "msg", pat).collect()}
    assert jvm == vec == {"code=42": "42", None: None, "nope": ""}


def test_token_contract_non_ascii_whitespace(spark):
    # \xa0 (Unicode NBSP) is NOT a token separator under the pinned ASCII
    # contract; \x0b IS (Java \s includes it, RE2 \s does not). All three
    # engines must agree.
    texts = ["a\xa0b c", "x\x0by z", "p q r", "tab\tsep"]
    expected = [["a\xa0b", "c"], ["x", "y", "z"], ["p q", "r"], ["tab", "sep"]]
    assert [textfns.tokens(t) for t in texts] == expected
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["text"]: r["toks"]
        for r in df.select("text", textstats.tokens_col(F.col("text")).alias("toks")).collect()
    }
    assert [got[t] for t in texts] == expected
    ws = "'[ \\t\\n\\x0b\\f\\r]+'"
    duck = [
        duckdb.sql(
            f"SELECT list_filter(string_split_regex(?, {ws}), t -> t <> '')",
            params=[t],
        ).fetchone()[0]
        for t in texts
    ]
    assert duck == expected


def test_ann_numpy_ties_match_catalyst_path(spark):
    # duplicate vectors inside one partition: the per-partition top-k must
    # keep the oracle's tie-winners (nid asc), not an arbitrary subset
    from logagg.similarity import ann_bruteforce, ann_bruteforce_numpy

    rows = []
    for i in range(40):
        vec = [1.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 1.0, 0.0]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(1)
    exact = {(r["qid"], r["rank"]): r["nid"] for r in ann_bruteforce(emb, n_queries=2).collect()}
    fast = {(r["qid"], r["rank"]): r["nid"] for r in ann_bruteforce_numpy(emb, n_queries=2).collect()}
    assert fast == exact


def test_df_max_for_pins_two_scales():
    assert df_max_for(6_000) == DEDUP_DF_MAX  # test corpora keep round-1 cut
    assert df_max_for(60_000) == DEDUP_DF_MAX
    assert df_max_for(10**9) == 100_000  # 0.01% of a 10^9-doc corpus
    assert df_max_for(10**12) == 10**8


def test_point_lookup_null_and_missing_contract(spark, pages_cache):
    # reference contract (aggregator/db.py:90-110): a None id is a
    # validation error; a missing id yields an empty (logged-None) result
    from logagg import parse

    pages = spark.read.parquet(str(pages_cache / "pages.parquet"))
    parsed = parse.parsed_records(pages)
    assert parsed.filter(F.col("url").isNull()).count() == 0  # url is NOT NULL by schema
    missing = parsed.filter(F.col("url") == "https://nope.example.com/none/none/99999999")
    assert missing.count() == 0  # missing id → empty result, no error


URL_SAFE = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"), max_codepoint=0x7F),
    min_size=1,
    max_size=12,
)


@settings(max_examples=50, deadline=None)
@given(host=URL_SAFE, node=URL_SAFE, log_type=URL_SAFE, rest=URL_SAFE)
def test_url_meta_property(host, node, log_type, rest):
    # property: for any well-formed url the routing regexes recover exactly
    # the path segments (the reference hypothesis-tests get_log_dir the same
    # way, /root/reference/tests/test_helper.py:197-207); the patterns use
    # only constructs with identical semantics in Python re and Java regex
    import re

    from logagg.schemas import HOST_RE, LOGTYPE_RE, NODE_RE

    url = f"https://{host}/{node}/{log_type}/{rest}"
    for pattern, want in ((HOST_RE, host), (NODE_RE, node), (LOGTYPE_RE, log_type)):
        m = re.search(pattern, url)
        assert m and m.group(1) == want


def test_url_meta_spark_matches_python(spark):
    # the same segments through Spark's JVM regexp_extract — cross-engine
    # agreement incl. no-match → "" contract on malformed urls
    import re

    from logagg import parse
    from logagg.schemas import HOST_RE, LOGTYPE_RE, NODE_RE

    urls = [
        "https://h1.example.com/n01/smb3/00000001",
        "https://h2.example.net/n20/auth/x",
        "https://only-host.example.org/",
        "ftp://h/short",
        "no-scheme-at-all",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: (r["node"], r["log_type"], r["host"]) for r in parse.with_url_meta(df).collect()}
    for u in urls:
        want = tuple(
            (m.group(1) if (m := re.search(p, u)) else "")
            for p in (NODE_RE, LOGTYPE_RE, HOST_RE)
        )
        assert got[u] == want, u


def _pairs(rows, cols):
    return {tuple(r[c] for c in cols) for r in rows}


def test_probabilistic_ops_equal_refsketch_twins(spark, pages_cache):
    # the driver checks these at sf0.01; this is the hermetic sf0.001 twin
    import pyarrow.parquet as pq

    from logagg import dedup, multimodal, similarity

    pages = spark.read.parquet(str(pages_cache / "pages.parquet"))
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    cols = ["url_a", "url_b", "shared", "na", "nb"]
    got = _pairs(dedup.minhash_lsh_dupes(pages).collect(), cols)
    exp = _pairs(pq.read_table(pages_cache / "expected_minhash.parquet").to_pylist(), cols)
    assert got == exp and len(exp) > 10

    cols = ["url_a", "url_b", "hamming"]
    got = _pairs(dedup.simhash_dupes(pages).collect(), cols)
    exp = _pairs(pq.read_table(pages_cache / "expected_simhash.parquet").to_pylist(), cols)
    assert got == exp and len(exp) > 10

    for fn, name in ((similarity.ann_lsh, "expected_ann_lsh"), (similarity.ann_ivf, "expected_ann_ivf")):
        cols = ["qid", "nid", "rank"]
        got = _pairs(fn(emb).collect(), cols)
        exp = _pairs(pq.read_table(pages_cache / f"{name}.parquet").to_pylist(), cols)
        assert got == exp and len(exp) == 40, name

    cols = ["url", "media_kind", "byte_len", "magic", "width", "height", "feature0", "feature1"]
    got = _pairs(multimodal.decode_media(pages).collect(), cols)
    exp = _pairs(pq.read_table(pages_cache / "expected_media.parquet").to_pylist(), cols)
    assert got == exp and len(exp) == 600


def test_no_cached_rdds_after_dedup_ops(spark, pages_cache):
    # cache lifecycle contract: dedup operators release every persisted
    # intermediate before returning (a 40-query driver session must not
    # accumulate executor storage)
    from logagg import dedup

    pages = spark.read.parquet(str(pages_cache / "pages.parquet"))
    jvm_sc = spark.sparkContext._jsc.sc()
    before = jvm_sc.getPersistentRDDs().size()  # other suites may share the session
    dedup.jaccard_pairs(pages).count()
    dedup.simhash_dupes(pages).count()
    dedup.minhash_lsh_dupes(pages).count()
    assert jvm_sc.getPersistentRDDs().size() == before


def test_cli_find_and_view(spark, pages_cache, capsys):
    # python -m logagg verbs (reference main() lifecycle analog); reuses the
    # active test session via getOrCreate
    from logagg.__main__ import main as cli_main

    rc = cli_main(["find", "--sf-dir", "/root/testdata/sf0.001", "--node", "n05", "--limit", "3"])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0 and len(out) == 3 and all("| n05\t" in line for line in out)

    rc = cli_main(["view", "--sf-dir", "/root/testdata/sf0.001", "--url-suffix", "/00000042"])
    out = capsys.readouterr().out
    assert rc == 0 and "/00000042#" in out

    rc = cli_main(["view", "--sf-dir", "/root/testdata/sf0.001", "--url-suffix", "/no-such-url"])
    assert rc == 1  # missing id → empty render, nonzero exit (db.py None contract)


def test_parse_column_pruning_equals_full(spark, pages_cache):
    # hand-pruned UDF output must equal the full parse projected after the
    # fact — same rows (validation unchanged), same values, fewer columns
    # across the Arrow boundary
    from logagg import parse

    pages = spark.read.parquet(str(pages_cache / "pages.parquet"))
    full = parse.parsed_records(pages).select("url", "lang", "warc_ts", "message", "host")
    pruned = parse.parsed_records(pages, columns=["lang", "warc_ts", "message"]).select(
        "url", "lang", "warc_ts", "message", "host"
    )
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, pruned.collect()))
    assert set(parse.parse_pages(pages, columns=["message", "url"]).columns) == {"url", "message"}


def test_dup_clusters_match_union_find(spark, pages_cache):
    import pyarrow.parquet as pq

    from logagg import dedup

    pages = spark.read.parquet(str(pages_cache / "pages.parquet"))
    got = {(r["url"], r["cluster"]) for r in dedup.dup_clusters(pages).collect()}
    exp_tbl = pq.read_table(pages_cache / "expected_clusters.parquet")
    exp = set(zip(exp_tbl.column("url").to_pylist(), exp_tbl.column("cluster").to_pylist()))
    assert got == exp and len(exp) > 20
    # every cluster id is a member of its own cluster (the keeper exists)
    roots = {c for _, c in exp}
    assert roots <= {u for u, _ in exp}


def test_media_sniff_kinds(spark):
    # the corpus is html-only, so exercise the other magic-byte branches
    # (and NULL payload) directly
    from logagg import multimodal

    rows = [
        ("u1", b"\x89PNG\r\n\x1a\n" + b"x" * 16),
        ("u2", b"\xff\xd8\xff\xe0rest-of-jpeg"),
        ("u3", b"RIFF\x00\x00\x00\x00WAVE"),
        ("u4", b"plain garbage"),
        ("u5", None),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: (r["media_kind"], r["byte_len"]) for r in multimodal.decode_media(df).collect()}
    assert got == {
        "u1": ("png", 24),
        "u2": ("jpeg", 16),
        "u3": ("riff", 12),
        "u4": ("unknown", 13),
        "u5": ("unknown", 0),
    }


def test_resize_dims_match_python_reference(spark):
    """The integer-exact aspect-fit expression (clamp(floor(side*max/longer)))
    equals the scalar Python reference over random dims, including the
    degenerate 1-pixel outputs."""
    import random

    import pandas as pd
    from pyspark.sql import functions as F

    rng = random.Random(7)
    dims = [(rng.randint(1, 4096), rng.randint(1, 4096)) for _ in range(500)]
    dims += [(1, 4096), (4096, 1), (128, 128), (129, 1), (1, 1)]
    pdf = pd.DataFrame({"width": [w for w, _ in dims], "height": [h for _, h in dims]})
    df = spark.createDataFrame(pdf)
    max_side = 128
    w, h = F.col("width").cast("long"), F.col("height").cast("long")
    longer = F.greatest(w, h)
    fit = lambda side: F.when(longer <= max_side, side).otherwise(  # noqa: E731
        F.greatest(F.lit(1), (side * max_side) / longer).cast("long")
    )
    got = df.select("width", "height", fit(w).alias("ow"), fit(h).alias("oh")).collect()

    def ref(w_, h_):
        longer_ = max(w_, h_)
        if longer_ <= max_side:
            return w_, h_
        return max(1, w_ * max_side // longer_), max(1, h_ * max_side // longer_)

    for r in got:
        assert (r["ow"], r["oh"]) == ref(r["width"], r["height"]), (r["width"], r["height"])


def test_events_approx_stats_deterministic(spark):
    """COVERAGE.md claims the sketch estimates are deterministic for a
    fixed input — pin it (two evaluations, identical values)."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()["events_approx_stats"]
    sf = "/root/testdata/sf0.01"
    key = lambda r: (r["event_type"], r["approx_users"], r["q50"], r["q95"], r["q99"])  # noqa: E731
    assert sorted(map(key, q(spark, sf).collect())) == sorted(map(key, q(spark, sf).collect()))
