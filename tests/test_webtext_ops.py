"""Webtext-curation operators: Gopher repetition filters, benchmark
decontamination, per-domain capping. The repetition kernel delegates to
textfns.repetition_stats_py, so the crafted cases here pin the MATH with
hand-computed literals (not just plumbing equality); decontamination and
capping are checked against independent pure-Python reconstructions."""

import hashlib
import zlib
from collections import Counter
from urllib.parse import urlparse

import pytest

from pyspark.sql import functions as F

from logagg import dedup, textfns, textstats

SF = "/root/testdata/sf0.001"


# ------------------------------------------------- repetition stats


def test_repetition_stats_hand_computed(spark):
    text1 = "a b a b a b c\nx\nx\n"
    df = spark.createDataFrame([(1, text1), (2, "")], "doc_id long, text string")
    rows = {r["id"]: r.asDict() for r in textstats.repetition_stats(df).collect()}
    r1 = rows["1"]
    # lines: ['a b a b a b c', 'x', 'x'] -> 3 lines, 'x' duplicated
    assert r1["n_lines"] == 3
    assert r1["dup_line_frac"] == pytest.approx(1 / 3)
    # dup line chars = 2*len('x') = 2; line chars = 13+1+1 = 15
    assert r1["dup_line_char_frac"] == pytest.approx(2 / 15)
    # tokens: a b a b a b c x x -> top bigram 'a b' x3; len(text1) = 18
    assert r1["top2_char_frac"] == pytest.approx(3 * 3 / 18)
    # top trigram: 'a b a' x2 (ties 'b a b' x2 -> lexicographically greatest
    # of the max-count grams wins = 'b a b')
    assert r1["top3_char_frac"] == pytest.approx(2 * 5 / 18)
    # top 4-gram: 'a b a b' x2 is the only repeated 4-gram
    assert r1["top4_char_frac"] == pytest.approx(2 * 7 / 18)
    assert r1["dup10_char_frac"] == 0.0
    r2 = rows["2"]
    assert r2["n_lines"] == 0 and r2["dup_line_frac"] == 0.0
    assert r2["top2_char_frac"] == 0.0 and r2["dup10_char_frac"] == 0.0


def test_repetition_stats_dup10(spark):
    ten = " ".join(f"w{i}" for i in range(10))
    text = ten + " " + ten  # the 10-gram 'w0..w9' occurs at offsets 0 and 10
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    row = textstats.repetition_stats(df).collect()[0]
    assert row["dup10_char_frac"] == pytest.approx(min(1.0, 2 * len(ten) / len(text)))
    twin = textfns.repetition_stats_py(text)
    assert row["dup10_char_frac"] == pytest.approx(twin["dup10_char_frac"])


def test_repetition_stats_corpus_matches_twin(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {r["id"]: r.asDict() for r in textstats.repetition_stats(docs).collect()}
    src = docs.select("doc_id", "text").collect()
    assert len(got) == len(src)
    for r in src:
        want = textfns.repetition_stats_py(r["text"])
        g = got[str(r["doc_id"])]
        for k, v in want.items():
            assert g[k] == pytest.approx(v), (r["doc_id"], k)


# ------------------------------------------------- decontamination


def _py_contamination(doc_rows, bench_texts, n):
    bench_grams = set()
    for t in bench_texts:
        bench_grams |= textfns.ngram_set(t, n)
    out = {}
    for did, text in doc_rows:
        grams = textfns.ngram_set(text, n)
        hits = len(grams & bench_grams)
        if hits:
            out[did] = (hits, len(grams))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_decontaminate_matches_python(spark, docs_df):
    src = [(r["doc_id"], r["text"]) for r in docs_df.select("doc_id", "text").collect()]
    # benchmark: verbatim 13-token spans lifted from three docs + noise
    spans = [" ".join(t.split()[4:20]) for _, t in src[:3]]
    bench_texts = spans + ["completely unrelated benchmark prompt text here"]
    bench = spark.createDataFrame([(t,) for t in bench_texts], "text string")

    got = {
        r["doc_id"]: (r["n_contaminated"], r["n_grams"], r["contaminated_frac"])
        for r in dedup.decontaminate(docs_df, bench, n=13).collect()
    }
    want = _py_contamination(src, bench_texts, 13)
    assert set(got) == set(want)
    assert len(want) >= 3  # the three lifted spans must hit their docs
    for did, (hits, total) in want.items():
        gh, gt, frac = got[did]
        assert (gh, gt) == (hits, total)
        assert frac == pytest.approx(hits / total)


def test_decontaminate_short_docs_never_hit(spark):
    # a 5-token doc cannot contain a 13-gram even if benchmark contains it
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    bench = spark.createDataFrame([("a b c d e " * 5,)], "text string")
    assert dedup.decontaminate(docs, bench, n=13).count() == 0


def test_filter_contaminated_partition(spark, docs_df):
    src = [(r["doc_id"], r["text"]) for r in docs_df.select("doc_id", "text").collect()]
    spans = [" ".join(t.split()[:15]) for _, t in src[:2]]
    bench = spark.createDataFrame([(t,) for t in spans], "text string")
    bad = set(_py_contamination(src, spans, 13))
    clean_ids = {
        r["doc_id"] for r in dedup.filter_contaminated(docs_df, bench, n=13).collect()
    }
    assert clean_ids == {d for d, _ in src} - bad
    assert bad and bad.isdisjoint(clean_ids)


def test_decontaminate_plan_broadcasts_benchmark(spark, docs_df):
    bench = spark.createDataFrame([("x y z",)], "text string")
    plan = dedup.decontaminate(docs_df, bench, n=13)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# ------------------------------------------------- per-domain capping


def _py_cap(urls, cap, salt_buckets):
    by_host = {}
    for u in urls:
        by_host.setdefault(urlparse(u).netloc, []).append(u)
    kept = set()
    for _, us in by_host.items():
        us.sort(
            key=lambda u: (
                zlib.crc32(u.encode()) % salt_buckets,
                hashlib.md5(u.encode()).hexdigest(),
                u,
            )
        )
        kept |= set(us[:cap])
    return kept


@pytest.fixture(scope="module")
def urls_df(spark):
    # 4 domains with 40/20/7/1 pages — two above the cap, two below
    urls = (
        [f"https://big.example.com/p/{i:04d}" for i in range(40)]
        + [f"https://mid.example.org/a/{i:04d}" for i in range(20)]
        + [f"https://small.example.net/x/{i}" for i in range(7)]
        + ["https://one.example.io/only"]
    )
    return spark.createDataFrame([(u, len(u)) for u in urls], "url string, n long"), urls


def test_cap_per_domain_matches_twin(spark, urls_df):
    df, urls = urls_df
    for buckets in (16, 3):
        kept = textstats.cap_per_domain(df, cap=10, salt_buckets=buckets)
        got = {r["url"] for r in kept.collect()}
        assert got == _py_cap(urls, 10, buckets), buckets
        counts = Counter(urlparse(u).netloc for u in got)
        assert counts["big.example.com"] == 10
        assert counts["mid.example.org"] == 10
        assert counts["small.example.net"] == 7
        assert counts["one.example.io"] == 1


def test_cap_per_domain_deterministic_and_carries_columns(spark, urls_df):
    df, urls = urls_df
    a = {r["url"] for r in textstats.cap_per_domain(df, cap=5).collect()}
    b = {
        r["url"]
        for r in textstats.cap_per_domain(df.repartition(7), cap=5).collect()
    }
    assert a == b
    row = textstats.cap_per_domain(df, cap=5).limit(1).collect()[0]
    assert set(row.asDict()) == {"url", "n", "host"}


def test_cap_per_domain_tolerates_malformed_urls(spark):
    """A crawl always contains junk urls: they must not kill the job
    (ANSI parse_url throws; try_parse_url maps them to a NULL host) and
    the NULL-host group is capped like any domain."""
    urls = [f"https://ok.example.com/p{i}" for i in range(5)] + [
        "not a url",
        "///weird",
        "%%%",
        "",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = textstats.cap_per_domain(df, cap=3).collect()
    by_host = Counter(r["host"] for r in out)
    assert by_host["ok.example.com"] == 3
    assert by_host[None] == 3  # junk group capped too


def test_cap_per_domain_no_single_partition_exchange(spark, urls_df):
    df, _ = urls_df
    plan = textstats.cap_per_domain(df, cap=10)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


# ------------------------------------------------- corpus datasheet


def test_corpus_report_rollup_levels(spark, docs_df):
    rep = textstats.corpus_report(docs_df).collect()
    total = [r for r in rep if r["source"] is None and r["lang_pred"] is None]
    assert len(total) == 1 and total[0]["n_docs"] == docs_df.count()
    # per-source subtotals equal the sum of their language rows
    per_source = {}
    leaf = {}
    for r in rep:
        if r["source"] is not None and r["lang_pred"] is None:
            per_source[r["source"]] = r
        elif r["source"] is not None:
            leaf.setdefault(r["source"], []).append(r)
    assert per_source and leaf
    for s, sub in per_source.items():
        assert sub["n_docs"] == sum(r["n_docs"] for r in leaf[s])
        assert sub["n_tokens"] == sum(r["n_tokens"] for r in leaf[s])
        assert sub["n_chars"] == sum(r["n_chars"] for r in leaf[s])


def test_corpus_report_matches_python(spark, docs_df):
    rep = {
        (r["source"], r["lang_pred"]): r
        for r in textstats.corpus_report(docs_df).collect()
    }
    rows = docs_df.select("source", "text").collect()
    agg = {}
    for r in rows:
        key = (r["source"], textfns.lang_id(r["text"]))
        n_tok = len(textfns.tokens(r["text"]))
        q = textfns.quality_score(r["text"], len(r["text"]))
        d = agg.setdefault(key, [0, 0, 0, 0.0])
        d[0] += 1
        d[1] += n_tok
        d[2] += len(r["text"])
        d[3] += q
    assert set(k for k in rep if k[0] is not None and k[1] is not None) == set(agg)
    for key, (nd, nt, nc, qsum) in agg.items():
        g = rep[key]
        assert (g["n_docs"], g["n_tokens"], g["n_chars"]) == (nd, nt, nc)
        assert g["avg_quality"] == pytest.approx(qsum / nd)


def test_corpus_report_single_aggregate_plan(spark, docs_df):
    # the rollup must be ONE partial+final aggregate pass (Expand feeds a
    # single pair of HashAggregates) — not a union of per-level scans
    plan = (
        textstats.corpus_report(docs_df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") <= 1
    assert "Expand" in plan


# ------------------------------------------------- paragraph dedup


def test_dedup_paragraphs_hand_computed(spark):
    shared = "this exact cookie banner repeats on every page"
    rows = [
        (1, f"unique one\n\n{shared}\n\nunique two"),
        (2, f"{shared}\n\nother text"),
        (3, shared),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.dedup_paragraphs(df).collect()}
    # exactly ONE copy of the shared paragraph survives corpus-wide
    survivors = sum(shared in out[i]["text"] for i in (1, 2, 3))
    assert survivors == 1
    # unique paragraphs always survive, in original order
    assert "unique one" in out[1]["text"] and "unique two" in out[1]["text"]
    assert out[1]["text"].index("unique one") < out[1]["text"].index("unique two")
    assert "other text" in out[2]["text"]
    assert out[4]["text"] == "" and out[4]["n_paras_kept"] == 0
    # accounting: kept + dropped = non-empty paragraphs of the doc
    assert out[1]["n_paras_kept"] + out[1]["n_paras_dropped"] == 3
    assert out[3]["n_paras_kept"] + out[3]["n_paras_dropped"] == 1
    total_kept = sum(out[i]["n_paras_kept"] for i in (1, 2, 3, 4))
    assert total_kept == 4  # 3 unique + 1 shared survivor


def test_dedup_paragraphs_matches_twin(spark, docs_df):
    # build a corpus with real cross-doc paragraph repetition out of the
    # synth docs: every doc gets a shared header + its own two halves
    rows = docs_df.limit(40).select("doc_id", "text").collect()
    crafted = []
    for r in rows:
        toks = r["text"].split()
        half = len(toks) // 2
        crafted.append(
            (
                r["doc_id"],
                "SHARED HEADER PARAGRAPH\n\n"
                + " ".join(toks[:half])
                + "\n\n"
                + " ".join(toks[half:]),
            )
        )
    df = spark.createDataFrame(crafted, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_paras_kept"], r["n_paras_dropped"])
        for r in dedup.dedup_paragraphs(df).collect()
    }
    want = textfns.dedup_paragraphs_py({i: t for i, t in crafted})
    assert len(got) == len(want)
    for i, (text, kept, dropped) in want.items():
        assert got[i] == (text, kept, dropped), i


def test_dedup_paragraphs_keeper_is_content_independent(spark):
    # same corpus, different insertion order → same keeper (hash rule,
    # not partition order)
    rows = [(1, "dup para"), (2, "dup para")]
    a = dedup.dedup_paragraphs(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()
    b = dedup.dedup_paragraphs(
        spark.createDataFrame(list(reversed(rows)), "doc_id long, text string")
    ).collect()
    keep_a = {r["doc_id"]: r["text"] for r in a}
    keep_b = {r["doc_id"]: r["text"] for r in b}
    assert keep_a == keep_b
    assert sorted(keep_a.values()) == ["", "dup para"]


def test_dedup_paragraphs_plan_shape(spark):
    # keeper selection must be a partial+final aggregate (map-side combine
    # absorbs hot paragraph hashes), never a per-hash row_number window or
    # a single-partition exchange (limit() would add one — crafted df)
    df = spark.createDataFrame(
        [(i, f"para {i}\n\nshared") for i in range(20)], "doc_id long, text string"
    )
    plan = dedup.dedup_paragraphs(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "partial_min" in plan


# ------------------------------------------------- URL canonicalization


CANON_CASES = [
    ("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag", "http://example.com/a/b?a=1&b=2"),
    ("https://example.com:443/path/", "https://example.com/path"),
    ("https://www.example.com/", "https://example.com"),
    ("http://example.com", "http://example.com"),
    ("https://example.com/?gclid=abc", "https://example.com"),
    ("https://example.com/x?ref=tw&q=1", "https://example.com/x?q=1"),
    ("https://example.com/x?refresh=1", "https://example.com/x?refresh=1"),  # not 'ref'
    ("not a url", "not a url"),
    ("", ""),
]


def test_canonical_url_hand_cases_and_twin(spark):
    df = spark.createDataFrame([(u,) for u, _ in CANON_CASES], "url string")
    got = [
        r["c"]
        for r in df.select(textstats.canonical_url(F.col("url")).alias("c")).collect()
    ]
    for (u, want), g in zip(CANON_CASES, got):
        assert g == want, u
        assert textfns.canonical_url_py(u) == want, u


def test_canonical_url_matches_twin_on_corpus(spark, urls_df):
    df, urls = urls_df
    got = {
        r["url"]: r["c"]
        for r in df.select(
            "url", textstats.canonical_url(F.col("url")).alias("c")
        ).collect()
    }
    for u in urls:
        assert got[u] == textfns.canonical_url_py(u), u


def test_dedup_urls_keeps_one_per_canonical(spark):
    rows = [
        ("https://www.example.com/a?utm_source=x", 1),
        ("https://example.com/a", 2),
        ("HTTPS://EXAMPLE.COM/a", 3),
        ("https://example.com/b", 4),
        ("https://example.com/b", 5),  # exact duplicate row
        ("https://other.example/c", 6),
    ]
    df = spark.createDataFrame(rows, "url string, n int")
    got = textstats.dedup_urls(df).collect()
    canon = {r["canonical_url"] for r in got}
    assert canon == {
        "https://example.com/a",
        "https://example.com/b",
        "https://other.example/c",
    }
    assert len(got) == 3
    # keeper = smallest (md5(url), url) among the distinct urls per key
    import hashlib

    grp_a = ["https://www.example.com/a?utm_source=x", "https://example.com/a", "HTTPS://EXAMPLE.COM/a"]
    want_a = min(grp_a, key=lambda u: (hashlib.md5(u.encode()).hexdigest(), u))
    kept_a = next(r["url"] for r in got if r["canonical_url"] == "https://example.com/a")
    assert kept_a == want_a


def test_dedup_urls_plan_shape(spark):
    df = spark.createDataFrame(
        [(f"https://example.com/{i}",) for i in range(20)], "url string"
    )
    plan = textstats.dedup_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "partial_min" in plan


# ------------------------------------------------- collocations (PMI)


def test_collocations_crafted(spark):
    texts = [
        "new york is large",
        "i love new york",
        "the city is here",
        "the city sleeps",
        "in the night",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["w1"], r["w2"], r["n_pair"], r["pmi"])
        for r in textstats.collocations(df, min_count=2, top_k=10).collect()
    ]
    want = textfns.collocations_py(texts, min_count=2, top_k=10)
    assert [(g[0], g[1], g[2]) for g in got] == [(w[0], w[1], w[2]) for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], rel=1e-12)
    # both pairs occur 2×, but "new"/"york" occur ONLY together while
    # "the" also appears outside "the city" — perfect association wins
    assert got[0][:2] == ("new", "york")
    pmis = {(g[0], g[1]): g[3] for g in got}
    assert pmis[("new", "york")] > pmis[("the", "city")]
    # min_count drops singletons entirely
    assert all(g[2] >= 2 for g in got)


def test_collocations_corpus_matches_twin(spark, docs_df):
    got = [
        (r["w1"], r["w2"], r["n_pair"], r["pmi"])
        for r in textstats.collocations(
            docs_df, min_count=3, top_k=50
        ).collect()
    ]
    texts = [r["text"] for r in docs_df.select("text").collect()]
    want = textfns.collocations_py(texts, min_count=3, top_k=50)
    assert [(g[0], g[1], g[2]) for g in got] == [(w[0], w[1], w[2]) for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], rel=1e-12)


def test_collocations_empty_and_leak_free(spark):
    sc = spark.sparkContext._jsc.sc()
    before = sc.getPersistentRDDs().size()
    empty = textstats.collocations(
        spark.createDataFrame([("",)], "text string")
    )
    assert empty.count() == 0
    assert list(empty.columns) == ["w1", "w2", "n_pair", "pmi"]
    assert sc.getPersistentRDDs().size() == before


# ------------------------------------------------- host boilerplate lines


def test_strip_host_boilerplate_matches_twin(spark):
    banner = "Accept our cookies to continue"
    footer = "(c) 2024 Example Corp | Privacy | Terms"
    pages = (
        [
            (
                f"https://site.example/p{i}",
                f"{banner}\nUnique paragraph number {i}.\n\n{footer}",
            )
            for i in range(6)
        ]
        # one page missing the banner — furniture still detected via share
        + [("https://site.example/odd", f"Odd page body.\n{footer}")]
        # a small host below min_pages keeps everything
        + [
            (f"https://tiny.example/t{i}", f"{banner}\ntiny {i}")
            for i in range(2)
        ]
    )
    df = spark.createDataFrame(pages, "url string, text string")
    got = {
        r["url"]: (r["text"], r["n_lines_dropped"])
        for r in textstats.strip_host_boilerplate(df).collect()
    }
    want = textfns.strip_host_boilerplate_py(pages)
    assert got == want
    # furniture gone, content intact, empty spacer line kept (< min_chars)
    assert got["https://site.example/p0"] == (
        "Unique paragraph number 0.\n",
        2,
    )
    assert got["https://site.example/odd"] == ("Odd page body.", 1)
    # tiny host untouched (min_pages floor)
    assert got["https://tiny.example/t0"][1] == 0
    assert banner in got["https://tiny.example/t0"][0]
    # row count preserved
    assert len(got) == len(pages)


def test_strip_host_boilerplate_thresholds(spark):
    # share threshold: a line on 2/5 pages survives at min_share=0.5,
    # dies at 0.3
    pages = [
        (f"https://h.example/{i}", ("semi common line\nbody %d" % i) if i < 2 else f"body {i}")
        for i in range(5)
    ]
    df = spark.createDataFrame(pages, "url string, text string")
    loose = {
        r["url"]: r["n_lines_dropped"]
        for r in textstats.strip_host_boilerplate(
            df, min_share=0.3, min_pages=2
        ).collect()
    }
    strict = {
        r["url"]: r["n_lines_dropped"]
        for r in textstats.strip_host_boilerplate(
            df, min_share=0.5, min_pages=2
        ).collect()
    }
    assert loose["https://h.example/0"] == 1 and strict["https://h.example/0"] == 0
    for params in (dict(min_share=0.3, min_pages=2), dict(min_share=0.5, min_pages=2)):
        got = {
            r["url"]: (r["text"], r["n_lines_dropped"])
            for r in textstats.strip_host_boilerplate(df, **params).collect()
        }
        assert got == textfns.strip_host_boilerplate_py(pages, **params)


# ------------------------------------------------- C4 line/document filters


def test_c4_filters_hand_cases(spark):
    keeper = (
        "This is a perfectly normal first sentence.\n"
        "And here is a second good line!\n"
        'Is this a question line, asked politely?\n'
        "short one.\n"                       # < 3 words -> dropped
        "No terminal punctuation here\n"     # bad ending -> dropped
        "Enable JavaScript to view comments.\n"  # javascript -> dropped
        "A third keeper sentence. With two sentences inside it.\n"
        "Quoted endings also count as terminal.\""
    )
    rows = [
        ("u1", keeper),
        ("u2", "function f() { return 1; }\nGood sentence here though."),  # brace
        ("u3", "Lorem Ipsum dolor sit amet filler text here.\n" + keeper),  # lorem
        ("u4", "Only one sentence kept here.\nsecond line no punct"),  # < 5 sents
        ("u5", None),  # null text -> empty -> dropped
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {
        r["url"]: (r["text"], r["n_lines_dropped"], r["n_sentences"])
        for r in textstats.c4_filters(df).collect()
    }
    assert set(got) == {"u1"}
    new_text, n_dropped, n_sent = got["u1"]
    assert n_dropped == 3
    # 1 + 1 + 1 + 2 + 1 sentences across the five kept lines
    assert n_sent == 6
    assert "JavaScript" not in new_text and "short one." not in new_text
    assert new_text.startswith("This is a perfectly normal first sentence.\n")


def test_c4_filters_matches_twin_on_corpus(spark, pages_cache):
    # corpus text is log-styled (no terminal punctuation), so doctoring half
    # the lines with a period — in Python, BEFORE createDataFrame, so both
    # engines see identical bytes — exercises keeps AND drops at scale
    raw = (
        spark.read.parquet(str(pages_cache / "pages.parquet"))
        .select("url", "text")
        .limit(400)
        .collect()
    )
    src = [
        (
            r["url"],
            "\n".join(
                ln + "." if i % 2 == 0 else ln
                for i, ln in enumerate((r["text"] or "").split("\n"))
            ),
        )
        for r in raw
    ]
    df = spark.createDataFrame(src, "url string, text string")
    got = {
        r["url"]: (r["text"], r["n_lines_dropped"], r["n_sentences"])
        for r in textstats.c4_filters(df, min_sentences=1).collect()
    }
    kept_twin = {}
    for u, t in src:
        new_text, dropped, n_sent, keep = textfns.c4_filter_py(t, min_sentences=1)
        if keep:
            kept_twin[u] = (new_text, dropped, n_sent)
    assert got == kept_twin
    assert 0 < len(got) < len(src)  # the rule actually bites both ways


def test_c4_filters_bad_words_token_exact(spark):
    base = (
        "A first good sentence right here.\n"
        "Second sentence is also fine.\n"
        "Third one keeps the page alive.\n"
        "Fourth sentence of quality text.\n"
        "Fifth sentence closes it out."
    )
    rows = [
        ("clean", base),
        ("dirty", base + "\nThis page mentions badword once more here."),
        # substring must NOT match (token-exact contract)
        ("sub", base + "\nThis page mentions badwordish compounds here."),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {r["url"] for r in textstats.c4_filters(df, bad_words=("BadWord",)).collect()}
    assert got == {"clean", "sub"}
    for u, t in rows:
        _, _, _, keep = textfns.c4_filter_py(t, bad_words=("BadWord",))
        assert keep == (u in got)


# ------------------------------------------------- yield curve


def test_yield_curve_matches_twin(spark, docs_df):
    """Quality-threshold sweep over the corpus == the Python twin,
    including weighted (token-mass) survival, NaN/NULL score exclusion,
    and threshold dedup/sort."""
    scored = docs_df.select(
        textstats.quality_score(F.col("text"), F.length("text")).alias("q"),
        textstats.token_count(F.col("text")).cast("double").alias("ntok"),
    ).withColumn(
        "q",
        F.when(F.col("ntok") % 17 == 0, F.lit(None).cast("double"))
        .when(F.col("ntok") % 17 == 1, F.lit(float("nan")))
        .otherwise(F.col("q")),
    )
    ts = [0.9, 0.25, 0.5, 0.25, 0.0]  # dup + unsorted on purpose
    got = textstats.yield_curve(scored, "q", ts, weight_col="ntok")
    rows = [(r["q"], r["ntok"]) for r in scored.collect()]
    want = textfns.yield_curve_py(rows, ts)
    assert [g["threshold"] for g in got] == [0.0, 0.25, 0.5, 0.9]
    for g, w in zip(got, want):
        assert g["n_docs"] == w["n_docs"]
        assert g["frac_docs"] == pytest.approx(w["frac_docs"], abs=1e-12)
        assert g["weight"] == pytest.approx(w["weight"], rel=1e-12)
        assert g["frac_weight"] == pytest.approx(w["frac_weight"], rel=1e-12)
    # monotone non-increasing survival
    assert all(a["n_docs"] >= b["n_docs"] for a, b in zip(got, got[1:]))
    with pytest.raises(ValueError):
        textstats.yield_curve(scored, "q", [])


def test_yield_curve_single_scan_no_shuffle(spark, docs_df):
    """The sweep is ONE wide agg: no Exchange hashpartitioning (scalar
    agg goes partial → SinglePartition final), one scan."""
    scored = docs_df.select(
        F.length("text").cast("double").alias("q"),
        F.lit(1.0).alias("w"),
    )
    # capture the plan of the agg the function builds by rebuilding it
    s = F.col("q")
    scored_flag = s.isNotNull() & ~F.isnan(s)
    aggs = [F.sum(scored_flag.cast("long")).alias("_total")]
    for i, t in enumerate([0.0, 10.0, 100.0]):
        aggs.append(F.sum((scored_flag & (s >= t)).cast("long")).alias(f"_n{i}"))
    plan = scored.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("Scan") == 1


# ------------------------------------------------- winnowing


def test_winnow_fingerprints_twin_and_guarantee(spark, docs_df):
    """Spark winnowing == the kernel applied per doc; density is the
    ~2/(w+1) thin-out; and the MOSS guarantee holds: two docs sharing a
    token run of >= k+w-1 share at least one fingerprint, while disjoint
    docs share none."""
    from logagg import textstats

    k, w = 5, 4
    sample = docs_df.limit(40)
    got = {}
    for r in textstats.winnow_fingerprints(sample, k=k, w=w).collect():
        got.setdefault(r["id"], []).append((r["pos"], r["fp"]))
    rows = {str(r["doc_id"]): r["text"] for r in sample.collect()}
    assert set(got) <= set(rows)
    for did, text in rows.items():
        want = textfns.winnow_py(text, k, w)
        assert sorted(got.get(did, [])) == sorted(want)
        n_grams = max(0, len(textfns.tokens(text)) - k + 1)
        if n_grams > w:
            # winnowing keeps roughly 2/(w+1) of grams; never more than
            # one per window start, never fewer than 1/w
            assert len(want) <= n_grams - w + 1
            assert len(want) >= (n_grams - w + 1) / w

    # guarantee: planted shared run of k+w-1 tokens → shared fingerprint
    shared_run = " ".join(f"tok{i}" for i in range(k + w - 1))
    a = f"alpha beta {shared_run} gamma delta epsilon zeta"
    b = f"one two three four {shared_run} five six seven"
    c = "entirely different words with no overlap at all here"
    df = spark.createDataFrame(
        [("a", a), ("b", b), ("c", c)], "doc_id string, text string"
    )
    fps = {}
    for r in textstats.winnow_fingerprints(df, k=k, w=w).collect():
        fps.setdefault(r["id"], set()).add(r["fp"])
    assert fps["a"] & fps["b"]          # the planted overlap is caught
    assert not (fps["a"] & fps["c"])    # disjoint docs share nothing
    assert not (fps["b"] & fps["c"])

    import pytest

    with pytest.raises(ValueError):
        textstats.winnow_fingerprints(df, k=0)


def test_winnow_overlaps_finds_planted_passages(spark):
    """Two planted shared passages → a pair at min_shared=2; a single
    short overlap stays below it; boilerplate fingerprints (df > df_max)
    pair nothing."""
    from logagg import textstats

    k, w = 5, 4
    run1 = " ".join(f"p{i}" for i in range(k + w - 1))
    run2 = " ".join(f"q{i}" for i in range(k + w - 1))
    rows = [
        ("a", f"alpha beta {run1} middle words here {run2} tail end text"),
        ("b", f"start {run1} other unrelated stuff {run2} closing words now"),
        ("c", f"only one overlap {run1} nothing else in common at all"),
        ("d", "completely disjoint document with none of those passages"),
    ]
    # boilerplate: the same footer on MANY docs — df_max cuts it
    footer = " ".join(f"f{i}" for i in range(k + w - 1))
    rows += [(f"bp{i}", f"doc {i} body text variant {i} {footer}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id string, text string")

    got = {
        (r["id_a"], r["id_b"]): r["shared"]
        for r in textstats.winnow_overlaps(
            df, k=k, w=w, min_shared=2, df_max=4
        ).collect()
    }
    assert ("a", "b") in got and got[("a", "b")] >= 2
    # c shares only run1 with a/b: below min_shared=2 unless the run
    # contributes 2+ fingerprints — allow either absence or lower count
    for pair, n in got.items():
        assert n >= 2
    # the 8 boilerplate docs share ONLY the footer (df=8 > df_max=4):
    # no bp-bp pair may appear
    assert not any(a.startswith("bp") and b.startswith("bp") for a, b in got)
    assert not any("d" in pair for pair in got)


# ------------------------------------------------- passage decontamination


def test_decontaminate_passages_finds_planted_leak(spark):
    """A benchmark passage of k+w-1 tokens embedded mid-document is
    flagged with positions inside the planted region; clean docs pass;
    filter drops exactly the flagged set."""
    from logagg import dedup

    k, w = 5, 4
    leak = " ".join(f"bench{i}" for i in range(k + w - 1))
    docs = spark.createDataFrame(
        [
            ("dirty", f"clean prefix words here {leak} clean suffix words here"),
            ("clean", "totally unrelated training document with safe content"),
            ("short", "tiny"),
        ],
        "doc_id string, text string",
    )
    bench = spark.createDataFrame(
        [(f"question preamble {leak} answer options follow",)], "text string"
    )
    got = {
        r["doc_id"]: (r["n_shared_fps"], r["positions"])
        for r in dedup.decontaminate_passages(docs, bench, k=k, w=w).collect()
    }
    assert set(got) == {"dirty"}
    n, positions = got["dirty"]
    assert n >= 1
    # the doc's leaked run spans token positions [4, 4+k+w-1); every
    # shared fingerprint's gram start must fall inside it
    assert all(4 <= p < 4 + w for p in positions)

    kept = {
        r["doc_id"]
        for r in dedup.filter_contaminated_passages(docs, bench, k=k, w=w).collect()
    }
    assert kept == {"clean", "short"}
    # broadcast plan: benchmark side rides a BroadcastExchange
    plan = (
        dedup.decontaminate_passages(docs, bench, k=k, w=w)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
