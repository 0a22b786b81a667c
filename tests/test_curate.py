"""The composed curation pipeline: stage equivalence, manifest accounting,
per-stage parquet materialization + resume."""

import pytest

from pyspark.sql import functions as F

from logagg import curate, dedup, textfns, textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def crafted(spark):
    """30 base docs + 3 exact copies + 3 near copies (one appended token)
    + 2 PII docs, with urls over 3 hosts."""
    base = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .orderBy("doc_id")
        .limit(30)
        .select("doc_id", "text")
        .collect()
    )
    rows = [(r["doc_id"], r["text"]) for r in base]
    next_id = max(i for i, _ in rows) + 1
    # copy/PII sources are chosen among docs that PASS the default
    # repetition limits (twin-checked: only indices 0 and 27 fail), so the
    # dedup stages see exactly the crafted duplicates
    for j, k in enumerate((1, 2, 6)):  # exact copies
        rows.append((next_id + j, rows[k][1]))
    for j, k in enumerate((3, 4, 5)):  # near copies (one appended token)
        rows.append((next_id + 3 + j, rows[k][1] + " extra"))
    rows.append((next_id + 6, "contact me bob@corp.example.com or 10.1.2.3 " + rows[9][1]))
    rows.append((next_id + 7, "call 415-555-1234 now " + rows[10][1]))
    data = [
        (i, t, f"https://h{i % 3}.example.com/doc/{i:05d}") for i, t in rows
    ]
    return spark.createDataFrame(data, "doc_id long, text string, url string")


def test_manifest_accounting_chains(spark, crafted):
    cached_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    res = curate.curate(
        crafted,
        redact=True,
        quality_min=0.05,
        repetition_limits=curate.DEFAULT_REPETITION_LIMITS,
        exact_dedup=True,
        url_col="url",
        domain_cap=10,
        pack_capacity=64,
    )
    m = res.manifest
    assert [s["stage"] for s in m] == [
        "redact_pii",
        "quality_filter",
        "repetition_filter",
        "exact_dedup",
        "domain_cap",
        "pack_sequences",
    ]
    # rows_out of stage i == rows_in of stage i+1; transforms drop nothing
    for a, b in zip(m, m[1:]):
        assert a["rows_out"] == b["rows_in"]
    assert m[0]["rows_in"] == crafted.count()
    assert m[0]["rows_out"] == m[0]["rows_in"]  # redact transforms only
    assert m[-1]["rows_out"] == m[-1]["rows_in"]  # packing transforms only
    q = next(s for s in m if s["stage"] == "quality_filter")
    assert q["rows_in"] == q["rows_out"]  # corpus clears the 0.05 floor
    rep = next(s for s in m if s["stage"] == "repetition_filter")
    assert rep["rows_in"] - rep["rows_out"] == 2  # base docs 0 and 27
    ex = next(s for s in m if s["stage"] == "exact_dedup")
    assert ex["rows_in"] - ex["rows_out"] == 3  # the three exact copies
    # packed output carries the packing columns
    assert {"bucket", "seq_idx", "seq_offset", "n_windows"} <= set(res.docs.columns)
    assert res.manifest_df(spark).count() == len(m)
    # cache hygiene: pipelined persist must leave ONLY the final stage
    # cached, and unpersist() releases that. <= not ==: the session-wide
    # count can DROP mid-test when py4j GC releases localCheckpoint
    # frames persisted by earlier test files (same lesson as
    # test_dup_clusters_chain_converges_logarithmically)
    res.docs.count()
    res.unpersist()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() <= cached_before


def test_equivalent_to_manual_stage_application(spark, crafted):
    res = curate.curate(
        crafted,
        redact=True,
        quality_min=0.05,
        exact_dedup=True,
        benchmark=spark.createDataFrame(
            [(" ".join(crafted.collect()[0]["text"].split()[:20]),)], "text string"
        ),
    )
    bench = spark.createDataFrame(
        [(" ".join(crafted.collect()[0]["text"].split()[:20]),)], "text string"
    )
    d = crafted.withColumn("text", textstats.redact_pii(F.col("text")))
    d = d.filter(textstats.quality_score(F.col("text"), F.length("text")) >= 0.05)
    groups = dedup.exact_dupes(d)
    d = (
        d.withColumn("_md5", F.md5(F.col("text").cast("binary")))
        .join(groups.select(F.col("text_md5").alias("_md5"), "keeper"), "_md5")
        .filter(F.col("doc_id") == F.col("keeper"))
        .drop("_md5", "keeper")
    )
    d = dedup.filter_contaminated(d, bench, n=13)
    want = {(r["doc_id"], r["text"]) for r in d.collect()}
    got = {(r["doc_id"], r["text"]) for r in res.docs.collect()}
    assert got == want and got


def test_language_filter_stage(spark):
    docs = spark.createDataFrame(
        [
            (1, "the server and the job failed the run"),
            (2, "el proceso con fallo el lunes con el"),
            (3, "le job dans erreur le mode dans le"),
        ],
        "doc_id long, text string",
    )
    res = curate.curate(docs, langs=("en", "es"), exact_dedup=False)
    assert {r["doc_id"] for r in res.docs.collect()} == {1, 2}
    m = res.manifest
    assert m == [{"stage": "language_filter", "rows_in": 3, "rows_out": 2}]
    # the helper column must not leak into the output
    assert set(res.docs.columns) == {"doc_id", "text"}
    # prediction agrees with the pure-Python oracle
    for r in docs.collect():
        assert textfns.lang_id(r["text"]) in ("en", "es", "fr")


def test_redact_pii_spark_matches_twin(spark, crafted):
    rows = crafted.select("doc_id", "text").collect()
    got = {
        r["doc_id"]: r["red"]
        for r in crafted.select(
            "doc_id", textstats.redact_pii(F.col("text")).alias("red")
        ).collect()
    }
    hit = 0
    for r in rows:
        assert got[r["doc_id"]] == textfns.redact_pii_py(r["text"])
        hit += got[r["doc_id"]] != r["text"]
    assert hit == 2  # exactly the two crafted PII docs change
    assert "<EMAIL>" in got[max(got) - 1] and "<IP>" in got[max(got) - 1]
    assert "<PHONE>" in got[max(got)]


def test_near_dedup_stage_drops_near_copies(spark, crafted):
    res = curate.curate(crafted, exact_dedup=True, near_dedup=True)
    m = {s["stage"]: s for s in res.manifest}
    # 3 exact copies die in exact_dedup. near_dedup then removes 6: the 3
    # crafted near copies (33,34,35), the corpus's own genuine near-dup
    # pair (8,12) → 12, and the two PII docs (36,37), whose added prefix
    # leaves Jaccard ≥ 0.8 with their source docs — all twin-verified
    # ground truth (9 J≥0.8 pairs in the crafted corpus).
    assert m["exact_dedup"]["rows_in"] - m["exact_dedup"]["rows_out"] == 3
    dropped_near = m["near_dedup"]["rows_in"] - m["near_dedup"]["rows_out"]
    assert dropped_near == 6
    ids = {r["doc_id"] for r in res.docs.select("doc_id").collect()}
    # each component keeps its numeric-min id ("34" < "4" string order must
    # NOT pick the copy as keeper)
    assert ids.isdisjoint({12, 30, 31, 32, 33, 34, 35, 36, 37})
    assert {3, 4, 5, 8, 9, 10} <= ids


def test_substring_dedup_stage(spark):
    texts = {
        1: "s1 s2 s3 s4 tail1 tail2",
        2: "s1 s2 s3 s4 other stuff",
        3: "clean doc nothing shared",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    res = curate.curate(df, exact_dedup=False, substring_n=4)
    m = res.manifest
    assert m == [{"stage": "substring_dedup", "rows_in": 3, "rows_out": 3}]
    got = {r["doc_id"]: r["text"] for r in res.docs.collect()}
    want = textfns.repeated_ngram_spans_py(texts, n=4, min_count=2)
    for i, t in texts.items():
        assert got[i] == textfns.cut_spans_py(t, want.get(i, []))
    assert got[1] == "tail1 tail2" and got[3] == texts[3]
    res.unpersist()


def test_materialize_dir_and_resume(spark, crafted, tmp_path):
    cfg = dict(
        redact=True,
        quality_min=0.05,
        exact_dedup=True,
        url_col="url",
        domain_cap=10,
    )
    plain = curate.curate(crafted, **cfg)
    mdir = str(tmp_path / "stages")
    landed = curate.curate(crafted, materialize_dir=mdir, **cfg)
    key = lambda df: {(r["doc_id"], r["text"], r["url"]) for r in df.collect()}  # noqa: E731
    assert key(landed.docs) == key(plain.docs)
    assert landed.manifest == plain.manifest
    import os

    stages = sorted(os.listdir(mdir))
    assert stages and all("_" in s for s in stages)
    # resume: every stage output exists, so no stage recomputes — poison
    # the input to PROVE the landed parquet is what's served
    poisoned = crafted.withColumn("text", F.lit("poison"))
    resumed = curate.curate(poisoned, materialize_dir=mdir, resume=True, **cfg)
    assert key(resumed.docs) == key(plain.docs)
    assert [s["stage"] for s in resumed.manifest] == [s["stage"] for s in plain.manifest]


def test_repetition_stage_with_url_keys(spark):
    # the Arrow kernel carries string ids — a url-keyed corpus (no numeric
    # doc_id) must flow through the repetition stage unchanged
    rows = [
        ("http://a.example/x", "a normal little document with words"),
        ("http://b.example/y", "spam spam spam spam spam spam spam spam"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    res = curate.curate(
        df,
        id_col="url",
        repetition_limits={"top2_char_frac": 0.5},
        exact_dedup=False,
    )
    kept = [r["url"] for r in res.docs.select("url").collect()]
    assert kept == ["http://a.example/x"]
    assert res.manifest[0]["rows_out"] == 1
    res.unpersist()


def test_paragraph_dedup_stage(spark):
    shared = "same cookie banner on every page"
    rows = [(1, f"{shared}\n\nbody one"), (2, f"{shared}\n\nbody two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = curate.curate(df, paragraph_dedup=True, exact_dedup=False)
    assert [m["stage"] for m in res.manifest] == ["paragraph_dedup"]
    # transform-only: both docs survive, exactly one keeps the banner
    out = {r["doc_id"]: r["text"] for r in res.docs.collect()}
    assert len(out) == 2
    assert sum(shared in t for t in out.values()) == 1
    assert "body one" in out[1] and "body two" in out[2]
    assert "n_paras_kept" not in res.docs.columns
    res.unpersist()


def test_curate_pages_end_to_end(spark, pages_cache):
    pages = spark.read.parquet(f"{pages_cache}/pages.parquet").limit(200)
    res = curate.curate_pages(pages, quality_min=0.01, exact_dedup=True)
    stages = [m["stage"] for m in res.manifest]
    assert stages[0] == "extract_content"
    assert stages[1:] == ["quality_filter", "exact_dedup"]
    assert res.manifest[0]["rows_in"] == 200
    # extraction chains into curation: stage 0 rows_out == stage 1 rows_in
    assert res.manifest[0]["rows_out"] == res.manifest[1]["rows_in"]
    assert res.manifest[0]["rows_out"] > 180  # synth pages extract cleanly
    out = res.docs
    assert set(out.columns) >= {"url", "text"}
    # extracted text is whitespace-normalized block content, never html
    sample = out.select("text").first()["text"]
    assert "<" not in sample.split()[0]
    res.unpersist()


def test_host_boilerplate_stage(spark):
    banner = "Accept cookies to continue reading"
    rows = [
        (i, f"{banner}\nreal document body number {i}", f"https://h.example/p{i}")
        for i in range(4)
    ] + [(9, "no banner here at all", "https://other.example/solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    res = curate.curate(
        df, url_col="url", host_boilerplate=True, exact_dedup=False
    )
    assert [m["stage"] for m in res.manifest] == ["host_boilerplate"]
    out = {r["doc_id"]: r["text"] for r in res.docs.collect()}
    # transform-only: all rows survive, the shared banner is gone from
    # every h.example page, bodies and the solo host intact
    assert len(out) == 5
    assert all(banner not in out[i] for i in range(4))
    assert all(f"body number {i}" in out[i] for i in range(4))
    assert out[9] == "no banner here at all"
    assert "n_lines_dropped" not in res.docs.columns
    # equal to the twin applied manually
    want = textfns.strip_host_boilerplate_py(
        [(u, t) for _, t, u in rows]
    )
    got_by_url = {
        r["url"]: r["text"] for r in res.docs.collect()
    }
    assert got_by_url == {u: t for u, (t, _) in want.items()}
    res.unpersist()
    with pytest.raises(ValueError, match="url_col"):
        curate.curate(df, host_boilerplate=True, exact_dedup=False)


def test_c4_stage(spark):
    good = "\n".join(f"Sentence number {i} is a fine keeper." for i in range(6))
    rows = [
        ("d1", good),
        ("d2", good + "\nplus a stray { brace"),       # doc-dropped: brace
        ("d3", "no terminal punctuation anywhere\nstill none"),  # all lines cut
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    res = curate.curate(docs, c4=True, exact_dedup=False)
    stages = [m["stage"] for m in res.manifest]
    assert stages == ["c4_filters"]
    out = {r["doc_id"]: r["text"] for r in res.docs.collect()}
    assert set(out) == {"d1"} and out["d1"] == good
    assert res.docs.columns == docs.columns  # accounting cols dropped


def test_fuzzy_decontaminate_stage(spark, crafted):
    # near-copy of doc 0's text (drop the first two tokens) as the eval item:
    # exact 13-gram decontamination also fires on it, so craft the bench text
    # SHORT enough to share no 13-gram but keep shingle Jaccard >= 0.8
    base = crafted.collect()[0]["text"]
    toks = base.split()
    para = " ".join(toks[2:])
    bench = spark.createDataFrame([(para,)], "text string")
    only_exact = curate.curate(
        crafted, benchmark=bench, ngram_n=10_000, exact_dedup=False
    )
    both = curate.curate(
        crafted,
        benchmark=bench,
        ngram_n=10_000,  # exact probe neutered (no doc has 10k tokens)
        fuzzy_decontaminate=True,
        exact_dedup=False,
    )
    stages = [m["stage"] for m in both.manifest]
    assert stages == ["decontaminate", "decontaminate_fuzzy"]
    kept_exact = {r["doc_id"] for r in only_exact.docs.collect()}
    kept_both = {r["doc_id"] for r in both.docs.collect()}
    dropped_by_fuzzy = kept_exact - kept_both
    assert crafted.collect()[0]["doc_id"] in dropped_by_fuzzy


def test_dsir_stage(spark, crafted):
    target = crafted.limit(1).select("text")
    res = curate.curate(
        crafted, exact_dedup=False, dsir_target=target, dsir_k=2
    )
    assert [m["stage"] for m in res.manifest] == ["dsir_select"]
    out = res.docs.collect()
    assert len(out) == 2 and res.docs.columns == crafted.columns
    with pytest.raises(ValueError, match="dsir_k"):
        curate.curate(crafted, exact_dedup=False, dsir_target=target)


def test_quality_sample_stage(spark, crafted):
    """The A-ES selection tail: exactly sample_k survivors, schema
    preserved, and the pick identical to calling mix.weighted_sample with
    the same quality weights and seed directly."""
    from pyspark.sql import functions as F

    from logagg import mix, textstats

    res = curate.curate(crafted, exact_dedup=False, sample_k=10)
    assert [m["stage"] for m in res.manifest] == ["quality_sample"]
    out = res.docs.collect()
    assert len(out) == 10 and res.docs.columns == crafted.columns
    weighted = crafted.withColumn(
        "_w",
        textstats.quality_score(F.col("text"), F.length("text")) + F.lit(1e-9),
    )
    want = {
        r["doc_id"]
        for r in mix.weighted_sample(
            weighted, "_w", 10, id_col="doc_id", seed="curate-wrs"
        ).collect()
    }
    assert {r["doc_id"] for r in out} == want


def test_passage_decontaminate_stage(spark, crafted):
    """Third decontamination mode: a doc with an embedded benchmark
    passage drops while exact-13-gram-clean docs without it survive."""
    from pyspark.sql import functions as F

    leak = " ".join(f"bench{i}" for i in range(8))  # k+w-1 at defaults
    poisoned = crafted.withColumn(
        "text",
        F.when(
            F.col("doc_id") == 3, F.concat(F.col("text"), F.lit(f" {leak}"))
        ).otherwise(F.col("text")),
    )
    bench = spark.createDataFrame([(f"prompt {leak} choices",)], "text string")
    res = curate.curate(
        poisoned,
        exact_dedup=False,
        benchmark=bench,
        passage_decontaminate=True,
    )
    stages = [m["stage"] for m in res.manifest]
    assert stages == ["decontaminate", "decontaminate_passages"]
    ids = {r["doc_id"] for r in res.docs.collect()}
    assert 3 not in ids and len(ids) == poisoned.count() - 1
