"""Bigram-LM perplexity filter (lm.py) and context-window chunking.

The scoring kernel is single-sourced in textfns.score_tokens_py, so the
crafted cases here pin the MATH with hand-computed literals (the
repetition_stats pattern); training counts are checked against independent
Counter reconstructions, and the Spark scorer against a driver-side loop
over the same corpus (bit-identical — integer counts, fixed fold order)."""

import math
from collections import Counter

import pytest

from pyspark.sql import functions as F

from logagg import curate, lm, textfns, textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def tiny_lm(spark):
    df = spark.createDataFrame([(1, "a b a"), (2, "a b")], "doc_id long, text string")
    return lm.train_lm(df, top_k=10, max_bigrams=100)


# ------------------------------------------------- training


def test_train_lm_hand_computed(tiny_lm):
    assert tiny_lm.vocab == {"a": 3, "b": 2}
    assert tiny_lm.total == 5 and tiny_lm.unk_n == 0
    assert tiny_lm.bigrams == {"a b": 2, "b a": 1}
    assert tiny_lm.n_vocab == 3


def test_train_lm_counts_match_counter(spark, docs_df):
    sample = docs_df.limit(60)
    model = lm.train_lm(sample, top_k=100_000, max_bigrams=1_000_000)
    uni: Counter = Counter()
    big: Counter = Counter()
    for r in sample.select("text").collect():
        toks = textfns.tokens(r["text"])
        uni.update(toks)
        big.update(a + " " + b for a, b in zip(toks, toks[1:]))
    assert model.vocab == dict(uni)
    assert model.total == sum(uni.values()) and model.unk_n == 0
    assert model.bigrams == dict(big)


def test_train_lm_pruning_and_unk(spark):
    # c: 4, b: 3, a: 2, z: 1 → top_k=2 keeps {c, b}; a+z fall to UNK
    text = "c c c c b b b a a z"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    model = lm.train_lm(df, top_k=2, max_bigrams=100)
    assert model.vocab == {"c": 4, "b": 3}
    assert model.unk_n == 3 and model.total == 10
    # mapped stream: c c c c b b b u u u
    assert model.bigrams == {"c c": 3, "c b": 1, "b b": 2, "b <unk>": 1, "<unk> <unk>": 2}


def test_literal_unk_token_joins_the_bucket(spark):
    # a document containing the literal token "<unk>" must not collide
    # with the UNK bucket: it is excluded from the vocab on the train side
    # and mapped to the bucket on both sides
    df = spark.createDataFrame(
        [(1, "<unk> x x <unk>")], "doc_id long, text string"
    )
    model = lm.train_lm(df, top_k=10, max_bigrams=100)
    assert "<unk>" not in model.vocab
    assert model.vocab == {"x": 2} and model.unk_n == 2
    assert model.bigrams == {"<unk> x": 1, "x x": 1, "x <unk>": 1}


def test_min_bigram_count_prunes(spark):
    df = spark.createDataFrame([(1, "a b a b c")], "doc_id long, text string")
    model = lm.train_lm(df, top_k=10, max_bigrams=100, min_bigram_count=2)
    assert model.bigrams == {"a b": 2}  # "b a" and "b c" occur once


def test_lm_json_roundtrip(tiny_lm):
    back = lm.LocalLM.from_json(tiny_lm.to_json())
    assert back == tiny_lm


# ------------------------------------------------- scoring math (pinned)


def test_score_hand_computed(tiny_lm):
    # "a b": first token a → unigram (3+1)/(5+3) = 1/2 (no alpha, no
    # context); then bigram (a b) = 2 / c(a)=3. ppl = (1/2 * 2/3)^(-1/2)
    n, logp, ppl = textfns.score_tokens_py(["a", "b"], tiny_lm)
    assert n == 2
    assert logp == math.log(0.5) + math.log(2 / 3)
    assert ppl == pytest.approx(math.sqrt(3.0), rel=1e-12)


def test_score_backoff_applies_alpha(tiny_lm):
    # "b b": unseen bigram (b b) → alpha * unigram(b) = 0.4 * (2+1)/(5+3)
    n, logp, ppl = textfns.score_tokens_py(["b", "b"], tiny_lm)
    uni_b_first = (2 + 1) / (5 + 3)
    assert logp == math.log(uni_b_first) + math.log(0.4 * uni_b_first)


def test_score_unk_and_empty(tiny_lm):
    # unseen token → UNK bucket, count 0, add-one keeps the log finite
    n, logp, ppl = textfns.score_tokens_py(["zzz"], tiny_lm)
    assert logp == math.log((0 + 1) / (5 + 3))
    assert textfns.score_tokens_py([], tiny_lm) == (0, 0.0, None)


def test_fluent_text_scores_lower_than_gibberish(spark, docs_df):
    model = lm.train_lm(docs_df, top_k=20_000, max_bigrams=200_000)
    sample_text = docs_df.select("text").first()["text"]
    fluent = textfns.score_tokens_py(textfns.tokens(sample_text), model)[2]
    gibberish = textfns.score_tokens_py(
        ["qqq", "zxzx", "vvvv", "jjjj", "wwww"] * 4, model
    )[2]
    assert fluent < gibberish


# ------------------------------------------------- Spark scorer


def test_doc_perplexity_matches_twin(spark, docs_df):
    sample = docs_df.limit(200)
    model = lm.train_lm(sample, top_k=5_000, max_bigrams=50_000)
    got = {
        r["id"]: (r["n_tokens"], r["logprob"], r["ppl"])
        for r in lm.doc_perplexity(sample, model).collect()
    }
    src = sample.select("doc_id", "text").collect()
    assert len(got) == len(src)
    for r in src:
        n, logp, ppl = textfns.score_tokens_py(textfns.tokens(r["text"]), model)
        g = got[str(r["doc_id"])]
        # bit-identical: same counts, same fold order, same libm
        assert g == (n, logp, ppl), r["doc_id"]


def test_with_perplexity_preserves_id_type_and_rows(spark, docs_df, tiny_lm):
    sample = docs_df.limit(50)
    out = lm.with_perplexity(sample, tiny_lm)
    assert out.count() == 50
    assert dict(out.dtypes)["doc_id"] == dict(sample.dtypes)["doc_id"]
    assert dict(out.dtypes)["ppl"] == "double"
    assert out.filter(F.col("ppl").isNull()).count() == 0  # corpus docs all tokenized


def test_curate_perplexity_stage(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat"),
        (3, "zq xv qqq zq xv"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # train on the fluent docs only — doc 3 is out-of-distribution
    model = lm.train_lm(df.filter("doc_id < 3"), top_k=100, max_bigrams=1000)
    ppl3 = lm.perplexity_py(rows[2][1], model)
    ppl1 = lm.perplexity_py(rows[0][1], model)
    assert ppl1 < ppl3
    res = curate.curate(
        df, ppl_lm=model, ppl_max=(ppl1 + ppl3) / 2, exact_dedup=False
    )
    assert [m["stage"] for m in res.manifest] == ["perplexity_filter"]
    assert res.manifest[0]["rows_in"] == 3 and res.manifest[0]["rows_out"] == 2
    assert sorted(r["doc_id"] for r in res.docs.select("doc_id").collect()) == [1, 2]
    res.unpersist()


def test_curate_ppl_requires_max(spark, tiny_lm):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="ppl_max"):
        curate.curate(df, ppl_lm=tiny_lm)


def test_curate_ppl_bucket_stage_matches_manual(spark):
    # 12 docs spanning in-distribution → garbage; buckets are RELATIVE
    # terciles, so head/middle survive regardless of absolute scale
    fluent = "the cat sat on the mat"
    rows = [(i, fluent if i < 4 else (f"odd {'zq ' * i}" if i < 8 else "qx " * i))
            for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = lm.train_lm(df.filter("doc_id < 4"), top_k=100, max_bigrams=1000)
    res = curate.curate(
        df, ppl_lm=model, ppl_bucket_keep=("head", "middle"), exact_dedup=False
    )
    assert [m["stage"] for m in res.manifest] == ["ppl_bucket_filter"]
    manual = lm.ppl_buckets(df, model).filter(
        F.col("ppl_bucket").isin("head", "middle")
    )
    assert sorted(r["doc_id"] for r in res.docs.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in manual.select("doc_id").collect()
    )
    assert res.docs.columns == df.columns  # scoring columns dropped
    assert 0 < res.manifest[0]["rows_out"] < 12
    res.unpersist()


def test_curate_ppl_knobs_are_exclusive_and_validated(spark, tiny_lm):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="exactly one"):
        curate.curate(df, ppl_lm=tiny_lm, ppl_max=1.0, ppl_bucket_keep=("head",))
    with pytest.raises(ValueError, match="subset"):
        curate.curate(df, ppl_lm=tiny_lm, ppl_bucket_keep=("torso",))


# ------------------------------------------------- chunking


def test_chunk_documents_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4"), (2, "a b c"), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    out = textstats.chunk_documents(df, max_tokens=4, overlap=2)
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        for r in out.collect()
    )
    # doc 1: n=5, step=2, last=ceil(1/2)=1 → [0:4], [2:5]
    # doc 2 fits in one window; docs 3/4 have no tokens → no chunks
    assert rows == [
        (1, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 3, "t2 t3 t4"),
        (2, 0, 3, "a b c"),
    ]


def test_chunk_documents_no_redundant_tail(spark):
    # n=4, max=4, overlap=2: the single window already reaches the end —
    # no [2:4] suffix chunk
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    out = textstats.chunk_documents(df, max_tokens=4, overlap=2).collect()
    assert len(out) == 1 and out[0]["chunk_text"] == "a b c d"


def test_chunk_documents_matches_twin(spark, docs_df):
    sample = docs_df.limit(120)
    got = {}
    for r in textstats.chunk_documents(sample, max_tokens=64, overlap=8).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_idx"]] = (r["chunk_text"], r["n_tokens"])
    for r in sample.select("doc_id", "text").collect():
        want = textfns.chunk_documents_py(r["text"], 64, overlap=8)
        have = got.get(r["doc_id"], {})
        assert len(have) == len(want), r["doc_id"]
        for k, text in enumerate(want):
            assert have[k][0] == text
            assert have[k][1] == len(textfns.tokens(text))


def test_chunk_documents_validates_params(spark, docs_df):
    with pytest.raises(ValueError, match="overlap"):
        textstats.chunk_documents(docs_df, max_tokens=4, overlap=4)
    with pytest.raises(ValueError, match="max_tokens"):
        textstats.chunk_documents(docs_df, max_tokens=0)


def test_chunk_documents_plan_is_narrow(spark, docs_df):
    # pure Catalyst 1→N: no shuffle, no Python in the plan
    plan = textstats.chunk_documents(docs_df, max_tokens=64)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "MapInPandas" not in plan


# ------------------------------------------------- trigram order


def test_train_lm_order3_hand_computed(spark):
    """Corpus "a b c a b c": trigram table and 3-gram stupid-backoff
    scores pinned by hand; order=2 models stay trigram-free and score
    exactly as before."""
    import math

    df = spark.createDataFrame([(1, "a b c a b c")], "doc_id long, text string")
    m3 = lm.train_lm(df, top_k=10, max_bigrams=100, order=3)
    assert m3.vocab == {"a": 2, "b": 2, "c": 2}
    assert m3.bigrams == {"a b": 2, "b c": 2, "c a": 1}
    assert m3.trigrams == {"a b c": 2, "b c a": 1, "c a b": 1}

    # score "a b c a" by hand:
    # pos1 "a": uni = (2+1)/(6+4)           (no alpha, no context)
    # pos2 "b": bigram a b → 2/2            (second token: plain bigram)
    # pos3 "c": trigram "a b c"=2 / bigram "a b"=2 → 1
    # pos4 "a": trigram "b c a"=1 / bigram "b c"=2 → 0.5
    n, logp, ppl = textfns.score_tokens_py(["a", "b", "c", "a"], m3)
    want = math.log(3 / 10) + math.log(2 / 2) + math.log(2 / 2) + math.log(1 / 2)
    assert n == 4 and logp == pytest.approx(want, abs=1e-12)
    assert ppl == pytest.approx(math.exp(-want / 4), rel=1e-12)

    # trigram miss backs off with ONE alpha onto the bigram score:
    # "c a b": tri "c a b"=1, bigram ctx "c a"=1 → 1/1; then "b a" after:
    # tri "a b a" absent → alpha * S(a | b) = alpha * (bigram "b a" absent
    # → alpha * uni(a)) = alpha^2 * (2+1)/10
    n2, logp2, _ = textfns.score_tokens_py(["c", "a", "b", "a"], m3)
    want2 = (
        math.log(3 / 10)          # "c": uni (c count 2 → (2+1)/10)... see below
        + math.log(1 / 2)         # "a": bigram "c a"=1 / c(c)=2
        + math.log(1 / 1)         # "b": trigram "c a b"=1 / bigram "c a"=1
        + math.log(m3.alpha * m3.alpha * (3 / 10))  # "a": double backoff
    )
    assert logp2 == pytest.approx(want2, abs=1e-12)

    # order=2 on the same corpus: no trigram table, old math untouched
    m2 = lm.train_lm(df, top_k=10, max_bigrams=100)
    assert m2.trigrams == {}
    n3, logp3, _ = textfns.score_tokens_py(["a", "b", "c", "a"], m2)
    want3 = math.log(3 / 10) + math.log(2 / 2) + math.log(2 / 2) + math.log(1 / 2)
    assert logp3 == pytest.approx(want3, abs=1e-12)

    with pytest.raises(ValueError):
        lm.train_lm(df, order=4)


def test_lm_trigram_json_roundtrip_and_backward_compat(spark):
    import json

    df = spark.createDataFrame([(1, "a b c a b c")], "doc_id long, text string")
    m3 = lm.train_lm(df, top_k=10, max_bigrams=100, order=3)
    back = lm.LocalLM.from_json(m3.to_json())
    assert back == m3 and back.trigrams == m3.trigrams
    # a pre-trigram model file (no "trigrams" key) still loads
    d = json.loads(m3.to_json())
    del d["trigrams"]
    old = lm.LocalLM.from_json(json.dumps(d))
    assert old.trigrams == {} and old.vocab == m3.vocab


def test_order3_scores_corpus_and_separates(spark, docs_df):
    """Trigram model on the corpus: finite perplexities everywhere, and
    in-domain text still scores far below shuffled gibberish."""
    sample = docs_df.limit(60)
    m3 = lm.train_lm(sample, top_k=2000, max_bigrams=20000, order=3, max_trigrams=20000)
    assert m3.trigrams
    scored = lm.with_perplexity(sample, m3).select("ppl").collect()
    ppls = [r["ppl"] for r in scored]
    assert all(p is not None and p > 0 for p in ppls)
    row = sample.select("text").first()
    toks = textfns.tokens(row["text"])
    fluent = textfns.score_tokens_py(toks, m3)[2]
    shuffled = textfns.score_tokens_py(list(reversed(toks)), m3)[2]
    assert fluent < shuffled


def test_with_perplexity_is_map_only(spark, docs_df, tiny_lm):
    # no join-back: one Arrow pass, no Exchange — the shape that lifts
    # to streaming (no .limit here: limit itself plans an Exchange
    # SinglePartition and would mask the property under test)
    plan = (
        lm.with_perplexity(docs_df, tiny_lm)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
    assert plan.count("MapInPandas") == 1
