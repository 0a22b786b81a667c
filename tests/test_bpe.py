"""BPE tokenizer training + corpus encoding (logagg/bpe.py).

The per-word merge kernel is single-sourced in textfns.bpe_word_py, so the
crafted cases here hand-trace a full training run and pin every merge,
vocab id, and encoded id stream; the corpus-wide checks prove the Spark
encoder bit-identical to a driver loop and the decode round-trip exact."""

import re
from collections import Counter

import pytest

from logagg import bpe, textfns
from logagg.textstats import BPE_SPLIT_RE

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


# ------------------------------------------------- training (hand-traced)


def test_learn_bpe_hand_traced():
    # corpus "aa aa ab" → pre-tokens "aa", " aa", " ab" (freq 1 each)
    # pair counts: (a,a)=2, (' ',a)=2, (a,b)=1 → tie at 2 breaks to the
    # lexicographically smallest pair (' ','a'); after that merge every
    # remaining pair has count 1 < min_pair_count=2 → stop
    wc = {"aa": 1, " aa": 1, " ab": 1}
    model = bpe.learn_bpe_from_counts(wc, n_merges=10, min_pair_count=2)
    assert model.merges == [(" ", "a")]
    # vocab: chars in code-point order, then merge outputs
    assert model.vocab == {" ": 0, "a": 1, "b": 2, " a": 3}


def test_learn_bpe_second_round_tie_break():
    wc = {"aa": 1, " aa": 1, " ab": 1}
    model = bpe.learn_bpe_from_counts(wc, n_merges=2, min_pair_count=1)
    # round 2: (a,a), (' a',a), (' a',b) all count 1 → smallest is
    # (' a','a')  (' a' < 'a' because space sorts first)
    assert model.merges == [(" ", "a"), (" a", "a")]
    assert model.vocab[" aa"] == 4


def test_learn_bpe_merged_symbol_can_merge_again():
    # 'abab' x3: (a,b)=6 wins; then (ab,ab)=3 wins — the inverted-index
    # update must see pairs OF merged symbols
    model = bpe.learn_bpe_from_counts({"abab": 3}, n_merges=5, min_pair_count=2)
    assert model.merges[:2] == [("a", "b"), ("ab", "ab")]


def test_train_bpe_word_counts_match_counter(spark, docs_df):
    sample = docs_df.limit(40)
    wc_rows = bpe.word_counts(sample).collect()
    got = {r["word"]: r["n"] for r in wc_rows}
    want: Counter = Counter()
    pretok = re.compile(BPE_SPLIT_RE)
    for r in sample.select("text").collect():
        want.update(pretok.findall(r["text"]))
    assert got == dict(want)


def test_model_json_roundtrip():
    model = bpe.learn_bpe_from_counts({"abab": 3, " ab": 2}, n_merges=3)
    back = bpe.BPEModel.from_json(model.to_json())
    assert back == model
    assert back.ranks == model.ranks


# ------------------------------------------------- encoding


def test_bpe_word_kernel_merges_lowest_rank_first():
    ranks = {(" ", "a"): 0, (" a", "a"): 1, ("a", "b"): 2}
    assert textfns.bpe_word_py(" aa", ranks) == [" aa"]
    # (' ','a') has the lowest rank, so it fires FIRST and consumes the
    # 'a' — the ('a','b') merge never gets to form, and (' a','b') is
    # unranked: the result is NOT [' ab']
    assert textfns.bpe_word_py(" ab", ranks) == [" a", "b"]
    assert textfns.bpe_word_py("ab", ranks) == ["ab"]
    assert textfns.bpe_word_py("zz", ranks) == ["z", "z"]


def test_bpe_encode_hand_checked(spark):
    df = spark.createDataFrame([(1, "aa aa ab")], "doc_id long, text string")
    model = bpe.learn_bpe_from_counts({"aa": 1, " aa": 1, " ab": 1}, 10, min_pair_count=2)
    row = bpe.bpe_encode(df, model).collect()[0]
    # "aa" → [a, a] = [1, 1]; " aa" → [' a', a] = [3, 1]; " ab" → [' a', b] = [3, 2]
    assert row["ids"] == [1, 1, 3, 1, 3, 2]
    assert row["n_bpe_tokens"] == 6
    assert bpe.decode_ids(row["ids"], model) == "aa aa ab"


def test_bpe_encode_unknown_char(spark):
    df = spark.createDataFrame([(1, "aa qq")], "doc_id long, text string")
    model = bpe.learn_bpe_from_counts({"aa": 2}, 5)
    row = bpe.bpe_encode(df, model).collect()[0]
    assert bpe.BPE_UNK_ID in row["ids"]


def test_bpe_corpus_roundtrip_and_twin(spark, docs_df):
    sample = docs_df.limit(80)
    model = bpe.train_bpe(sample, n_merges=60)
    assert len(model.merges) > 10  # real merges learned on the corpus
    got = {r["id"]: (r["ids"], r["n_bpe_tokens"]) for r in bpe.bpe_encode(sample, model).collect()}
    ranks = model.ranks
    pretok = re.compile(BPE_SPLIT_RE)
    for r in sample.select("doc_id", "text").collect():
        ids = []
        for word in pretok.findall(r["text"]):
            ids.extend(model.vocab.get(s, bpe.BPE_UNK_ID) for s in textfns.bpe_word_py(word, ranks))
        g = got[str(r["doc_id"])]
        assert g[0] == ids and g[1] == len(ids), r["doc_id"]
        # every char of the training corpus is in the vocab → exact round-trip
        assert bpe.decode_ids(ids, model) == r["text"]


def test_merges_compress(spark, docs_df):
    sample = docs_df.limit(80)
    trained = bpe.train_bpe(sample, n_merges=60)
    baseline = bpe.BPEModel(merges=[], vocab=trained.vocab)
    import pyspark.sql.functions as F

    n_trained = bpe.bpe_encode(sample, trained).agg(F.sum("n_bpe_tokens")).collect()[0][0]
    n_chars = bpe.bpe_encode(sample, baseline).agg(F.sum("n_bpe_tokens")).collect()[0][0]
    assert n_trained < n_chars  # merges actually compress the corpus


def test_fertility_report(spark):
    """Per-source tokenizer diagnostics: in-vocab text has unk_frac 0 and
    driver-exact token/word sums; an out-of-alphabet source shows a
    nonzero unknown share."""
    from pyspark.sql import functions as F

    from logagg import bpe as bpemod

    train = spark.createDataFrame(
        [(str(i), "low lower lowest newer newest wider") for i in range(8)],
        "doc_id string, text string",
    )
    model = bpemod.train_bpe(train, 30)
    docs = spark.createDataFrame(
        [
            ("a1", "srcA", "low lower newest"),
            ("a2", "srcA", "wider low"),
            ("b1", "srcB", "Δ unseen ¤ glyphs"),  # chars outside the alphabet
        ],
        "doc_id string, source string, text string",
    )
    rep = {r["source"]: r for r in bpemod.fertility_report(docs, model).collect()}
    assert set(rep) == {"srcA", "srcB"}
    a = rep["srcA"]
    assert a["n_docs"] == 2 and a["n_words"] == 5
    # driver-exact token count via the shared per-word merge kernel
    pretok = re.compile(BPE_SPLIT_RE)
    want_tokens = sum(
        len(textfns.bpe_word_py(w, model.ranks))
        for text in ("low lower newest", "wider low")
        for w in pretok.findall(text)
    )
    assert a["n_tokens"] == want_tokens
    assert a["unk_frac"] == 0.0
    assert a["fertility"] >= 1.0 and a["bytes_per_token"] > 0
    b = rep["srcB"]
    assert b["unk_frac"] > 0
