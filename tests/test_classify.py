"""fastText-style quality classifier (logagg/classify.py): featurization
math pinned by hand, behavior pinned by separation/AUC on a crafted
pos/neg corpus (L-BFGS coefficients are partitioning-sensitive in the
last ulps, so tests assert behavior, not weights)."""

import hashlib

import pytest

from pyspark.sql import functions as F

from logagg import classify, textfns

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _gibberish(i: int, n_tok: int = 60) -> str:
    # deterministic junk: hex fragments, no English structure
    out = []
    for k in range(n_tok):
        out.append(hashlib.md5(f"{i}:{k}".encode()).hexdigest()[: 6 + (k % 5)])
    return " ".join(out)


@pytest.fixture(scope="module")
def model(spark, docs_df):
    pos = docs_df.limit(120).select("text")
    neg = spark.createDataFrame(
        [(_gibberish(i),) for i in range(120)], "text string"
    )
    return classify.train_quality_classifier(
        pos, neg, num_features=1 << 14, max_iter=30
    )


def test_word_bigram_features(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "x"), (3, "")], "doc_id long, text string")
    rows = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", classify._word_bigram_col(F.col("text")).alias("t")
        ).collect()
    }
    assert rows[1] == ["a", "b", "c", "a b", "b c"]
    assert rows[2] == ["x"]
    assert rows[3] == []


def test_featurize_is_fixed_width_sparse(spark):
    df = spark.createDataFrame([(1, "hello world hello")], "doc_id long, text string")
    v = classify.featurize(df, num_features=1 << 10).collect()[0]["features"]
    assert v.size == 1 << 10
    # 'hello' hashed twice → one bucket carries 2.0
    assert sorted(v.values, reverse=True)[0] == 2.0


def test_classifier_separates_held_out(spark, docs_df, model):
    held_pos = docs_df.orderBy(F.desc("doc_id")).limit(100).select("doc_id", "text")
    held_neg = spark.createDataFrame(
        [(10_000 + i, _gibberish(1000 + i)) for i in range(100)],
        "doc_id long, text string",
    )
    pos_scores = [
        r["quality_prob"] for r in classify.score_quality(held_pos, model).collect()
    ]
    neg_scores = [
        r["quality_prob"] for r in classify.score_quality(held_neg, model).collect()
    ]
    # AUC by rank comparison (exact, no sklearn)
    wins = sum(1 for p in pos_scores for n in neg_scores if p > n)
    auc = wins / (len(pos_scores) * len(neg_scores))
    assert auc > 0.95, auc
    assert sum(pos_scores) / len(pos_scores) > 0.8
    assert sum(neg_scores) / len(neg_scores) < 0.2


def test_with_quality_prob_preserves_rows_and_id_type(spark, docs_df, model):
    sample = docs_df.limit(30)
    out = classify.with_quality_prob(sample, model)
    assert out.count() == 30
    assert dict(out.dtypes)["doc_id"] == dict(sample.dtypes)["doc_id"]
    assert out.filter(F.col("quality_prob").isNull()).count() == 0


def test_model_save_load_roundtrip(spark, docs_df, model, tmp_path):
    from pyspark.ml.classification import LogisticRegressionModel

    path = str(tmp_path / "qmodel")
    model.save(path)
    back = LogisticRegressionModel.load(path)
    sample = docs_df.limit(20)
    a = {r["id"]: r["quality_prob"] for r in classify.score_quality(sample, model).collect()}
    b = {r["id"]: r["quality_prob"] for r in classify.score_quality(sample, back).collect()}
    assert a == b  # scoring is exact given the same coefficients


def test_scoring_plan_is_map_only(spark, docs_df, model):
    plan = (
        classify.score_quality(docs_df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_tokens_match_pinned_contract(spark):
    # featurization rides the same ASCII-whitespace token contract as the
    # rest of the repo
    text = "a\x0bb c"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    terms = df.select(classify._word_bigram_col(F.col("text")).alias("t")).collect()[0]["t"]
    toks = textfns.tokens(text)
    assert terms[: len(toks)] == toks


def test_curate_classifier_stage(spark, docs_df, model):
    from logagg import curate

    good = docs_df.limit(10).select("doc_id", "text")
    bad = spark.createDataFrame(
        [(900 + i, _gibberish(500 + i)) for i in range(5)],
        "doc_id long, text string",
    )
    df = good.unionByName(bad)
    res = curate.curate(
        df, quality_model=model, quality_prob_min=0.5, exact_dedup=False
    )
    assert [m["stage"] for m in res.manifest] == ["classifier_filter"]
    ids = {r["doc_id"] for r in res.docs.select("doc_id").collect()}
    assert ids == {r["doc_id"] for r in good.collect()}
    res.unpersist()


def test_curate_classifier_requires_min(spark, docs_df, model):
    from logagg import curate

    with pytest.raises(ValueError, match="quality_prob_min"):
        curate.curate(docs_df, quality_model=model)
