"""DSIR importance resampling: twin parity, selection behavior, plan shape."""

import random

from pyspark.sql import functions as F

from logagg import dsir
from logagg.textfns import dsir_logw_py, gumbel_py, hashed_ngrams_py


def _corpora():
    rng = random.Random(3)
    spark_words = "spark shuffle partition executor dataframe catalyst".split()
    cook_words = "flour butter oven sugar recipe whisk dough".split()

    def doc(words, n):
        return " ".join(rng.choice(words) for _ in range(n))

    target = [doc(spark_words, 30) for _ in range(20)]
    raw = (
        [(f"s{i:02d}", doc(spark_words, 25)) for i in range(15)]
        + [(f"c{i:02d}", doc(cook_words, 25)) for i in range(45)]
    )
    rng.shuffle(raw)
    return raw, target


def test_dsir_select_matches_twin_bitwise(spark):
    raw, target = _corpora()
    raw_df = spark.createDataFrame(raw, "doc_id string, text string").repartition(5)
    tgt_df = spark.createDataFrame([(t,) for t in target], "text string")
    got = [
        (r["doc_id"], r["logw"], r["key"])
        for r in dsir.dsir_select(raw_df, tgt_df, k=12, buckets=512).collect()
    ]
    want = dsir.dsir_select_py(raw, target, k=12, buckets=512)
    assert got == want  # ids, log-weights AND gumbel keys, bit-for-bit


def test_dsir_prefers_target_like_docs(spark):
    raw, target = _corpora()
    raw_df = spark.createDataFrame(raw, "doc_id string, text string")
    tgt_df = spark.createDataFrame([(t,) for t in target], "text string")
    picked = {
        r["doc_id"] for r in dsir.dsir_select(raw_df, tgt_df, k=15, buckets=512).collect()
    }
    # 15 spark-like docs among 60; selection should be dominated by them
    assert sum(1 for i in picked if i.startswith("s")) >= 12


def test_fit_log_probs_bounded_and_exact(spark):
    docs = spark.createDataFrame([("a b a",), ("b c",)], "text string")
    vec = dsir.fit_log_probs(docs, buckets=32)
    assert len(vec) == 32
    # exact twin: same counts -> same doubles
    from collections import Counter

    acc = Counter()
    for t in ("a b a", "b c"):
        acc.update(hashed_ngrams_py(t, 32))
    import numpy as np

    assert (vec == dsir.fit_probs_py(dict(acc), 32)).all()
    # probs sum to 1
    assert abs(np.exp(vec).sum() - 1.0) < 1e-12


def test_with_importance_is_map_only(spark):
    import numpy as np

    docs = spark.createDataFrame([("d1", "a b"), ("d2", "c d")], "doc_id string, text string")
    scored = dsir.with_importance(docs, np.zeros(16), seed="s")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # broadcast model + one Arrow pass, zero shuffles
    assert scored.columns == ["doc_id", "text", "logw", "key"]
    rows = {r["doc_id"]: r for r in scored.collect()}
    assert rows["d1"]["logw"] == 0.0
    assert rows["d1"]["key"] == gumbel_py("s", "d1")


def test_dsir_kernels_null_and_validation(spark):
    assert hashed_ngrams_py(None, 8) == []
    assert dsir_logw_py([], [0.5]) == 0.0
    import pytest

    docs = spark.createDataFrame([("d1", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        dsir.dsir_select(docs, docs, k=0)
