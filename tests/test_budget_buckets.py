"""Token-budget epoch planner (logagg.mix.token_budget_plan) and CCNet
perplexity bucketing (logagg.lm.ppl_buckets) vs their independent twins.

The planner's closed-form ratio-sorted water-fill and the twin's naive
iterative fixpoint are algorithmically distinct routes to the same unique
allocation; the bucket twin re-derives the coordinated sample, tercile
cuts, and assignment from scratch."""

import math
import random

import pytest
from pyspark.sql import functions as F

from logagg import lm, mix, textfns

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


# ------------------------------------------------- token_budget_plan


def test_budget_plan_uncapped_is_proportional():
    out = mix.token_budget_plan_counts(
        {"web": 900, "wiki": 100},
        target_tokens=1000,
        alpha=1.0,
        max_epochs={"web": 1.0, "wiki": 4.0},
    )
    got = {p["source"]: p for p in out["plan"]}
    assert got["web"]["alloc_tokens"] == pytest.approx(900.0)
    assert got["wiki"]["alloc_tokens"] == pytest.approx(100.0)
    assert got["web"]["epochs"] == pytest.approx(1.0)
    assert not got["web"]["capped"] and not got["wiki"]["capped"]
    assert out["unfilled_tokens"] == pytest.approx(0.0)


def test_budget_plan_waterfill_redistributes_capped_excess():
    # desired: web 990 / wiki 110 — web hits its 1-epoch cap at 900,
    # the 90-token excess water-fills onto wiki (cap 400 leaves room)
    out = mix.token_budget_plan_counts(
        {"web": 900, "wiki": 100},
        target_tokens=1100,
        alpha=1.0,
        max_epochs={"web": 1.0, "wiki": 4.0},
    )
    got = {p["source"]: p for p in out["plan"]}
    assert got["web"]["capped"] and got["web"]["alloc_tokens"] == pytest.approx(900.0)
    assert got["wiki"]["alloc_tokens"] == pytest.approx(200.0)
    assert got["wiki"]["epochs"] == pytest.approx(2.0)
    assert out["allocated_tokens"] == pytest.approx(1100.0)


def test_budget_plan_shortfall_when_caps_bind_everywhere():
    out = mix.token_budget_plan_counts(
        {"web": 900, "wiki": 100},
        target_tokens=2000,
        alpha=1.0,
        max_epochs={"web": 1.0, "wiki": 4.0},
    )
    assert out["allocated_tokens"] == pytest.approx(1300.0)  # 900·1 + 100·4
    assert out["unfilled_tokens"] == pytest.approx(700.0)
    assert all(p["epochs"] <= {"web": 1.0, "wiki": 4.0}[p["source"]] + 1e-9 for p in out["plan"])


def test_budget_plan_alpha_zero_is_uniform_over_sources():
    out = mix.token_budget_plan_counts(
        {"a": 1000, "b": 10}, target_tokens=600, alpha=0.0, max_epochs=100.0
    )
    got = {p["source"]: p["alloc_tokens"] for p in out["plan"]}
    assert got["a"] == pytest.approx(300.0)
    assert got["b"] == pytest.approx(300.0)


def test_budget_plan_zero_token_source_gets_nothing():
    out = mix.token_budget_plan_counts(
        {"a": 100, "empty": 0}, target_tokens=100, alpha=0.7, max_epochs=4.0
    )
    got = {p["source"]: p for p in out["plan"]}
    assert got["empty"]["alloc_tokens"] == 0.0 and got["empty"]["epochs"] == 0.0
    assert got["a"]["alloc_tokens"] == pytest.approx(100.0)


def test_budget_plan_matches_iterative_twin_fuzz():
    rng = random.Random(20260818)
    for trial in range(200):
        n_src = rng.randint(1, 8)
        counts = {f"s{i}": rng.randint(0, 10_000) for i in range(n_src)}
        target = rng.randint(0, 40_000)
        alpha = rng.choice([0.0, 0.3, 0.5, 0.7, 1.0, 1.5])
        if rng.random() < 0.5:
            caps = rng.choice([0.5, 1.0, 2.0, 4.0])
        else:
            caps = {s: rng.choice([0.0, 0.25, 1.0, 3.0, 10.0]) for s in counts}
        got = mix.token_budget_plan_counts(
            counts, target_tokens=target, alpha=alpha, max_epochs=caps
        )
        want = textfns.token_budget_plan_py(counts, target, alpha, caps)
        for g, w in zip(got["plan"], want["plan"]):
            assert g["source"] == w["source"]
            assert g["alloc_tokens"] == pytest.approx(w["alloc_tokens"], rel=1e-9, abs=1e-6), (
                trial, counts, target, alpha, caps)
        assert got["allocated_tokens"] == pytest.approx(
            want["allocated_tokens"], rel=1e-9, abs=1e-6)
        # invariants: caps respected, budget exactly spent (or capped out)
        cap_of = (lambda s: caps.get(s, 0.0)) if isinstance(caps, dict) else (lambda s: caps)
        for p in got["plan"]:
            assert p["alloc_tokens"] <= cap_of(p["source"]) * p["tokens"] + 1e-6
        assert got["allocated_tokens"] <= target + 1e-6
        spendable = min(target, sum(cap_of(s) * max(0, c) for s, c in counts.items()))
        assert got["allocated_tokens"] == pytest.approx(spendable, rel=1e-9, abs=1e-6)


def test_budget_plan_dataframe_wrapper_and_weights(spark, docs):
    with_tokens = docs.withColumn(
        "n_tokens", F.size(F.split(F.col("text"), r"\s+"))
    )
    counts = {
        r[0]: int(r[1])
        for r in with_tokens.groupBy("source").agg(F.sum("n_tokens")).collect()
    }
    target = sum(counts.values())  # one natural epoch total
    got = mix.token_budget_plan(
        with_tokens, target_tokens=target, alpha=0.5, max_epochs=4.0
    )
    want = mix.token_budget_plan_counts(
        counts, target_tokens=target, alpha=0.5, max_epochs=4.0
    )
    assert got == want
    w = mix.plan_weights(got)
    assert set(w) == set(counts)
    # realizable: expected mixture token mass equals the allocation
    expected_tokens = sum(w[s] * counts[s] for s in counts)
    assert expected_tokens == pytest.approx(got["allocated_tokens"], rel=1e-9)


def test_budget_plan_rejects_bad_inputs():
    with pytest.raises(ValueError):
        mix.token_budget_plan_counts({"a": 1}, target_tokens=-1)
    with pytest.raises(ValueError):
        mix.token_budget_plan_counts({"a": 1}, target_tokens=1, alpha=float("nan"))
    with pytest.raises(ValueError):
        mix.token_budget_plan_counts({"a": 1}, target_tokens=1, max_epochs=-2.0)


# ------------------------------------------------------ ppl_buckets


@pytest.fixture(scope="module")
def tiny_model(docs):
    return lm.train_lm(docs.limit(200), top_k=5000, max_bigrams=200_000)


def test_ppl_buckets_matches_twin_global(spark, docs, tiny_model):
    out = lm.ppl_buckets(docs, tiny_model, sample_k=64)
    rows = out.select("doc_id", "ppl", "ppl_bucket").collect()
    want = textfns.ppl_buckets_py(
        [(r["doc_id"], None, r["ppl"]) for r in rows], k=64
    )
    assert len(rows) == docs.count()
    for r in rows:
        assert r["ppl_bucket"] == want[str(r["doc_id"])], r["doc_id"]


def test_ppl_buckets_per_language_and_order(spark, docs, tiny_model):
    out = lm.ppl_buckets(docs, tiny_model, lang_col="lang", sample_k=4096)
    rows = out.select("doc_id", "lang", "ppl", "ppl_bucket").collect()
    want = textfns.ppl_buckets_py(
        [(r["doc_id"], r["lang"], r["ppl"]) for r in rows], k=4096
    )
    assert all(r["ppl_bucket"] == want[str(r["doc_id"])] for r in rows)
    # with the sample covering every doc, buckets are exact terciles:
    # within each language, head ppl <= middle ppl <= tail ppl
    by = {}
    for r in rows:
        if r["ppl"] is not None:
            by.setdefault((r["lang"], r["ppl_bucket"]), []).append(r["ppl"])
    for (lang, _b) in list(by):
        h, m, t = (by.get((lang, b), []) for b in ("head", "middle", "tail"))
        if h and m:
            assert max(h) <= min(m)
        if m and t:
            assert max(m) <= min(t)


def test_ppl_buckets_null_ppl_goes_to_tail(spark, docs, tiny_model):
    extra = docs.sparkSession.createDataFrame(
        [(999_999, "", "xx", "srcX", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = lm.ppl_buckets(docs.unionByName(extra), tiny_model, sample_k=32)
    r = out.filter(F.col("doc_id") == 999_999).collect()
    assert len(r) == 1 and r[0]["ppl"] is None and r[0]["ppl_bucket"] == "tail"


def test_ppl_buckets_carries_input_schema(spark, docs, tiny_model):
    out = lm.ppl_buckets(docs, tiny_model, sample_k=16)
    assert [f.name for f in out.schema.fields] == [
        f.name for f in docs.schema.fields
    ] + ["ppl", "ppl_bucket"]
