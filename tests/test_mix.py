"""Mixture / training-order / blocklist operators (logagg.mix) vs their
pure-Python twins (logagg.textfns)."""

import math

import pytest
from pyspark.sql import functions as F

from logagg import mix, textfns

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


# ------------------------------------------------------------- mix_sources


def test_mix_uniform_matches_twin_bitwise(spark, docs):
    got = (
        docs.select("doc_id", mix.mix_uniform(F.col("doc_id"), "s1").alias("u"))
        .orderBy("doc_id")
        .collect()
    )
    assert len(got) == 500
    for r in got:
        assert r["u"] == textfns.mix_uniform_py("s1", r["doc_id"])  # bitwise ==


def test_mix_sources_matches_twin_and_epochs(spark, docs):
    weights = {"src0": 0.0, "src1": 1.0, "src2": 0.4, "src3": 2.5}
    out = (
        mix.mix_sources(docs, weights, seed="epoch-mix")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.max("mix_epoch").alias("max_e"))
        .collect()
    )
    got = {r["doc_id"]: (r["n"], r["max_e"]) for r in out}
    src = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    expected = {}
    for did, s in src.items():
        if s not in weights:
            continue
        c = textfns.mix_copies_py("epoch-mix", did, weights[s])
        if c > 0:
            expected[did] = (c, c - 1)
    assert got == expected
    # src0 weight 0 → gone entirely; sources not listed → gone
    assert all(src[d] in ("src1", "src2", "src3") for d in got)
    # src1 weight 1.0: frac = 0 → exactly one copy each, never a bonus roll
    ones = [d for d in got if src[d] == "src1"]
    assert ones and all(got[d] == (1, 0) for d in ones)
    # src3 weight 2.5: everyone has 2 or 3 copies
    assert all(got[d][0] in (2, 3) for d in got if src[d] == "src3")


def test_mix_sources_df_equals_dict_path(spark, docs):
    weights = {"src0": 0.7, "src1": 1.0, "src2": 0.4, "src3": 2.5}
    wdf = spark.createDataFrame(
        [(s, w) for s, w in weights.items()], "source string, weight double"
    )
    a = (
        mix.mix_sources(docs, weights, seed="df-vs-dict")
        .select("doc_id", "mix_epoch")
        .collect()
    )
    b = (
        mix.mix_sources_df(docs, wdf, seed="df-vs-dict")
        .select("doc_id", "mix_epoch")
        .collect()
    )
    key = lambda r: (r["doc_id"], r["mix_epoch"])  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))
    # non-broadcast path: identical rows, shuffle join instead
    c = (
        mix.mix_sources_df(docs, wdf, seed="df-vs-dict", broadcast_weights=False)
        .select("doc_id", "mix_epoch")
        .collect()
    )
    assert sorted(map(key, a)) == sorted(map(key, c))


def test_mix_sources_rejects_bad_weight(docs):
    with pytest.raises(ValueError):
        mix.mix_sources(docs, {"src0": -0.1})
    with pytest.raises(ValueError):
        mix.mix_sources(docs, {"src0": float("nan")})


def test_mix_determinism_and_seed_independence(spark, docs):
    w = {"src4": 0.5}
    a = sorted(r["doc_id"] for r in mix.mix_sources(docs, w, seed="A").collect())
    a2 = sorted(r["doc_id"] for r in mix.mix_sources(docs, w, seed="A").collect())
    b = sorted(r["doc_id"] for r in mix.mix_sources(docs, w, seed="B").collect())
    assert a == a2  # same seed → same sample, any run
    assert a != b  # different seed → different sample (25 docs at p=.5)


def test_temperature_weights_flatten(spark, docs):
    # skew the corpus: drop most of src0 so sources differ in size
    skewed = docs.filter((F.col("source") != "src0") | (F.col("doc_id") < 12))
    w1 = mix.temperature_weights(skewed, alpha=1.0)
    wf = mix.temperature_weights(skewed, alpha=0.5)
    # alpha=1 → natural distribution → every rate 1.0 (budget = input size)
    assert all(abs(v - 1.0) < 1e-12 for v in w1.values())
    # alpha<1 boosts the small source relative to the big ones
    assert wf["src0"] > 1.0 > wf["src1"]
    # expected mixture size == budget (= input size) by construction
    n = skewed.count()
    assert abs(mix.expected_mixture_size(skewed, wf) - n) < 1e-6
    # explicit budget rescales linearly
    wh = mix.temperature_weights(skewed, alpha=0.5, target_total=2 * n)
    for s in wf:
        assert wh[s] == pytest.approx(2 * wf[s])


# --------------------------------------------------------- training_order


def test_training_order_is_global_hash_order(spark, docs):
    out = mix.training_order(docs, seed="o1", num_partitions=4)
    rows = out.select(
        F.spark_partition_id().alias("pid"), "order_key", "doc_id"
    ).collect()
    # within the collected order: partition ids non-decreasing = range
    # partitions come back in key order, and keys sorted within each
    keys = [(r["order_key"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
    pids = [r["pid"] for r in rows]
    assert pids == sorted(pids) and len(set(pids)) > 1
    # the key matches the twin and the order is the twin's order
    expected = sorted(
        (textfns.order_key_py("o1", 0, r["doc_id"]), r["doc_id"])
        for r in docs.select("doc_id").collect()
    )
    assert keys == expected


def test_training_order_plan_has_no_single_partition_sort(spark, docs):
    # the global order must come from range partitioning + per-partition
    # sort — never a sort funneled through one partition
    plan = (
        mix.training_order(docs, num_partitions=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" in plan


def test_training_order_epochs_interleave(spark, docs):
    mixed = mix.mix_sources(docs, {s: 2.0 for s in ("src0", "src1")}, seed="m")
    out = mix.training_order(
        mixed, seed="o2", epoch_col="mix_epoch", num_partitions=2
    )
    rows = out.select("doc_id", "mix_epoch", "order_key").collect()
    assert len(rows) == 100  # 50 docs × 2 epochs, weight 2.0 exact
    for r in rows:
        assert r["order_key"] == textfns.order_key_py("o2", r["mix_epoch"], r["doc_id"])
    # copies of the same doc do NOT all sit adjacent: with 50 docs × 2
    # independent hash positions, far fewer than half the consecutive
    # pairs may be same-doc (adjacent-clustered repeats would be 50/99)
    ids = [r["doc_id"] for r in rows]
    adjacent_same = sum(1 for i in range(len(ids) - 1) if ids[i] == ids[i + 1])
    assert adjacent_same < 10
    # different epochs of one doc land at independent positions: the two
    # keys differ for every doc
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["order_key"])
    assert all(len(ks) == 2 for ks in by_doc.values())


# ------------------------------------------------------- filter_blocklist


def test_host_suffixes_matches_twin(spark):
    hosts = ["a.b.co", "co", "x.y", None, "spam.ads.example.org"]
    df = spark.createDataFrame([(h,) for h in hosts], "h string")
    got = {
        r["h"]: r["s"]
        for r in df.select("h", mix.host_suffixes(F.col("h")).alias("s")).collect()
    }
    for h in hosts:
        assert got[h] == textfns.host_suffixes_py(h)


def test_filter_blocklist_subdomains_and_junk(spark):
    rows = [
        ("http://evil.com/a", "drop"),  # exact
        ("https://ads.evil.com/b?x=1", "drop"),  # subdomain
        ("http://EVIL.com/caps", "drop"),  # case-insensitive host
        ("http://notevil.com/c", "keep"),  # suffix must align on a label
        ("http://good.org/d", "keep"),
        ("http://tracker.net/e", "drop"),
        ("::not a url::", "keep"),  # unparseable host → kept
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    kept = mix.filter_blocklist(df, ["evil.com", "Tracker.NET"], url_col="url")
    got = sorted(r["url"] for r in kept.collect())
    assert got == sorted(u for u, v in rows if v == "keep")
    # blocklist as a DataFrame behaves identically
    bdf = df.sparkSession.createDataFrame([("evil.com",), ("tracker.net",)], "d string")
    got2 = sorted(r["url"] for r in mix.filter_blocklist(df, bdf, url_col="url").collect())
    assert got2 == got


def test_filter_blocklist_plan_is_hash_join(spark):
    df = spark.createDataFrame([("http://a.b/x",)], "url string")
    plan = mix.filter_blocklist(df, ["b"], url_col="url")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------- curate integration


def test_curate_blocklist_stage(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the bank of a river", "http://ok.com/1"),
            (2, "the quick brown fox jumps over the lazy dog near the bank of a river", "http://spam.bad.io/2"),
            (3, "a completely different document about the history of a small town and of its people", "http://bad.io/3"),
        ],
        "doc_id long, text string, url string",
    )
    from logagg.curate import curate

    res = curate(
        df,
        url_col="url",
        blocklist=["bad.io"],
        exact_dedup=True,
    )
    stages = [m["stage"] for m in res.manifest]
    assert stages == ["blocklist", "exact_dedup"]
    assert res.manifest[0] == {"stage": "blocklist", "rows_in": 3, "rows_out": 1}
    assert [r["doc_id"] for r in res.docs.collect()] == [1]
    res.unpersist()


def test_curate_blocklist_requires_url_col(spark, docs):
    from logagg.curate import curate

    with pytest.raises(ValueError):
        curate(docs, blocklist=["x.com"])


def test_expected_mixture_size_math(spark, docs):
    # 25 docs per source; weights sum over listed sources only
    val = mix.expected_mixture_size(docs, {"src0": 2.0, "src1": 0.2, "nosuch": 9.9})
    assert val == pytest.approx(25 * 2.0 + 25 * 0.2)
    assert math.isfinite(val)


def test_write_training_shards(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    manifest = mix.write_training_shards(
        docs, out, rows_per_shard=15, seed="sh1"
    )
    n = docs.count()
    assert sum(m["n_rows"] for m in manifest) == n
    assert len(manifest) == -(-n // 15)
    # shard key ranges are disjoint and ordered — a loader streaming
    # shard 0, 1, 2... reads the exact global training order
    for a, b in zip(manifest, manifest[1:]):
        assert a["key_max"] < b["key_min"]
        assert b["shard"] == a["shard"] + 1
    # re-read in shard order reproduces the twin's global order
    back = []
    for m in manifest:
        rows = spark.read.parquet(f"{out}/shard={m['shard']}").collect()
        part = sorted((r["order_key"], r["doc_id"]) for r in rows)
        assert len(part) == m["n_rows"]
        back.extend(part)
    expected = sorted(
        (textfns.order_key_py("sh1", 0, r["doc_id"]), r["doc_id"])
        for r in docs.select("doc_id").collect()
    )
    assert back == expected
    # manifest landed next to the data
    import json

    with open(f"{out}/manifest.json") as fh:
        assert json.load(fh) == manifest


def test_write_training_shards_deterministic(spark, docs, tmp_path):
    a = mix.write_training_shards(docs, str(tmp_path / "a"), rows_per_shard=20)
    b = mix.write_training_shards(
        docs.repartition(5), str(tmp_path / "b"), rows_per_shard=20
    )
    # same corpus, any input partitioning → same shard boundaries
    assert a == b


# ------------------------------------------------------- weighted_sample


def test_weighted_sample_matches_twin_exactly(spark, docs):
    """A-ES over the corpus with quality-ish weights: selected ids (and
    their order keys) identical to the Python twin, including the
    exclusion of null / zero / negative / non-finite weights."""
    # deterministic synthetic weights incl. every exclusion class
    weighted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, F.lit(None))
        .when(F.col("doc_id") % 11 == 1, F.lit(0.0))
        .when(F.col("doc_id") % 11 == 2, F.lit(-2.0))
        .when(F.col("doc_id") % 11 == 3, F.lit(float("nan")))
        .when(F.col("doc_id") % 11 == 4, F.lit(float("inf")))
        .otherwise((F.col("doc_id") % 7 + 1).cast("double"))
        .alias("w"),
    )
    got = [
        r["doc_id"]
        for r in mix.weighted_sample(
            weighted, "w", 50, id_col="doc_id", seed="s-wrs"
        ).collect()
    ]
    rows = [(r["doc_id"], r["w"]) for r in weighted.collect()]
    want = textfns.weighted_sample_py(rows, 50, seed="s-wrs")
    assert sorted(got) == sorted(want)


def test_weighted_sample_is_weight_sensitive_and_mergeable(spark, docs):
    """Doubling every weight changes nothing (scale-invariant rule), a
    heavily-upweighted minority dominates the sample, and the sample is
    exactly mergeable across disjoint halves."""
    base = docs.select("doc_id", (F.col("doc_id") % 7 + 1).cast("double").alias("w"))
    s1 = {r["doc_id"] for r in mix.weighted_sample(base, "w", 40).collect()}
    doubled = base.withColumn("w", F.col("w") * 2)
    # NOT scale-invariant row-for-row (key = ln(u)/w scales), but the
    # heavy-weight skew must show: weight 10^6 on doc_id < 30 → those
    # dominate a k=25 sample
    skewed = docs.select(
        "doc_id",
        F.when(F.col("doc_id") < 30, 1e6).otherwise(1e-6).alias("w"),
    )
    top = {r["doc_id"] for r in mix.weighted_sample(skewed, "w", 25).collect()}
    assert all(d < 30 for d in top)

    # mergeability: top-k(A ∪ B) == top-k(top-k(A) ∪ top-k(B))
    a = base.filter(F.col("doc_id") % 2 == 0)
    b = base.filter(F.col("doc_id") % 2 == 1)
    whole = {r["doc_id"] for r in mix.weighted_sample(base, "w", 30).collect()}
    pa = mix.weighted_sample(a, "w", 30, key_col="k")
    pb = mix.weighted_sample(b, "w", 30, key_col="k")
    merged = {
        r["doc_id"]
        for r in pa.unionByName(pb)
        .orderBy(F.col("k").desc(), "doc_id")
        .limit(30)
        .collect()
    }
    assert merged == whole
    # doubled weights still produce a valid 40-sample (sanity for the
    # scaled frame built above)
    assert len({r["doc_id"] for r in mix.weighted_sample(doubled, "w", 40).collect()}) == 40
    assert len(s1) == 40


def test_weighted_sample_plan_is_take_ordered(spark, docs):
    base = docs.select("doc_id", F.lit(1.0).alias("w"))
    plan = (
        mix.weighted_sample(base, "w", 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    with pytest.raises(ValueError):
        mix.weighted_sample(base, "w", 0)


# ------------------------------------------------------ curriculum_order


def test_curriculum_order_stages_and_reproducibility(spark, docs):
    """Stages are monotone in score (band b's max <= band b+1's min up to
    boundary ties), within-band order is the md5 shuffle, the whole
    layout is partitioning-invariant, and descending flips the ramp."""
    from pyspark.sql import functions as F

    from logagg import mix as m

    scored = docs.select(
        "doc_id", F.length("text").cast("double").alias("score")
    )
    out = m.curriculum_order(scored, "score", n_stages=4, id_col="doc_id")
    rows = out.select("doc_id", "score", "stage", "order_key").collect()
    # reconstruct the global order: partition ranges are ordered, so a
    # full collect-then-sort by (stage, key, id) equals the layout order
    by_stage = {}
    for r in rows:
        by_stage.setdefault(r["stage"], []).append(r["score"])
    stages = sorted(by_stage)
    assert len(stages) >= 3  # dup boundaries may merge bands, not vanish
    for a, b in zip(stages, stages[1:]):
        assert max(by_stage[a]) <= min(by_stage[b])
    # within-band key is the pinned md5(seed:id)
    import hashlib

    for r in rows[:20]:
        assert (
            r["order_key"]
            == hashlib.md5(f"curriculum:{r['doc_id']}".encode()).hexdigest()
        )

    # partitioning-invariance: same corpus, different input layout →
    # identical (stage, key) assignment for every doc
    again = m.curriculum_order(
        scored.repartition(13), "score", n_stages=4, id_col="doc_id"
    )
    a = {(r["doc_id"], r["stage"]) for r in rows}
    b = {(r["doc_id"], r["stage"]) for r in again.select("doc_id", "stage").collect()}
    assert a == b

    desc = m.curriculum_order(
        scored, "score", n_stages=4, ascending=False, id_col="doc_id"
    )
    d = {r["doc_id"]: r["stage"] for r in desc.select("doc_id", "stage").collect()}
    asc = {r["doc_id"]: r["stage"] for r in rows}
    hi = max(asc.values())
    assert all(d[i] == hi - s for i, s in asc.items())

    import pytest

    with pytest.raises(ValueError):
        m.curriculum_order(scored, "score", n_stages=1)


def test_weighted_sample_per_group_equals_global_per_group(spark, docs):
    """Per-group stratified A-ES: each group's pick == the global
    weighted_sample applied to that group alone, exactly k (or all) rows
    per group, same exclusion rule."""
    base = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") % 7 + 1).cast("double").alias("w"),
    )
    out = mix.weighted_sample_per_group(base, "source", "w", 5, id_col="doc_id")
    got = {}
    for r in out.collect():
        got.setdefault(r["source"], set()).add(r["doc_id"])
    sources = [r["source"] for r in base.select("source").distinct().collect()]
    assert set(got) == set(sources)
    for s in sources:
        grp = base.filter(F.col("source") == s)
        want = {
            r["doc_id"] for r in mix.weighted_sample(grp, "w", 5, id_col="doc_id").collect()
        }
        assert got[s] == want
        assert len(got[s]) == min(5, grp.count())
    # group smaller than k: all rows survive
    tiny = base.filter(F.col("doc_id") < 3)
    assert mix.weighted_sample_per_group(tiny, "source", "w", 50).count() == 3
