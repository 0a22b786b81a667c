"""Misra-Gries heavy hitters: kernel algebra, exactness regimes, plan shape."""

import random

from pyspark.sql import functions as F

from logagg import aggregate
from logagg.refsketch import misra_gries_py, misra_gries_update_py


def test_mg_kernel_hand_case():
    # capacity 2, stream a a a b b c -> c's arrival truncates at the 3rd
    # largest (1): a:3->2, b:2->1, c dropped
    s = misra_gries_update_py({}, {"a": 3, "b": 2}, 2)
    assert s == {"a": 3, "b": 2}
    s = misra_gries_update_py(s, {"c": 1}, 2)
    assert s == {"a": 2, "b": 1}


def test_mg_kernel_error_bound():
    rng = random.Random(7)
    stream = [f"k{rng.randint(0, 40)}" for _ in range(5000)] + ["hot"] * 800
    rng.shuffle(stream)
    true = {}
    for x in stream:
        true[x] = true.get(x, 0) + 1
    for cap in (4, 16, 64):
        s = misra_gries_py(stream, cap)
        assert len(s) <= cap
        bound = len(stream) / (cap + 1)
        for key, est in s.items():
            assert true[key] - bound <= est <= true[key]
        if len(stream) // (cap + 1) < 800:
            assert "hot" in s  # guaranteed above the threshold


def test_heavy_hitters_exact_when_capacity_covers(spark):
    rows = [(f"h{i % 7}",) for i in range(200)] + [("h0",)] * 50
    df = spark.createDataFrame(rows, "host string")
    got = [(r["key"], r["cnt"]) for r in aggregate.heavy_hitters(df, "host", k=3, capacity=64).collect()]
    want = [
        (r["host"], r["cnt"])
        for r in df.groupBy("host")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("host"))
        .limit(3)
        .collect()
    ]
    assert got == want
    # capacity covers every distinct key -> even the one-pass lower bounds are exact
    got1 = [
        (r["key"], r["cnt"])
        for r in aggregate.heavy_hitters(
            df, "host", k=3, capacity=64, exact_counts=False
        ).collect()
    ]
    assert got1 == want


def test_heavy_hitters_exact_on_skew_with_tiny_capacity(spark):
    # Zipf-ish head over a 500-key tail; capacity 8 << 500 distinct keys.
    # The head frequencies are far above N/(capacity+1), so the two-pass
    # result must equal the exact top-k.
    rng = random.Random(11)
    rows = (
        [("top1",)] * 400
        + [("top2",)] * 300
        + [("top3",)] * 200
        + [(f"tail{rng.randint(0, 499)}",) for _ in range(600)]
    )
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "url string").repartition(8)
    got = [
        (r["key"], r["cnt"])
        for r in aggregate.heavy_hitters(df, "url", k=3, capacity=8).collect()
    ]
    assert got[:3] == [("top1", 400), ("top2", 300), ("top3", 200)]


def test_heavy_hitters_lower_bounds_one_pass(spark):
    rows = [("hot",)] * 900 + [(f"t{i}",) for i in range(300)]
    df = spark.createDataFrame(rows, "k string").repartition(4)
    got = {
        r["key"]: r["cnt"]
        for r in aggregate.heavy_hitters(
            df, "k", k=1, capacity=16, exact_counts=False
        ).collect()
    }
    n = len(rows)
    assert set(got) == {"hot"}
    assert 900 - n / 17 <= got["hot"] <= 900


def test_heavy_hitters_plan_shape(spark):
    df = spark.createDataFrame([("a",)], "host string")
    plan = aggregate.heavy_hitters(df, "host", k=2, capacity=4)._jdf.queryExecution().executedPlan().toString()
    # candidate recount joins via broadcast, never a shuffled join
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_heavy_hitters_nulls_and_validation(spark):
    import pytest

    df = spark.createDataFrame([("a",), (None,), ("a",)], "host string")
    got = [(r["key"], r["cnt"]) for r in aggregate.heavy_hitters(df, "host", k=5, capacity=4).collect()]
    assert got == [("a", 2)]
    with pytest.raises(ValueError):
        aggregate.heavy_hitters(df, "host", k=0)


# ------------------------------------------------------- Count-Min sketch


def test_countmin_build_matches_twin_and_overestimates(spark):
    import numpy as np

    from logagg.refsketch import countmin_build_py, countmin_query_py

    rng = random.Random(5)
    rows = [(f"k{rng.randint(0, 99)}",) for _ in range(3000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, "k string").repartition(6)
    mat = aggregate.count_min_build(df, "k", depth=4, width=512)
    true = {}
    for (x,) in rows:
        true[x] = true.get(x, 0) + 1
    # bit-identical to the single-machine twin (integer adds commute)
    assert (mat == countmin_build_py(true, 4, 512)).all()
    n = len(rows)
    for key, t in true.items():
        est = countmin_query_py(mat, key)
        assert t <= est <= t + 4 * n // 512 + 50  # one-sided, bounded error
    assert countmin_query_py(mat, "hot") == 500 or countmin_query_py(mat, "hot") > 500


def test_countmin_merge_equals_single_pass(spark):
    from logagg.refsketch import countmin_build_py

    a = {"x": 10, "y": 3}
    b = {"x": 5, "z": 7}
    merged = countmin_build_py(a, 3, 64) + countmin_build_py(b, 3, 64)
    whole = countmin_build_py({"x": 15, "y": 3, "z": 7}, 3, 64)
    assert (merged == whole).all()


def test_countmin_exact_when_wide(spark):
    from logagg.refsketch import countmin_query_py

    rows = [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string").repartition(3)
    mat = aggregate.count_min_build(df, "k", depth=4, width=4096)
    # width >> keys: collisions vanish, estimates are exact
    assert [countmin_query_py(mat, k) for k in "abc"] == [7, 3, 1]
    assert countmin_query_py(mat, "never-seen") == 0


# ------------------------------------------------- bottom-k coordinated sample


def test_bottomk_sample_mergeable_exactly(spark):
    rows = [(f"id{i:04d}", float(i)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id string, v double")
    a, b = df.filter("v < 250"), df.filter("v >= 250")

    def key(frame):
        return sorted((r["doc_id"], r["v"]) for r in frame.collect())

    whole = key(aggregate.bottomk_sample(df, "doc_id", 40))
    merged = key(
        aggregate.bottomk_sample(
            aggregate.bottomk_sample(a, "doc_id", 40).union(
                aggregate.bottomk_sample(b, "doc_id", 40)
            ),
            "doc_id",
            40,
        )
    )
    assert whole == merged and len(whole) == 40
    # coordination: the sample is a pure function of ids — the same ids win
    # regardless of payload
    relabeled = spark.createDataFrame(
        [(i, v * 100) for i, v in rows], "doc_id string, v double"
    )
    assert [i for i, _ in whole] == [
        i for i, _ in key(aggregate.bottomk_sample(relabeled, "doc_id", 40))
    ]


def test_bottomk_matches_hash_sample_ids(spark):
    from logagg.refsketch import hash_sample_ids_py

    rows = [(f"u{i}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, v long")
    got = {r["doc_id"] for r in aggregate.bottomk_sample(df, "doc_id", 10).collect()}
    assert got == set(hash_sample_ids_py([i for i, _ in rows], 10))


def test_sampled_quantiles_rank_error(spark):
    rows = [(f"id{i:05d}", float(i)) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id string, v double")
    for p, est in aggregate.sampled_quantiles(df, "v", "doc_id", k=400):
        assert abs(est / 2000.0 - p) < 0.12  # O(1/sqrt(k)) rank error
    # k >= n: the sample IS the population -> exact type-1 quantiles
    exact = aggregate.sampled_quantiles(
        df, "v", "doc_id", k=5000, probs=(0.5,)
    )
    assert exact == [(0.5, 999.0)]
    # empty input
    empty = df.filter("v < 0")
    assert aggregate.sampled_quantiles(empty, "v", "doc_id", k=10, probs=(0.5,)) == [
        (0.5, None)
    ]


def test_bottomk_overlap_estimates_and_twin(spark):
    """Coordinated-sample overlap: exact when the union fits in k,
    twin-identical always, within the O(1/sqrt(k)) band on a 10k-id
    overlap with known Jaccard, and duplicate-id-safe via the distinct
    guard."""
    import pytest

    from logagg import aggregate as agg
    from logagg import refsketch

    a_ids = [f"u{i}" for i in range(300)]
    b_ids = [f"u{i}" for i in range(200, 500)]  # |∩|=100, |∪|=500, J=0.2

    df_a = spark.createDataFrame([(i,) for i in a_ids], "id string")
    df_b = spark.createDataFrame([(i,) for i in b_ids], "id string")

    # k >= |union| → exact
    exact = agg.bottomk_overlap(df_a, df_b, "id", 1000)
    assert exact["k_used"] == 500
    assert exact["jaccard"] == 100 / 500
    assert exact["union"] == pytest.approx(500.0)
    assert exact["intersection"] == pytest.approx(100.0)

    # sketch regime: Spark == twin exactly, estimate near truth
    est = agg.bottomk_overlap(df_a, df_b, "id", 64)
    twin = refsketch.bottomk_overlap_py(a_ids, b_ids, 64)
    assert est == twin
    assert abs(est["jaccard"] - 0.2) < 3 / (64 ** 0.5)

    # duplicate ids on one side must not bias (distinct guard)
    df_a_dup = df_a.unionByName(df_a.limit(50))
    dup = agg.bottomk_overlap(df_a_dup, df_b, "id", 64)
    assert dup == est

    # larger corpus sanity: 10k/10k with J=1/3, k=512
    big_a = [f"d{i}" for i in range(10_000)]
    big_b = [f"d{i}" for i in range(5_000, 15_000)]
    big = refsketch.bottomk_overlap_py(big_a, big_b, 512)
    true_j = 5_000 / 15_000
    assert abs(big["jaccard"] - true_j) < 3 * (true_j * (1 - true_j) / 512) ** 0.5 + 0.02
    assert abs(big["union"] - 15_000) / 15_000 < 0.1

    # empty side
    empty = spark.createDataFrame([], "id string")
    z = agg.bottomk_overlap(df_a, empty, "id", 16)
    assert z["jaccard"] == 0.0 and z["intersection"] == 0.0 and z["n_b"] == 0
