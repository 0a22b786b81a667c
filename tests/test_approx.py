"""Sketch aggregates: approx results must land within documented error of
exact answers computed on the same data."""

from pyspark.sql import functions as F


def test_approx_stats_within_tolerance(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    approx = {
        r["event_type"]: (r["approx_users"], r["value_quantiles"])
        for r in events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.95]).alias("value_quantiles"),
        )
        .collect()
    }
    exact = {
        r["event_type"]: (r["users"], r["p50"], r["p95"])
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, (users, quantiles) in approx.items():
        ex_users, p50, p95 = exact[et]
        assert abs(users - ex_users) <= max(2, 0.05 * ex_users)  # HLL ~2% rsd
        assert abs(quantiles[0] - p50) <= max(0.5, 0.1 * p50)
        assert abs(quantiles[1] - p95) <= max(0.5, 0.1 * p95)


def test_events_exact_stats_null_values_portable(spark, tmp_path):
    """The rank-quantile twin must stay engine-portable when `value` has
    NULLs: engines disagree on default NULL sort placement (Spark first,
    DuckDB last), so NULLs are excluded from ranking and n = count(value)
    on both sides — verified differentially on a corpus WITH nulls."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod

    pdf = pd.DataFrame(
        {
            "event_id": range(40),
            "user_id": [i % 7 for i in range(40)],
            "event_type": ["click" if i % 2 else "view" for i in range(40)],
            "ts": pd.Series([pd.Timestamp(2024, 1, 1)] * 40, dtype="datetime64[us]"),
            "value": [None if i % 5 == 0 else float(i) * 1.5 for i in range(40)],
        }
    )
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(sf_dir / "events.parquet"))

    got = {
        r["event_type"]: (r["n"], r["n_users"], r["q50"], r["q95"], r["q99"])
        for r in entrymod._events_exact_stats(spark, str(sf_dir)).collect()
    }
    con = duckdb.connect()
    con.register("events", pdf)
    sql = entrymod.oracle_sql()["events_exact_stats"]
    exp = {
        r[0]: tuple(r[1:])
        for r in con.execute(sql).fetchall()
    }
    assert got == exp
    # sanity: NULLs excluded — n is the non-null count, not the row count
    assert all(n < 20 for n, *_ in got.values())


def test_hll_sketch_rollup_merge_exact(spark):
    """Mergeable-sketch contract: unioning per-day partial HLL sketches up
    to per-type estimates equals sketching the raw data in ONE pass exactly
    (same registers, associative merge) — the property that lets a 100 TB
    pipeline store KB-sized partials and re-aggregate to any grain without
    recounting. Estimates also land within 5% of the exact distinct."""
    from logagg import aggregate
    from pyspark.sql import functions as F

    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    partials = aggregate.daily_user_sketches(events)
    assert partials.count() > 20  # real multi-day fan-out to merge
    merged = {
        r["event_type"]: r["approx_users"]
        for r in aggregate.merge_user_sketches(partials).collect()
    }
    single_pass = {
        r["event_type"]: r["approx"]
        for r in events.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx"))
        .collect()
    }
    assert merged == single_pass  # associativity: bit-identical registers
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for k, est in merged.items():
        assert abs(est - exact[k]) <= 0.05 * exact[k], (k, est, exact[k])
