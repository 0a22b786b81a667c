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
