"""As-of join semantics vs a brute-force per-row oracle."""

from datetime import datetime, timedelta

from logagg.asof import asof_join


def test_asof_join_matches_bruteforce(spark):
    base = datetime(2024, 1, 1)
    left_rows = [
        (i, i % 5, base + timedelta(minutes=3 * i)) for i in range(60)
    ]
    right_rows = [
        (k, base + timedelta(minutes=m), 1000 + 10 * k + m)
        for k in range(4)  # key 4 has no right rows at all → null
        for m in (0, 7, 29, 100)
    ]
    left = spark.createDataFrame(left_rows, "event_id long, k long, ts timestamp")
    right = spark.createDataFrame(right_rows, "k long, ts timestamp, v long")
    got = {
        r["event_id"]: r["v"]
        for r in asof_join(left, right, key="k", ts="ts", value_cols=["v"]).collect()
    }
    for event_id, k, ts in left_rows:
        prior = [v for (rk, rts, v) in right_rows if rk == k and rts <= ts]
        expected = max(
            ((rts, v) for (rk, rts, v) in right_rows if rk == k and rts <= ts),
            default=(None, None),
        )[1]
        assert got[event_id] == expected, (event_id, k, ts, prior)


def test_asof_join_inclusive_at_equal_ts(spark):
    t = datetime(2024, 6, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, 7, t)], "event_id long, k long, ts timestamp")
    right = spark.createDataFrame([(7, t, 42)], "k long, ts timestamp, v long")
    row = asof_join(left, right, key="k", ts="ts", value_cols=["v"]).collect()[0]
    assert row["v"] == 42  # left.ts >= right.ts is inclusive
