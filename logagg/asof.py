"""As-of (most-recent-prior) join — the standard telemetry/point-in-time
operator Spark lacks natively.

Distributed formulation: union both sides tagged, one range-partitioned
sort per key on (ts, side), carry the right side's values forward with
``last(..., ignorenulls)`` over the running window, keep left rows. One
shuffle, no per-key Python, no row explosion — equivalent to DuckDB/kdb
ASOF JOIN with inclusive (left.ts >= right.ts) semantics (right rows sort
before left rows at equal timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row: the latest right row with same ``key`` and
    ``right.ts <= left.ts``; its ``value_cols`` are appended (null when no
    prior right row exists). ``value_cols`` must not collide with left
    columns — rename on the right beforehand."""
    lt = left.withColumn("_is_left", F.lit(1))
    rt = right.select(key, ts, *value_cols).withColumn("_is_left", F.lit(0))
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the matched right ROW as one struct, then project its fields:
    # last(ignorenulls) over a per-column carry would skip a matched row
    # whose value is genuinely NULL and leak an older non-null value —
    # the struct is non-null for every right row, so NULL values from the
    # as-of-matched row are preserved (DuckDB/kdb ASOF semantics).
    carry = F.last(
        F.when(F.col("_is_left") == 0, F.struct(*[F.col(c) for c in value_cols])),
        ignorenulls=True,
    ).over(w)
    u = u.withColumn("_carry", carry)
    for c in value_cols:
        u = u.withColumn(c, F.col("_carry").getField(c))
    return u.filter(F.col("_is_left") == 1).drop("_is_left", "_carry")
