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
    for c in value_cols:
        u = u.withColumn(
            c,
            F.last(F.when(F.col("_is_left") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    return u.filter(F.col("_is_left") == 1).drop("_is_left")
