"""Small shared utilities for operator lifecycle."""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_local(df: DataFrame) -> DataFrame:
    """Materialize a provably-small result through Arrow and rebuild it as a
    local DataFrame, cutting all lineage so upstream persisted intermediates
    can be released immediately (no cached RDDs outlive the operator call).

    Only for outputs bounded by design — duplicate-pair lists, top-k tables.
    At production scale the equivalent safe point is writing the result to a
    table (``materialize(..., mode="path")``); this is the in-session analog.
    """
    spark = df.sparkSession
    pdf = df.toPandas()
    return spark.createDataFrame(pdf, schema=df.schema)


def materialize(df: DataFrame, mode: str = "local", path: str | None = None) -> DataFrame:
    """Freeze an operator result, cutting lineage so upstream caches can be
    released and recompute-unstable expressions (monotonically_increasing_id)
    cannot be re-evaluated.

    mode="local"
        Arrow round-trip through the driver (:func:`materialize_local`).
        Only for results provably bounded by design; the oracle-scale
        default.
    mode="path"
        Write to parquet at ``path`` and read back — the 100 TB path: the
        result never visits the driver (a template-heavy crawl can yield a
        pair list of billions of rows that no driver holds), and downstream
        consumers (clustering, sinks, bench actions) read it like any other
        table. ``path`` must be executor-reachable storage on a real
        cluster (same contract as dup_clusters' checkpoint_dir).

    A "lazy" mode is deliberately NOT offered: the dedup operators release
    their persisted intermediates before returning, so a lazily-returned
    plan would silently recompute the whole upstream (double UDF passes) on
    first action — worse than either explicit mode.
    """
    if mode == "local":
        return materialize_local(df)
    if mode == "path":
        if not path:
            raise ValueError("materialize mode 'path' requires a target path")
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
    raise ValueError(f"unknown materialize mode {mode!r} (expected 'local' or 'path')")
