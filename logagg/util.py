"""Small shared utilities for operator lifecycle."""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_local(df: DataFrame) -> DataFrame:
    """Materialize a provably-small result through Arrow and rebuild it as a
    local DataFrame, cutting all lineage so upstream persisted intermediates
    can be released immediately (no cached RDDs outlive the operator call).

    Only for outputs bounded by design — duplicate-pair lists, top-k tables.
    At production scale the equivalent safe point is writing the result to a
    table (pipeline.py does exactly that); this is the in-session analog.
    """
    spark = df.sparkSession
    pdf = df.toPandas()
    return spark.createDataFrame(pdf, schema=df.schema)
