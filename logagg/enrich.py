"""Enrichment stage — broadcast hash joins against small lookup tables.

The reference's only "join" is stamping node metadata derived from the file
name (aggregator/convert.py:108,117); the north-star generalizes this to
lookup enrichment: host→geo and lang→locale, as left broadcast joins so
rows with unknown hosts are preserved with null geo.

Scale posture: both lookups are tiny (≤ thousands of rows) — ``F.broadcast``
pins the plan to BroadcastHashJoin, so enrichment adds zero shuffles
regardless of fact-side size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_lookups(spark: SparkSession, cache_dir) -> tuple[DataFrame, DataFrame]:
    host_geo = spark.read.parquet(str(cache_dir / "host_geo.parquet"))
    lang_locale = spark.read.parquet(str(cache_dir / "lang_locale.parquet"))
    return host_geo, lang_locale


def enrich(parsed: DataFrame, host_geo: DataFrame, lang_locale: DataFrame) -> DataFrame:
    """Left broadcast-join geo and locale onto parsed records (null-preserving)."""
    return parsed.join(F.broadcast(host_geo), on="host", how="left").join(
        F.broadcast(lang_locale), on="lang", how="left"
    )
