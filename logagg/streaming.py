"""Structured Streaming variant of the pipeline.

The reference is strictly batch (one asyncio run, aggregator/main.py:147-151)
— this module is the engine's forward path for continuous ingestion: the
same vectorized parse stage (``mapInPandas`` is stateless, so it lifts to a
streaming DataFrame unchanged) feeding a watermarked windowed aggregate.

Sources: file-based (parquet dir) here — a Kafka source is the same code
with ``readStream.format("kafka")`` + a payload-decode select.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logagg import parse
from logagg.schemas import PAGES_SCHEMA


def stream_pages(spark: SparkSession, pages_dir: str, max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )


def streaming_sink_agg(pages_stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-sink aggregate over 1-hour event-time windows with late-data
    handling via watermark on ``warc_ts``."""
    parsed = parse.parsed_records(pages_stream)
    return (
        parsed.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", "1 hour").alias("win"),
            "host",
            "lang",
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.length("message")).alias("total_msg_chars"),
        )
        .select(
            F.col("win.start").alias("bucket"), "host", "lang", "n_rows", "total_msg_chars"
        )
    )


def run_stream_to_memory(
    spark: SparkSession, pages_dir: str, query_name: str = "stream_agg"
) -> DataFrame:
    """Drive the stream over all currently-available files and return the
    final aggregate as a DataFrame (test/bench harness: memory sink in
    complete mode, processAllAvailable for a deterministic barrier)."""
    agg = streaming_sink_agg(stream_pages(spark, pages_dir))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
