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


def stateful_host_counts(pages_stream: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-host record count kept in
    explicit group state (``applyInPandasWithState``) — the pattern for
    operators Spark's built-in aggregates can't express (per-key custom
    state machines). Emits the cumulative count on every update."""
    import pandas as pd

    parsed = parse.parsed_records(pages_stream)
    hosts = parsed.withColumn("host", F.regexp_extract("url", r"^[a-z]+://([^/]+)/", 1))

    def update(key, pdfs, state):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"host": [key[0]], "n_rows": [total]})

    return hosts.groupBy("host").applyInPandasWithState(
        update,
        outputStructType="host string, n_rows long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_stateful_to_memory(
    spark: SparkSession, pages_dir: str, query_name: str = "stateful_counts"
) -> DataFrame:
    """Drive the stateful counter over all available files; the last update
    per host is the final count."""
    agg = stateful_host_counts(stream_pages(spark, pages_dir))
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # updates append per micro-batch: the max per host is the final total
    return spark.sql(
        f"SELECT host, max(n_rows) AS n_rows FROM {query_name} GROUP BY host"
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
