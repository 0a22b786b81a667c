"""Streaming parse+aggregate must equal the batch plan on the same input."""

from pyspark.sql import functions as F

from logagg import aggregate, parse, streaming


def test_streaming_agg_equals_batch(spark, pages_cache):
    pages_dir = str(pages_cache / "pages.parquet")
    got = streaming.run_stream_to_memory(spark, pages_dir).collect()

    batch = (
        aggregate.sink_agg_hourly(
            parse.parsed_records(spark.read.parquet(pages_dir))
        )
        .select(
            F.col("bucket"), "host", "lang", "n_rows", "total_msg_chars"
        )
        .collect()
    )
    key = lambda r: (r["bucket"], r["host"], r["lang"])  # noqa: E731
    got_map = {key(r): (r["n_rows"], r["total_msg_chars"]) for r in got}
    batch_map = {key(r): (r["n_rows"], r["total_msg_chars"]) for r in batch}
    assert got_map == batch_map
    assert len(got_map) > 100


def test_stateful_host_counts_equals_batch(spark, pages_cache):
    pages_dir = str(pages_cache / "pages.parquet")
    got = {
        r["host"]: r["n_rows"]
        for r in streaming.run_stateful_to_memory(spark, pages_dir).collect()
    }
    batch = {
        r["host"]: r["n"]
        for r in parse.parsed_records(spark.read.parquet(pages_dir))
        .groupBy("host")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == batch and len(got) > 50


def test_tws_sessions_equal_batch(spark):
    # transformWithStateInPandas sessionizer == the batch window sessionizer
    # (needs google.protobuf, which Spark's TWS driver worker imports —
    # gate like any missing-native dependency)
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    import __spark_entry__ as entrymod

    got = {
        r["user_id"]: r["n_sessions"]
        for r in streaming.run_sessions_tws_to_memory(
            spark, "/root/testdata/sf0.001/events.parquet"
        ).collect()
    }
    batch = {
        r["user_id"]: r["n_sessions"]
        for r in entrymod.queries()["user_sessions"](spark, "/root/testdata/sf0.001").collect()
    }
    assert got == batch and len(got) > 20


def test_streaming_dedup_equals_batch(spark, pages_cache):
    """dropDuplicatesWithinWatermark with a horizon wider than the corpus'
    event-time span must keep exactly one row per distinct text (== batch
    exact_dupes group count), and the corpus does contain duplicates."""
    from logagg import dedup

    pages_dir = str(pages_cache / "pages.parquet")
    got = streaming.run_streaming_dedup_to_memory(
        spark, pages_dir, watermark="3650 days"
    ).collect()
    pages = spark.read.parquet(pages_dir)
    batch_groups = dedup.exact_dupes(pages, id_col="url", text_col="text").collect()
    assert len(got) == len(batch_groups)  # one keeper per distinct text
    assert len(got) < pages.count()  # synth injects exact copies
    assert {r["text_md5"] for r in got} == {r["text_md5"] for r in batch_groups}
