"""Catalog fallback behavior + bucketed-write shuffle elision."""

from pyspark.sql import functions as F

from logagg.catalog import Catalog, iceberg_available


def test_catalog_parquet_fallback_roundtrip(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    # sandbox image has no Iceberg jar — the probe must degrade, not raise
    assert cat.iceberg == iceberg_available(spark)
    df = spark.range(100).withColumn("k", F.col("id") % 7)
    cat.overwrite("db.t1", df, partition_by=("k",))
    assert cat.exists("db.t1")
    back = cat.read("db.t1")
    assert back.count() == 100
    cat.append("db.t1", spark.range(100, 150).withColumn("k", F.col("id") % 7))
    assert cat.read("db.t1").count() == 150


def test_bucketed_write_elides_join_shuffle(spark, tmp_path):
    """bucketBy co-locates join keys at write time: a self-join of two
    bucketed tables on the bucket key must not shuffle either side
    (north-star 'bucketed writes')."""
    import shutil

    for t in ("b1", "b2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a previously crashed run can orphan the managed location
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    df = spark.range(10_000).withColumn("host", (F.col("id") % 97).cast("string"))
    df.write.bucketBy(8, "host").sortBy("host").mode("overwrite").saveAsTable("b1")
    df.groupBy("host").agg(F.count("*").alias("n")).write.bucketBy(8, "host").mode(
        "overwrite"
    ).saveAsTable("b2")
    # force a sort-merge join (a broadcast would trivially avoid shuffles
    # without proving the bucket layout did anything)
    joined = spark.table("b1").hint("merge").join(spark.table("b2"), "host")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan  # bucket co-location
    assert "SortMergeJoin" in plan, plan
    assert joined.count() == 10_000


def test_compact_parquet_dir_preserves_rows(spark, tmp_path):
    """Many small appended files → few files, identical row set; the
    partitioned variant keeps the hive layout (pruning survives)."""
    from pyspark.sql import functions as F

    from logagg import catalog

    flat = str(tmp_path / "flat")
    for i in range(6):
        spark.range(i * 10, i * 10 + 10).withColumn(
            "v", F.col("id") * 2
        ).coalesce(2).write.mode("append").parquet(flat)
    before = {tuple(r) for r in spark.read.parquet(flat).collect()}
    stats = catalog.compact_parquet_dir(spark, flat, target_mb=256)
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] == 1  # tiny data → single target file
    after = {tuple(r) for r in spark.read.parquet(flat).collect()}
    assert after == before

    part = str(tmp_path / "part")
    for i in range(4):
        (
            spark.range(40)
            .withColumn("batch_id", F.lit(i % 2))
            .withColumn("v", F.col("id") + i)
            .coalesce(3)
            .write.mode("append")
            .partitionBy("batch_id")
            .parquet(part)
        )
    before_p = {tuple(r) for r in spark.read.parquet(part).collect()}
    stats_p = catalog.compact_parquet_dir(
        spark, part, partition_cols=("batch_id",)
    )
    assert stats_p["files_after"] < stats_p["files_before"]
    import os

    assert sorted(
        d for d in os.listdir(part) if d.startswith("batch_id=")
    ) == ["batch_id=0", "batch_id=1"]
    after_p = {tuple(r) for r in spark.read.parquet(part).collect()}
    assert after_p == before_p
