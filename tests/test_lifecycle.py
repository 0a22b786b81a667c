"""End-to-end lifecycle over the session's newest operators — proves they
COMPOSE, not just pass in isolation: discovered URLs flow through the
bloom-accelerated seen-set, the surviving pages' documents go through
curation with the quality-weighted A-ES selection tail, the pick is laid
out in curriculum order and written as trainer-ready shards, and the
tokenizer fertility report reads the result. Every stage's output feeds
the next with no glue beyond the public APIs."""

import json

import pytest

from pyspark.sql import functions as F

from logagg import bpe, curate, frontier, mix, textstats

SF = "/root/testdata/sf0.001"


def test_webtext_lifecycle_composes(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # 1. frontier: half the doc ids arrive as "already crawled", then the
    # full discovery batch — only the other half survives the seen-set
    urls = docs.select(
        F.concat(F.lit("http://corpus.example.com/doc/"), F.col("doc_id")).alias(
            "url"
        ),
        "doc_id",
    )
    seen = str(tmp_path / "seen")
    frontier.filter_unseen_bloom(
        urls.filter(F.col("doc_id") % 2 == 0).select("url"), seen
    )
    fresh = frontier.filter_unseen_bloom(urls.select("url"), seen)
    fresh_ids = {
        int(r["url"].rsplit("/", 1)[1]) for r in fresh.collect()
    }
    assert fresh_ids == {
        r["doc_id"] for r in docs.filter(F.col("doc_id") % 2 == 1).collect()
    }

    # 2. curate the fresh half: C4-doctored text (the log corpus has no
    # terminal punctuation), exact dedup, then the A-ES quality tail
    pool = docs.join(
        spark.createDataFrame([(i,) for i in fresh_ids], "doc_id long"), "doc_id"
    ).withColumn(
        "text",
        F.array_join(
            F.transform(
                F.split("text", "\n"),
                lambda ln, i: F.when(i % 2 == 0, F.concat(ln, F.lit("."))).otherwise(ln),
            ),
            "\n",
        ),
    )
    res = curate.curate(pool, c4=True, c4_min_sentences=1, sample_k=60)
    stages = [m["stage"] for m in res.manifest]
    assert stages == ["c4_filters", "exact_dedup", "quality_sample"]
    picked = res.docs
    assert picked.count() == 60

    # 3. curriculum layout + trainer shards; the shard manifest's row
    # total equals the pick and shards read back in global order
    staged = mix.curriculum_order(
        picked.withColumn("score", F.length("text").cast("double")),
        "score",
        n_stages=3,
    )
    shards_dir = str(tmp_path / "shards")
    manifest = mix.write_training_shards(
        staged.drop("stage", "order_key"), shards_dir, rows_per_shard=25
    )
    assert sum(m["n_rows"] for m in manifest) == 60
    assert len(manifest) >= 2
    back = spark.read.option("basePath", shards_dir).parquet(
        *[f"{shards_dir}/shard={m['shard']}" for m in manifest]
    )
    assert back.count() == 60

    # 4. tokenizer fit diagnostics on the shipped shards
    model = bpe.train_bpe(picked, 40)
    rep = bpe.fertility_report(
        back.withColumn("source", F.lit("lifecycle")), model, id_col="doc_id"
    ).collect()
    assert len(rep) == 1 and rep[0]["n_docs"] == 60
    assert rep[0]["fertility"] >= 1.0 and rep[0]["unk_frac"] < 0.05

    res.unpersist()
