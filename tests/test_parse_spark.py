"""Differential + golden tests for the distributed parse stage.

The Spark ``mapInPandas`` parser must agree row-for-row (byte-identical
strings, equal timestamps) with the independently-written pure-Python oracle
(``logagg.refparse``) over the whole synthetic corpus, and must reproduce
the reference-pinned goldens.
"""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from logagg import parse
from tests import fixtures as fx
from tests.conftest import SF_SMOKE

COLS = [
    "url",
    "lang",
    "warc_ts",
    "record_idx",
    "extracted_text",
    "severity",
    "jvm",
    "datetime",
    "source",
    "type",
    "message",
]


def _pages_df(spark, pages_cache):
    return spark.read.parquet(str(pages_cache / "pages.parquet"))


def test_parse_matches_oracle_corpus(spark, pages_cache):
    got = (
        parse.parse_pages(_pages_df(spark, pages_cache))
        .orderBy("url", "record_idx")
        .toPandas()
    )
    exp = (
        pq.read_table(pages_cache / "expected_parsed.parquet", columns=COLS)
        .to_pandas()
        .sort_values(["url", "record_idx"])
        .reset_index(drop=True)
    )
    got = got[COLS].reset_index(drop=True)
    assert len(got) == len(exp) and len(got) > 1000
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_parse_golden_simple_svc(spark):
    from datetime import datetime

    pdf = pd.DataFrame(
        {
            "url": ["https://h000.example.com/n01/fanapiservice/00000000"],
            "warc_ts": pd.Series([datetime(2022, 7, 11)], dtype="datetime64[us]"),
            "html": [b""],
            "text": [fx.SIMPLE_SVC],
            "lang": ["en"],
        }
    )
    from logagg.schemas import PAGES_SCHEMA

    df = spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
    rows = parse.parse_pages(df).orderBy("record_idx").collect()
    assert len(rows) == 5
    got = [(r.severity, r.jvm, r.datetime, r.source, r.type, r.message) for r in rows]
    assert got == fx.SIMPLE_SVC_EXPECTED
    sevs = [r.severity for r in rows]
    assert sevs.count("INFO") == 3 and sevs.count("ERROR") == 1 and sevs.count("WARN") == 1


def test_url_meta_extraction(spark, pages_cache):
    df = parse.with_url_meta(_pages_df(spark, pages_cache).select("url").limit(50))
    for r in df.collect():
        proto, _, hostpart, node, log_type, _ = r.url.split("/", 5)
        assert r.host == hostpart and r.node == node and r.log_type == log_type
    # no-match contract: "" like the reference's get_node on bad filenames
    bad = spark.createDataFrame([("not a url",)], "url string")
    row = parse.with_url_meta(bad).collect()[0]
    assert row.node == "" and row.host == "" and row.log_type == ""
