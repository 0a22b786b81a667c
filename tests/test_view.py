"""Golden render test: our display operator must byte-match the reference's
golden output file (testsource/logs/two_line_svc_out.log semantics) with id
placeholders substituted — same substitution the reference's own test does
(tests/test_view.py:123-126)."""

import re
from datetime import datetime

import pandas as pd

from logagg import parse, view
from logagg.schemas import PAGES_SCHEMA
from tests import fixtures as fx

GOLDEN = (
    "| ObjectId\t\t\t| Node\t| Severity\t| JVM\t| Timestamp\t| Source\t| Type\t| Message\t|\n"
    "| objectid0\t| node\t| INFO\t| jvm 1\t| 2022-07-11 09:12:02\t| ttl.test\t| SMB\t| Exec proxy\t|\n"
    "| objectid1\t| node\t| WARN\t| jvm 1\t| 2022-07-11 09:13:01\t| ttl.test\t| async\t| FileIO\t|\n"
)


def test_render_matches_golden_bytes(spark):
    pdf = pd.DataFrame(
        {
            "url": ["https://h/node/svc/0"],
            "warc_ts": pd.Series([datetime(2022, 7, 11)], dtype="datetime64[us]"),
            "html": [b""],
            "text": [fx.TWO_LINE_SVC],
            "lang": ["en"],
        }
    )
    df = parse.parsed_records(spark.createDataFrame(pdf, schema=PAGES_SCHEMA))
    out = view.render_text(df)
    # surrogate ids → positional placeholders, like the reference's own test
    out = re.sub(r"\| https://h/node/svc/0#(\d+)\t", r"| objectid\1\t", out)
    assert out == GOLDEN


def test_render_none_fields(spark):
    pdf = pd.DataFrame(
        {
            "url": ["https://h/node/svc/0"],
            "warc_ts": pd.Series([datetime(2022, 7, 11)], dtype="datetime64[us]"),
            "html": [b""],
            "text": ["INFO\t| jvm 1 | 2022/07/11 09:12:55 | ShiftedToMessage"],
            "lang": ["en"],
        }
    )
    df = parse.parsed_records(spark.createDataFrame(pdf, schema=PAGES_SCHEMA))
    out = view.render_text(df)
    # optionals render as the literal "None" (reference f-string semantics)
    assert "\t| None\t| None\t| ShiftedToMessage\t|" in out


def _one_record_df(spark):
    pdf = pd.DataFrame(
        {
            "url": ["https://h/node/svc/7"],
            "warc_ts": pd.Series([datetime(2022, 7, 11)], dtype="datetime64[us]"),
            "html": [b""],
            "text": ["INFO | jvm 1 | 2022/07/11 09:12:55 | ttl.test | SMB | Exec"],
            "lang": ["en"],
        }
    )
    return parse.parsed_records(spark.createDataFrame(pdf, schema=PAGES_SCHEMA))


def test_get_record_null_id_contract(spark):
    """Reference db.get_log (aggregator/db.py:90-110): None id RAISES; a
    missing-but-well-formed id returns None (logged miss, never an error)."""
    import pytest

    df = _one_record_df(spark)
    with pytest.raises(ValueError, match="None log"):
        view.get_record(df, None)
    # malformed ids fail validation the same way the reference's ObjectId
    # parsing does — an explicit raise, not an int() traceback or a miss
    for bad in ("garbage", "https://h/x#", "https://h/x#notanint"):
        with pytest.raises(ValueError, match="malformed"):
            view.get_record(df, bad)
    assert view.get_record(df, "https://h/node/svc/7#999") is None
    hit = view.get_record(df, "https://h/node/svc/7#0")
    assert hit is not None and hit["message"] == "Exec"


def test_render_result_shape_tolerance(spark):
    """Reference display_result (aggregator/view.py:22-37): None input →
    None (display nothing); a single record → a one-row table; and the
    driver-side single-Row renderer is byte-identical to the Spark one."""
    df = _one_record_df(spark)
    assert view.render_result(None) is None
    row = view.get_record(df, "https://h/node/svc/7#0")
    single = view.render_result(row)
    assert single == view.render_text(df)  # one record either way
    assert single.startswith(view.HEADER)
    # differential: python row_line == JVM row_line_col for the same record
    jvm_line = view.render_lines(df).collect()[0]["line"]
    assert view.row_line(row) == jvm_line
