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
