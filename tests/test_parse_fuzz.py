"""Property-based fuzz of the line grammar: the Arrow-batch parser kernel
(parse._parse_batch, pure pandas — no Spark session needed) must agree with
the record-at-a-time oracle (refparse.parse_text) on arbitrary inputs built
from the grammar's alphabet, including hostile edge material (quotes,
pipes, tabs, carriage returns, empty lines, garbage)."""

from datetime import datetime

import pandas as pd
from hypothesis import given, settings, strategies as st

from logagg import parse, refparse

severities = st.sampled_from(["INFO", "WARN", "ERROR", "INFOX", "warn", "TRACE"])
field_text = st.text(
    alphabet=' abcdefgh|"\t\r;:/.{}x0123456789',
    min_size=0,
    max_size=20,
)
timestamps = st.one_of(
    st.just("2022/07/11 09:12:02"),
    st.just("2022/7/1 9:2:3"),
    st.just("2022/07/1x 09:12:02"),
    st.just("not a date"),
    field_text,
)


@st.composite
def log_lines(draw):
    kind = draw(st.integers(0, 3))
    if kind == 0:  # severity-led pipe record with 1..8 fields
        parts = [draw(severities)]
        n = draw(st.integers(0, 7))
        fields = [draw(field_text) for _ in range(n)]
        if n >= 2:
            fields[1] = draw(timestamps)
        return " | ".join(parts + fields)
    if kind == 1:  # continuation line
        return "\tat " + draw(field_text)
    if kind == 2:  # empty-ish
        return draw(st.sampled_from(["", "   ", "\t"]))
    return draw(field_text)  # arbitrary garbage


texts = st.lists(log_lines(), min_size=0, max_size=12).map("\n".join)


@settings(max_examples=300, deadline=None)
@given(texts)
def test_batch_parser_agrees_with_oracle(text):
    pdf = pd.DataFrame(
        {
            "url": ["https://h/x/y/0"],
            "lang": ["en"],
            "warc_ts": pd.Series([datetime(2022, 7, 11)], dtype="datetime64[us]"),
            "text": [text],
        }
    )
    got = parse._parse_batch(pdf)
    exp = refparse.parse_text(text)
    assert len(got) == len(exp)
    for i, r in enumerate(exp):
        row = got.iloc[i]
        assert row["record_idx"] == r["record_idx"]
        assert row["extracted_text"] == r["extracted_text"]
        assert row["severity"] == r["severity"]
        assert (row["jvm"] if pd.notna(row["jvm"]) else None) == r["jvm"]
        assert row["datetime"].to_pydatetime() == r["datetime"]
        assert (row["source"] if pd.notna(row["source"]) else None) == r["source"]
        assert (row["type"] if pd.notna(row["type"]) else None) == r["type"]
        assert row["message"] == r["message"]
