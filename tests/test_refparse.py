"""Golden + property tests for the pure-Python parse oracle.

Expectations pinned from the reference's tests (see tests/fixtures.py).
No Spark needed — these run in milliseconds.
"""

from datetime import datetime

import pytest

from logagg import refparse
from tests import fixtures as fx


def _tuples(rows):
    return [
        (r["severity"], r["jvm"], r["datetime"], r["source"], r["type"], r["message"])
        for r in rows
    ]


def test_one_line_log():
    rows = refparse.parse_text(fx.ONE_LINE_LOG)
    assert _tuples(rows) == [
        ("INFO", "jvm 1", datetime(2022, 7, 11, 9, 12, 2), "ttl.test", "SMB", "Exec proxy")
    ]
    assert rows[0]["extracted_text"] == fx.ONE_LINE_LOG


def test_two_line_svc():
    rows = refparse.parse_text(fx.TWO_LINE_SVC)
    assert len(rows) == 2
    assert [r["severity"] for r in rows] == ["INFO", "WARN"]
    assert [r["record_idx"] for r in rows] == [0, 1]


def test_multi_line_coalesce_count():
    # 5 physical lines → 3 records (tests/test_convert.py:174-185 semantics)
    recs = refparse.coalesce_records(fx.MULTI_LINE_LOG)
    assert len(recs) == 3
    assert recs[1] == "ERROR | This is an error log; with multiple lines; and more lines"


def test_coalesce_strips_and_skips_empty():
    text = " INFO | log stuff\n\n\n\n WARN | more logs \n\n\n INFO | moar logs\n\n\n"
    recs = refparse.coalesce_records(text)
    assert recs == ["INFO | log stuff", "WARN | more logs", "INFO | moar logs"]


def test_simple_svc_golden():
    rows = refparse.parse_text(fx.SIMPLE_SVC)
    assert len(rows) == 5
    assert _tuples(rows) == fx.SIMPLE_SVC_EXPECTED
    # severity histogram INFO=3 / ERROR=1 / WARN=1; sources ttl.test=3, org.connect=1
    sevs = [r["severity"] for r in rows]
    assert sevs.count("INFO") == 3 and sevs.count("ERROR") == 1 and sevs.count("WARN") == 1
    srcs = [r["source"] for r in rows]
    assert srcs.count("ttl.test") == 3 and srcs.count("org.connect") == 1


def test_bad_timestamp_dropped():
    assert refparse.parse_text(fx.BAD_TIMESTAMP_LOG) == []


def test_extra_fields_dropped_and_missing_none():
    # >6 pipe fields: extras silently dropped (DictReader restkey semantics)
    text = "INFO | jvm 1 | 2022/07/11 09:12:02 | src | typ | msg | extra1 | extra2"
    rows = refparse.parse_text(text)
    assert len(rows) == 1
    assert rows[0]["message"] == "msg"
    # 5 fields: message missing → None → ValidationError-drop (type present)
    text5 = "INFO | jvm 1 | 2022/07/11 09:12:02 | src | typ"
    assert refparse.parse_text(text5) == []


def test_field_shift_rule():
    # 4 fields: source→message shift
    text = "INFO\t| jvm 1 | 2022/07/11 09:12:55 | SecondaryMonitor -> {n: 2}"
    rows = refparse.parse_text(text)
    assert len(rows) == 1
    assert rows[0]["message"] == "SecondaryMonitor -> {n: 2}"
    assert rows[0]["source"] is None and rows[0]["type"] is None


def test_leading_continuation_block_is_own_record():
    # lines before the first severity line form their own (dropped) record
    text = "at foo.bar(baz.java:1)\nINFO | jvm 1 | 2022/07/11 09:12:02 | s | t | m"
    recs = refparse.coalesce_records(text)
    assert recs[0] == "at foo.bar(baz.java:1)"
    rows = refparse.parse_text(text)
    # the leading block has no timestamp → dropped; idx gap shows the drop
    assert len(rows) == 1 and rows[0]["record_idx"] == 1


def test_empty_text_yields_nothing():
    assert refparse.parse_text("") == []
    assert refparse.parse_text("\n\n  \n") == []


def test_severity_prefix_not_exact_token_still_matches():
    # re.match("INFO|WARN|ERROR") is a prefix match: "INFOrmational" starts a record
    recs = refparse.coalesce_records("INFOrmational | x\nWARNING | y")
    assert len(recs) == 2


@pytest.mark.parametrize(
    "ts",
    ["2022/07/1x 09:12:02", "2022-07-11 09:12:02", "", "2022/13/40 09:12:02"],
)
def test_malformed_timestamps_drop(ts):
    assert refparse.parse_text(f"INFO | j | {ts} | s | t | m") == []


def test_lenient_strptime_accepted():
    # datetime.strptime accepts non-zero-padded components — must not drop
    rows = refparse.parse_text("INFO | j | 2022/7/1 9:2:3 | s | t | m")
    assert len(rows) == 1
    assert rows[0]["datetime"] == datetime(2022, 7, 1, 9, 2, 3)
