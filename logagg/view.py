"""Display/render operator — the reference's query-result view.

Reproduces the tab/pipe table format of the reference's display_result
(aggregator/view.py:38-69; golden file testsource/logs/two_line_svc_out.log):
a header line, then one line per record
``| {id}\\t| {node}\\t| {severity}\\t| {jvm}\\t| {ts}\\t| {source}\\t| {type}\\t| {message}\\t|``
with ``None`` rendered for missing optionals and timestamps in
``YYYY-MM-DD HH:MM:SS`` form. Ids are surrogate (url#record_idx) — the
reference's ObjectIds are storage artifacts, replaced by placeholders even
in its own golden test (tests/test_view.py:123-126).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEADER = "| ObjectId\t\t\t| Node\t| Severity\t| JVM\t| Timestamp\t| Source\t| Type\t| Message\t|"


def _cell(col: Column) -> Column:
    return F.coalesce(col.cast("string"), F.lit("None"))


def row_line_col(df: DataFrame) -> Column:
    """The rendered line as a Column (JVM-side string build)."""
    rid = F.concat_ws("#", df["url"], df["record_idx"].cast("string"))
    ts = F.date_format(df["datetime"], "yyyy-MM-dd HH:mm:ss")
    parts = [
        rid,
        _cell(df["node"]),
        _cell(df["severity"]),
        _cell(df["jvm"]),
        ts,
        _cell(df["source"]),
        _cell(df["type"]),
        _cell(df["message"]),
    ]
    line = F.lit("| ")
    for i, p in enumerate(parts):
        line = F.concat(line, p, F.lit("\t| " if i < len(parts) - 1 else "\t|"))
    return line


def render_lines(df: DataFrame) -> DataFrame:
    """(url, record_idx, line) — the display projection as a DataFrame."""
    return df.select("url", "record_idx", row_line_col(df).alias("line"))


def render_text(df: DataFrame, limit: int = 1000) -> str:
    """Driver-side full render (header + ordered lines) — the ``df.show()``
    analog used by tests against the reference's golden bytes."""
    rows = (
        render_lines(df)
        .orderBy("url", "record_idx")
        .limit(limit)
        .collect()
    )
    return "\n".join([HEADER] + [r["line"] for r in rows]) + "\n"
