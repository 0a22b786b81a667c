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


def get_record(parsed: DataFrame, rec_id: str | None):
    """Point lookup by surrogate id ``url#record_idx`` — the reference's
    ``get_log`` contract (aggregator/db.py:90-110): a None id raises
    (the reference's ValidationError path — never a silent empty result),
    a well-formed but ABSENT id returns None (a logged miss, not an error).
    Returns the single matching Row otherwise."""
    if rec_id is None:
        raise ValueError("Cannot get None log")
    url, sep, idx = rec_id.rpartition("#")
    if not sep or not idx.isdigit():
        # malformed id is the same contract branch as None (the reference's
        # ObjectId validation rejects malformed ids before the query runs)
        raise ValueError(f"malformed record id: {rec_id!r}")
    rows = (
        parsed.filter((F.col("url") == url) & (F.col("record_idx") == int(idx)))
        .limit(1)
        .collect()
    )
    return rows[0] if rows else None


def _py_cell(v) -> str:
    return "None" if v is None else str(v)


def row_line(r) -> str:
    """Driver-side render of ONE Row — byte-identical to row_line_col
    (differentially tested) for results already collected."""
    ts = r["datetime"].strftime("%Y-%m-%d %H:%M:%S")
    rid = f"{r['url']}#{r['record_idx']}"
    parts = [
        rid,
        _py_cell(r["node"]),
        _py_cell(r["severity"]),
        _py_cell(r["jvm"]),
        ts,
        _py_cell(r["source"]),
        _py_cell(r["type"]),
        _py_cell(r["message"]),
    ]
    return "| " + "\t| ".join(parts) + "\t|"


def render_result(result, limit: int = 1000) -> str | None:
    """``display_result`` input-shape tolerance (aggregator/view.py:22-37):
    ``None`` → None (display nothing, not an error); a single collected Row
    → a one-record table; a DataFrame → the full render."""
    if result is None:
        return None
    if isinstance(result, DataFrame):
        return render_text(result, limit)
    return "\n".join([HEADER, row_line(result)]) + "\n"


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
