"""Pure-Python record parser — the differential oracle for the parse stage.

This module re-implements, record-at-a-time, the observable parse semantics
of the reference pipeline so the distributed Arrow-batched parser in
``logagg.parse`` can be differentially tested against it (goldens + fuzz),
and so DuckDB-checkable "expected" tables can be materialized.

Semantics implemented (citations are into /root/reference, studied as
behavioral spec — this is an independent implementation):

* multi-line coalesce: split text on ``\\n``, ``str.strip`` each line, skip
  empties, start a new record at each line whose start matches
  ``INFO|WARN|ERROR``, join a record's lines with ``"; "``, flush the
  trailing buffer (aggregator/convert.py:41-60).
* pipe-delimited field split with Python ``csv`` semantics: 6 named fields
  ``severity, jvm, datetime, source, type, message``; fields beyond 6 are
  silently dropped (DictReader restkey), missing fields are None (restval);
  blank csv rows are skipped; default ``"`` quoting applies
  (aggregator/convert.py:85-91).
* per-field ``str.strip``; None values left as None
  (aggregator/convert.py:76-82).
* field-shift rule: ``message is None and type is None and source is not
  None`` → message←source, source←None (aggregator/convert.py:119-121).
* timestamp parse ``%Y/%m/%d %H:%M:%S`` via ``datetime.strptime``; a
  ValueError (malformed) or TypeError (missing) drops the row, never fails
  the job (aggregator/convert.py:94-100,123-142).
* required-field validation: rows with null severity or message are dropped
  (aggregator/model.py:17-50 required fields).

Divergence (documented): on input with zero non-empty lines the reference
raises IndexError (convert.py:59 ``log_tmp[0]`` on an empty list); we return
zero records — a crash is not a semantic worth preserving at 100 TB.
"""

from __future__ import annotations

import csv
import io
from datetime import datetime
from typing import Iterable

SEVERITY_PREFIXES: tuple[str, ...] = ("INFO", "WARN", "ERROR")
FIELD_NAMES: tuple[str, ...] = ("severity", "jvm", "datetime", "source", "type", "message")
TS_FORMAT = "%Y/%m/%d %H:%M:%S"
RECORD_JOINER = "; "


def coalesce_records(text: str) -> list[str]:
    """Coalesce a raw multi-line log text into single-line records."""
    records: list[str] = []
    buf: list[str] = []
    for raw in text.split("\n"):
        line = raw.strip()
        if not line:
            continue
        if line.startswith(SEVERITY_PREFIXES) and buf:
            records.append(RECORD_JOINER.join(buf))
            buf = []
        buf.append(line)
    if buf:
        records.append(RECORD_JOINER.join(buf))
    return records


class _LineCursor:
    """Iterator over pre-split lines that remembers its position, so csv rows
    can be mapped back to the source record(s) they consumed (provenance for
    the byte-identity column)."""

    def __init__(self, lines: list[str]):
        self.lines = lines
        self.pos = 0

    def __iter__(self) -> "_LineCursor":
        return self

    def __next__(self) -> str:
        if self.pos >= len(self.lines):
            raise StopIteration
        out = self.lines[self.pos]
        self.pos += 1
        return out


def split_fields(records: list[str]) -> list[tuple[dict, str]]:
    """Split coalesced records into 6 named fields with csv-module semantics.

    Models the reference's write-records-then-DictReader round trip: records
    are laid out one per line, read back with universal-newline translation,
    parsed by ``csv`` with ``delimiter='|'`` and default quoting. Returns
    ``(field_dict, source_text)`` per emitted csv row, where source_text is
    the exact record text the row came from (normally the record itself).
    """
    payload = "".join(r + "\n" for r in records)
    payload = payload.replace("\r\n", "\n").replace("\r", "\n")
    lines = payload.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    cursor = _LineCursor(lines)
    reader = csv.reader(cursor, delimiter="|")
    out: list[tuple[dict, str]] = []
    prev = 0
    for row in reader:
        consumed = lines[prev:cursor.pos]
        prev = cursor.pos
        if not row:  # DictReader skips blank rows
            continue
        fields = {
            name: (row[i] if i < len(row) else None) for i, name in enumerate(FIELD_NAMES)
        }
        out.append((fields, "\n".join(consumed)))
    return out


def finish_fields(fields: dict) -> dict | None:
    """Strip, field-shift, parse timestamp, validate. None = row dropped."""
    vals = {k: (v.strip() if isinstance(v, str) else v) for k, v in fields.items()}
    if vals["message"] is None and vals["type"] is None and vals["source"] is not None:
        vals["message"] = vals["source"]
        vals["source"] = None
    raw_ts = vals["datetime"]
    if raw_ts is None:
        return None
    try:
        vals["datetime"] = datetime.strptime(raw_ts, TS_FORMAT)
    except ValueError:
        return None
    if vals["severity"] is None or vals["message"] is None:
        return None
    return vals


def parse_text(text: str) -> list[dict]:
    """Full per-document parse: coalesce → split → finish.

    Returns one dict per surviving record with keys ``record_idx`` (ordinal
    among all csv rows, pre-drop — gaps reveal dropped rows),
    ``extracted_text`` (the coalesced record string — the byte-identity
    payload), and the six parsed fields.
    """
    rows: list[dict] = []
    for idx, (fields, source_text) in enumerate(split_fields(coalesce_records(text))):
        vals = finish_fields(fields)
        if vals is None:
            continue
        vals["record_idx"] = idx
        vals["extracted_text"] = source_text
        rows.append(vals)
    return rows
