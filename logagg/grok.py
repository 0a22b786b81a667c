"""Grok-style pattern compiler — configurable field extraction.

The reference hard-codes its field grammar (pipe-csv + filename regexes);
a production log engine needs user-supplied patterns. This module compiles
grok expressions (``%{NAME:field}`` aliases over a library of named
regexes, the public Logstash convention) into plain regexes and applies
them either JVM-side (``regexp_extract`` per field — Catalyst, codegen,
pushdown-friendly) or as one vectorized pandas pass (single regex
evaluation per row, Arrow-batched) — the two standard cost shapes.

Pattern semantics are plain regex on both engines; the library below uses
constructs valid in Java regex, RE2 (DuckDB) and Python re, so oracle
comparisons are engine-portable.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GROK_LIBRARY: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "LOGLEVEL": r"INFO|WARN|ERROR|DEBUG|TRACE|FATAL",
    "TIMESTAMP_SLASH": r"\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}",
    "JAVACLASS": r"[a-zA-Z_$][a-zA-Z0-9_$]*(?:\.[a-zA-Z_$][a-zA-Z0-9_$]*)+",
    "JAVAFILE": r"[A-Za-z0-9_.-]+\.java",
    "PATH": r"(?:/[\w.-]+)+",
}

_GROK_TOKEN = re.compile(r"%\{(\w+)(?::(\w+))?\}")


class GrokPattern:
    """A compiled grok expression: regex + ordered (field, group-index)."""

    def __init__(self, expression: str, library: dict[str, str] | None = None):
        lib = {**GROK_LIBRARY, **(library or {})}
        self.expression = expression
        self.fields: list[str] = []
        group = 0

        def _sub(m: re.Match) -> str:
            nonlocal group
            name, field = m.group(1), m.group(2)
            if name not in lib:
                raise KeyError(f"unknown grok pattern %{{{name}}}")
            body = lib[name]
            if field:
                group += 1
                self.fields.append(field)
                return f"({body})"
            return f"(?:{body})"

        self.regex = _GROK_TOKEN.sub(_sub, expression)
        self._compiled = re.compile(self.regex)

    def match(self, s: str) -> dict | None:
        m = self._compiled.search(s)
        if m is None:
            return None
        return dict(zip(self.fields, m.groups()))

    def group_index(self, field: str) -> int:
        """1-based regex group index of a named field."""
        return self.fields.index(field) + 1


def grok_extract_all_jvm(col: Column | str, pattern: GrokPattern, field: str) -> Column:
    """ALL matches of one grok field as an array column — JVM-side
    ``regexp_extract_all`` over the compiled pattern (the repeated-group
    analog of ``grok_extract_jvm``; explode downstream as needed)."""
    return F.regexp_extract_all(col, F.lit(pattern.regex), pattern.group_index(field))


def grok_extract_jvm(df: DataFrame, col: str, pattern: GrokPattern) -> DataFrame:
    """One ``regexp_extract`` per field — all JVM/codegen; right when the
    pattern has few fields or downstream prunes most of them (Catalyst
    collapses the per-field projections into one stage)."""
    out = df
    for i, field in enumerate(pattern.fields, start=1):
        out = out.withColumn(field, F.regexp_extract(F.col(col), pattern.regex, i))
    return out


def grok_extract_vectorized(df: DataFrame, col: str, pattern: GrokPattern) -> DataFrame:
    """One pandas ``str.extract`` pass — single regex evaluation per row,
    Arrow-batched; right when the pattern is wide (many fields)."""
    fields = list(pattern.fields)
    regex = pattern.regex
    in_cols = df.columns
    schema = ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}" for c in in_cols)
    schema += ", " + ", ".join(f"`{f}` string" for f in fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pat = re.compile(regex)
        for pdf in batches:
            extracted = pdf[col].astype("string").str.extract(pat, expand=True)
            extracted.columns = fields
            # match regexp_extract's contract exactly: "" (not null) on
            # no-match, but NULL (not "") when the input itself is NULL
            filled = extracted.fillna("")
            null_in = pdf[col].isna().to_numpy()
            if null_in.any():
                filled.loc[null_in, :] = None
            yield pd.concat([pdf, filled], axis=1)

    return df.mapInPandas(run, schema=schema)
