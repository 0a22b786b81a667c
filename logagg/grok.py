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

_REGEX_META = set(".^$*+?()[]{}|")

_HEX_DIGITS = set("0123456789abcdefABCDEF")


def _escape_atom(segment: str, i: int) -> tuple[str | None, int]:
    """Decode the regex escape starting at ``segment[i] == '\\'``.

    Returns ``(literal_char_or_None, next_index)``. The literal char is the
    exact single character the escape is guaranteed to match when that is
    knowable (``\\xHH``, ``\\uHHHH``, ``\\UHHHHHHHH``, ``\\N{NAME}``,
    escaped punctuation); ``None`` means class/anchor/backreference/octal/
    unknown — variable text, the caller must flush the current run.

    ``next_index`` always skips the WHOLE escape, so its payload characters
    are never misread as trailing literal text — the round-4 unsoundness
    was exactly that: ``\\xaa`` (one escape matching 'ª') parsed as a class
    escape ``\\x`` followed by the "literal" run ``aa``, making
    ``pushdown_filter`` silently drop matching rows.
    """
    nxt = segment[i + 1] if i + 1 < len(segment) else ""
    if not nxt:  # trailing backslash — malformed; consume to end
        return None, len(segment)
    if not nxt.isalnum():
        return nxt, i + 2  # escaped metachar/punct matches itself
    for marker, width in (("x", 2), ("u", 4), ("U", 8)):
        if nxt == marker:
            digits = segment[i + 2 : i + 2 + width]
            if len(digits) == width and all(c in _HEX_DIGITS for c in digits):
                return chr(int(digits, 16)), i + 2 + width
            return None, i + 2  # malformed (re.compile rejects it anyway)
    if nxt == "N" and i + 2 < len(segment) and segment[i + 2] == "{":
        close = segment.find("}", i + 3)
        if close == -1:
            return None, len(segment)
        try:
            import unicodedata

            return unicodedata.lookup(segment[i + 3 : close]), close + 1
        except KeyError:
            return None, close + 1
    if nxt.isdigit():
        # backreference or octal escape — ambiguous (\1 vs \101) and either
        # way variable/derived text: flush, and consume the whole digit run
        # so no digit leaks into a claimed literal
        j = i + 1
        while j < len(segment) and segment[j].isdigit():
            j += 1
        return None, j
    return None, i + 2  # \d \w \s \b \A \Z \n \t ... — variable or unhandled


def _has_unescaped(segment: str, chars: str) -> bool:
    """True if any of ``chars`` appears unescaped in the segment (proper
    escape-aware scan — a lookbehind regex misreads ``a\\\\|b``, where the
    backslash is itself escaped and the alternation is real)."""
    i = 0
    while i < len(segment):
        if segment[i] == "\\":
            i += 2
            continue
        if segment[i] in chars:
            return True
        i += 1
    return False


def _brackets_balanced(s: str) -> bool:
    """True iff every unescaped ``[`` closes within ``s`` and no stray
    unescaped ``]`` appears outside a class — i.e. the string's character
    classes are self-contained, so per-string analysis cannot be fooled by
    a class spanning into neighboring segments or tokens. (A lone ``]`` is
    technically a literal in most engines; treated as unbalanced here —
    conservatism costs only a skipped filter, never a wrong one.)"""
    i, in_class = 0, False
    while i < len(s):
        ch = s[i]
        if ch == "\\":
            i += 2
            continue
        if not in_class and ch == "[":
            in_class = True
            i += 1
            if i < len(s) and s[i] == "^":
                i += 1
            if i < len(s) and s[i] == "]":
                i += 1  # leading ] is literal inside a class
            continue
        if ch == "]":
            if not in_class:
                return False
            in_class = False
        i += 1
    return not in_class


def _literal_runs(segment: str) -> list[str]:
    """Literal character runs REQUIRED by a regex segment (conservative).

    The segment must be free of unescaped grouping/alternation syntax (else
    nothing in it is provably required → empty — an alternation makes every
    literal branch-conditional) and its classes must be self-contained
    (``_brackets_balanced`` — a stray bracket means this string is part of
    a class that spans beyond it). A balanced character class ``[...]`` is
    one variable position: it breaks the current run but keeps the segment
    analyzable. Quantifiers make the preceding atom optional/repeated: the
    last run char is dropped (a just-skipped class pops nothing). Escapes
    are decoded atomically by ``_escape_atom``: ``\\xHH``/``\\uHHHH``/
    ``\\UHHHHHHHH``/``\\N{...}`` contribute their ONE decoded char (never
    their payload digits), escaped punctuation contributes its char, and
    class escapes (\\d, \\w, \\s, anchors, backreferences, octal) break
    the run.
    """
    if _has_unescaped(segment, "|()") or not _brackets_balanced(segment):
        return []
    runs: list[str] = []
    cur: list[str] = []

    def flush() -> None:
        if cur:
            runs.append("".join(cur))
            cur.clear()

    i = 0
    while i < len(segment):
        ch = segment[i]
        if ch == "\\":
            lit, i = _escape_atom(segment, i)
            if lit is None:
                flush()  # variable text (class escape / backref / octal)
            else:
                cur.append(lit)
            continue
        if ch == "[":
            flush()  # one variable char; skip to the closing bracket
            j = i + 1
            if j < len(segment) and segment[j] == "^":
                j += 1
            if j < len(segment) and segment[j] == "]":
                j += 1  # leading ] is literal inside a class
            while j < len(segment) and segment[j] != "]":
                j += 2 if segment[j] == "\\" else 1
            i = j + 1
            continue
        if ch in "*+?{":
            if cur:
                cur.pop()  # the quantified char is optional/repeated
            flush()
            if ch == "{":
                end = segment.find("}", i)
                i = end if end != -1 else i
            i += 1
            continue
        if ch in _REGEX_META:
            flush()
            i += 1
            continue
        cur.append(ch)
        i += 1
    flush()
    return [r for r in runs if r]


def pushdown_filter(text_col: Column | str, pattern: GrokPattern) -> Column:
    """Scan-level pre-filter for grok extraction over PARSED log records:
    a page whose raw text lacks the pattern's whitespace-free literal token
    cannot yield a matching record, so it can be dropped before the parse
    UDF ever sees it. Pages containing a quote char are always kept — csv
    quote-stripping may splice a token that raw contains() cannot see
    (``"Error"Code`` parses to ``ErrorCode``). Returns lit(True) when the
    pattern carries no usable literal (filter is then a no-op)."""
    lit = pattern.scan_literal
    if not lit:
        return F.lit(True)
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return col.contains(lit) | col.contains('"')


class GrokPattern:
    """A compiled grok expression: regex + ordered (field, group-index)."""

    def __init__(self, expression: str, library: dict[str, str] | None = None):
        lib = {**GROK_LIBRARY, **(library or {})}
        self.expression = expression
        self._lib = lib
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

    @property
    def required_literal(self) -> str:
        """Longest literal substring every match must contain — the scan-level
        pre-filter a grok query pushes below opaque UDFs ("" if none).

        Derived conservatively from the original expression: if ANY literal
        segment BETWEEN ``%{...}`` tokens contains unescaped alternation or
        grouping syntax, the whole expression yields "" — a top-level ``|``
        (or a group spanning segments) means nothing is provably required.
        Otherwise candidates come from the segments AND from unquantified
        token BODIES (a library pattern like JAVAFILE = ``[\\w.-]+\\.java``
        requires ``.java`` in every match; bodies with their own
        alternation/grouping — LOGLEVEL, JAVACLASS — contribute nothing,
        and a token followed by a quantifier is optional, so its body is
        skipped). Quantified chars are dropped from their runs; escaped
        metachars (``\\(`` → ``(``) count as their literal char.
        """
        segments = _GROK_TOKEN.split(self.expression)[::3]  # non-token text
        # a segment whose brackets are UNBALANCED opens (or continues) a
        # class that swallows later segments and tokens — "[%{WORD:w}xy]"
        # is ONE class whose "xy" is not required by matches → void the
        # whole expression. Balanced, self-contained classes within a
        # segment are fine (handled inside _literal_runs).
        if any(
            _has_unescaped(seg, "|()") or not _brackets_balanced(seg)
            for seg in segments
        ):
            return ""
        candidates: list[str] = []
        for seg in segments:
            candidates.extend(_literal_runs(seg))
        for m in _GROK_TOKEN.finditer(self.expression):
            end = m.end()
            if end < len(self.expression) and self.expression[end] in "*+?{":
                continue  # quantified token → its body is optional
            # _literal_runs rejects bodies with alternation/grouping or
            # unbalanced brackets (a stray "]" in a user-supplied library
            # body would otherwise leak an unsound literal)
            candidates.extend(_literal_runs(self._lib[m.group(1)]))
        return max(candidates, key=len, default="")

    @property
    def scan_literal(self) -> str:
        """Longest whitespace-free piece of ``required_literal`` — safe to
        push onto RAW text upstream of line-coalesce/strip/join parsing
        (those transforms insert/remove only whitespace between lines, so a
        whitespace-free token in any parsed field appears contiguously in
        the raw text; csv quote-stripping is the one exception — callers
        must OR the filter with ``contains('"')``, see pushdown_filter)."""
        pieces = re.split(r"\s+", self.required_literal)
        return max(pieces, key=len) if pieces else ""


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
