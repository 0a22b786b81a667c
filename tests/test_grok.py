"""Grok compiler: JVM path == vectorized path == pure-Python match."""

import re

import pytest

from logagg.grok import (
    GrokPattern,
    _literal_runs,
    grok_extract_jvm,
    grok_extract_vectorized,
    pushdown_filter,
)

LINE_PATTERN = (
    "^%{LOGLEVEL:severity}\\s*\\| %{DATA:jvm} \\| %{TIMESTAMP_SLASH:ts} \\| "
    "%{NOTSPACE:source} \\| %{WORD:rtype} \\| %{GREEDYDATA:message}$"
)


def test_compile_and_match():
    p = GrokPattern(LINE_PATTERN)
    assert p.fields == ["severity", "jvm", "ts", "source", "rtype", "message"]
    d = p.match("INFO    | jvm 1 | 2022/07/11 09:12:02 | ttl.test | SMB | Exec proxy")
    assert d == {
        "severity": "INFO",
        "jvm": "jvm 1",
        "ts": "2022/07/11 09:12:02",
        "source": "ttl.test",
        "rtype": "SMB",
        "message": "Exec proxy",
    }
    assert p.match("no grok here") is None
    with pytest.raises(KeyError):
        GrokPattern("%{NOSUCH:x}")


def test_required_literal_extraction():
    """required_literal must be provably contained in EVERY match."""
    cases = {
        r"ErrorCode = %{INT:code} for %{PATH:err_path}": "ErrorCode = ",
        # token-BODY mining: JAVAFILE's pattern requires ".java" (longer
        # than the segment literal "at ")
        r"at %{JAVACLASS:cls}\(%{JAVAFILE:jfile}:%{INT:lineno}\)": ".java",
        # alternation token: the branch literals are NOT required
        r"%{LOGLEVEL:sev} happened": " happened",
        r"%{WORD:w}": "",
        # a quantified token's body is optional — only segments count
        r"x %{JAVAFILE:f}? y": "x ",
    }
    for expr, want in cases.items():
        p = GrokPattern(expr)
        assert p.required_literal == want, expr
        # the invariant itself: every matching string contains the literal
        if want:
            rx = re.compile(p.regex)
            for probe in (
                "ErrorCode = 17 for /a/b",
                "at com.x.Y(Z.java:3)",
                "INFO happened",
            ):
                if rx.search(probe):
                    assert want in probe
    # scan_literal is whitespace-free (joiner-safe for raw-text pushdown)
    p = GrokPattern(r"ErrorCode = %{INT:code} for %{PATH:err_path}")
    assert p.scan_literal == "ErrorCode"
    assert not re.search(r"\s", p.scan_literal)
    # a top-level alternation in ANY segment voids every segment's literal:
    # '9 bar' matches but contains neither 'foo ' nor ' bar'
    assert GrokPattern(r"foo %{INT:x}|%{INT:y} bar").required_literal == ""
    # escaped-backslash-then-pipe is a REAL alternation ('a\' | 'b ...')
    assert GrokPattern(r"a\\|b %{INT:x}").required_literal == ""
    # ...but an escaped pipe is a literal and keeps the segment safe
    assert GrokPattern(r"a\|b %{INT:x}").required_literal == "a|b "


def test_literal_runs_conservative():
    assert _literal_runs(r"abc\d+def") == ["abc", "def"]
    assert _literal_runs(r"a|b") == []  # alternation → nothing required
    assert _literal_runs(r"(ab)c") == []  # grouping → bail out
    assert _literal_runs(r"xy?z") == ["x", "z"]  # quantified char optional
    assert _literal_runs(r"foo\(bar\)") == ["foo(bar)"]  # escaped metachars
    assert _literal_runs(r"a{2,3}b") == ["b"]


def test_numeric_escape_soundness():
    """Round-4 verdict bug: ``\\xaa`` is ONE escape matching 'ª', but the
    old parser flushed at ``\\x`` and claimed the run "aa" — an unsound
    literal that made pushdown_filter silently drop matching rows. Numeric
    escapes must be consumed whole: decoded to their one char where
    knowable, voided otherwise."""
    # hex/unicode escapes decode to the exact char they match
    assert GrokPattern(r"\xaa").required_literal == "\xaa"
    assert GrokPattern(r"foo\x41bar").required_literal == "fooAbar"
    assert GrokPattern(r"éclair %{INT:n}").required_literal == "éclair "
    assert GrokPattern(r"\U0001F600 %{INT:n}").required_literal == "\U0001F600 "
    assert GrokPattern(r"\N{BULLET} item %{INT:n}").required_literal == "• item "
    # octal escapes and backreferences are ambiguous → variable, and their
    # digits must never leak into a claimed literal
    assert _literal_runs(r"\101bc") == ["bc"]
    assert _literal_runs(r"\0bc") == ["bc"]
    # a quantifier binds to the WHOLE decoded escape atom
    assert _literal_runs(r"ab\x61*") == ["ab"]
    # decoded char that happens to be a regex metachar stays literal
    assert _literal_runs(r"a\x2ab") == ["a*b"]
    # the invariant end-to-end: every match of the pattern contains the claim
    for expr in (r"\xaa", r"foo\x41bar", r"éclair %{INT:n}"):
        p = GrokPattern(expr)
        rx = re.compile(p.regex)
        import hypothesis.strategies as st
        from hypothesis import find

        probe = find(st.from_regex(p.regex), lambda s: rx.search(s) is not None)
        assert p.required_literal in probe, (expr, probe)


def test_pushdown_filter_never_drops_matching_pages(spark, pages_cache):
    """The scan-level pre-filter is conservative: grok extraction over the
    FILTERED pages equals extraction over ALL pages (same matches), and the
    filter actually prunes (most pages lack the literal)."""
    from logagg import parse
    from pyspark.sql import functions as F

    pat = GrokPattern(r"ErrorCode = %{INT:code} for %{PATH:err_path}")
    pages = spark.read.parquet(str(pages_cache / "pages.parquet"))
    filtered = pages.filter(pushdown_filter("text", pat))
    assert 0 < filtered.count() < pages.count()

    def matches(src):
        parsed = parse.parsed_records(src, columns=["record_idx", "message"])
        out = grok_extract_vectorized(
            parsed.select("url", "record_idx", "message"), "message", pat
        )
        rows = out.filter(F.col("code") != "").collect()
        return {(r["url"], r["record_idx"], r["code"], r["err_path"]) for r in rows}

    assert matches(filtered) == matches(pages)


def test_pushdown_filter_no_literal_is_noop(spark, pages_cache):
    pat = GrokPattern(r"%{WORD:w}")
    pages = spark.read.parquet(str(pages_cache / "pages.parquet"))
    assert pages.filter(pushdown_filter("text", pat)).count() == pages.count()


def test_jvm_and_vectorized_agree(spark, pages_cache):
    frames = GrokPattern(r"at %{JAVACLASS:cls}\(%{JAVAFILE:file}:%{INT:lineno}\)")
    pages = spark.read.parquet(str(pages_cache / "pages.parquet")).limit(200)
    a = (
        grok_extract_jvm(pages.select("url", "text"), "text", frames)
        .select("url", "cls", "file", "lineno")
        .collect()
    )
    b = (
        grok_extract_vectorized(pages.select("url", "text"), "text", frames)
        .select("url", "cls", "file", "lineno")
        .collect()
    )
    am = {r["url"]: (r["cls"], r["file"], r["lineno"]) for r in a}
    bm = {r["url"]: (r["cls"], r["file"], r["lineno"]) for r in b}
    assert am == bm
    assert any(v[0] for v in am.values())  # stacktraces exist in the corpus


def test_required_literal_class_spanning_token():
    """An unescaped class bracket in a SEGMENT can swallow later segments
    and tokens — '[%{WORD:w}xy]' is one class; 'xy' is not required (the
    regex matches a single '(' char). Must void the whole expression."""
    assert GrokPattern(r"[%{WORD:w}xy]").required_literal == ""
    assert GrokPattern(r"x] %{INT:n}").required_literal == ""  # stray bracket


def test_required_literal_bracket_balance():
    """Balance-aware class handling: a self-contained class in a segment
    keeps its literals (pushdown preserved), while stray/unclosed brackets
    — including in user-supplied LIBRARY bodies — void the claim."""
    assert GrokPattern(r"err[0-9]code %{WORD:w}").required_literal == "code "
    # review repro: '(?:[a)(?:b])' is ONE class matching 'a' — 'b' is not
    # required; the stray ']' in body B must void that body's runs
    p = GrokPattern("%{A}%{B}", library={"A": "[a", "B": "b]"})
    assert p.required_literal == ""
