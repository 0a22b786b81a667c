"""Property-based contracts: as-of join vs a per-row oracle over randomized
tables (NULL values, timestamp ties, keys with no matches), and the grok
compiler vs plain Python re on randomized patterns."""

from datetime import datetime, timedelta

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from logagg.asof import asof_join
from logagg.grok import GROK_LIBRARY, GrokPattern

BASE = datetime(2024, 1, 1)

# one shared micro-table strategy: (key, minute-offset, value-or-None)
LEFT = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=12
)
RIGHT = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100), st.one_of(st.none(), st.integers(0, 99))),
    min_size=0,
    max_size=12,
)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(max_examples=25, deadline=None)
@given(left_rows=LEFT, right_rows=RIGHT)
def test_asof_join_property(_spark, left_rows, right_rows):
    spark = _spark
    left = spark.createDataFrame(
        [(i, k, BASE + timedelta(minutes=m)) for i, (k, m) in enumerate(left_rows)],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, BASE + timedelta(minutes=m), v) for (k, m, v) in right_rows],
        "k long, ts timestamp, v long",
    )
    got = {
        r["event_id"]: r["v"]
        for r in asof_join(left, right, key="k", ts="ts", value_cols=["v"]).collect()
    }
    assert set(got) == set(range(len(left_rows)))
    for i, (k, m) in enumerate(left_rows):
        # oracle: the value of the LATEST right row at-or-before, ties by
        # max m (any of the tied rows — value must match one of them)
        prior = [(rm, v) for (rk, rm, v) in right_rows if rk == k and rm <= m]
        if not prior:
            assert got[i] is None, (i, k, m)
        else:
            best_m = max(rm for rm, _ in prior)
            allowed = {v for rm, v in prior if rm == best_m}
            assert got[i] in allowed, (i, k, m, got[i], allowed)


LITERALS = st.text(alphabet="abcxyz_ ", min_size=0, max_size=6)
PATTERN_NAMES = st.sampled_from(sorted(set(GROK_LIBRARY) - {"DATA", "GREEDYDATA"}))


@settings(max_examples=50, deadline=None)
@given(
    lit1=LITERALS,
    lit2=LITERALS,
    name1=PATTERN_NAMES,
    name2=PATTERN_NAMES,
    subject=st.text(alphabet="abcx yz0189./_:()INFO-", min_size=0, max_size=40),
)
def test_grok_compiler_matches_plain_re(lit1, lit2, name1, name2, subject):
    import re

    pat = GrokPattern(f"{re.escape(lit1)}%{{{name1}:f1}}{re.escape(lit2)}%{{{name2}:f2}}")
    expected_re = (
        f"{re.escape(lit1)}({GROK_LIBRARY[name1]}){re.escape(lit2)}({GROK_LIBRARY[name2]})"
    )
    assert pat.regex == expected_re and pat.fields == ["f1", "f2"]
    m = re.search(expected_re, subject)
    got = pat.match(subject)
    if m is None:
        assert got is None
    else:
        assert got == {"f1": m.group(1), "f2": m.group(2)}


# ---- url-meta expressions vs a pure-Python re oracle --------------------
# The reference Hypothesis-tests its filename→dir derivation
# (tests/test_helper.py:197-207); the analog here is the url→node/log_type/
# host JVM regexes (schemas.py), fuzzed against Python re over adversarial
# url shapes: missing segments, ports, empty hosts, trailing junk,
# uppercase schemes, stray slashes.

_URL_CHARS = "abcz09.:-_~%# /ABZ"

_segment = st.text(alphabet=_URL_CHARS.replace("/", ""), min_size=0, max_size=6)
_urls = st.lists(
    st.one_of(
        # structured: scheme://host/seg/seg... with shape mutations
        st.builds(
            lambda scheme, sep, host, segs, trail: scheme + sep + host + (
                ("/" + "/".join(segs)) if segs else ""
            ) + trail,
            st.sampled_from(["http", "https", "HTTP", "ftp", "x", ""]),
            st.sampled_from(["://", ":/", "//", ""]),
            st.one_of(_segment, st.just("h.example.com:8443")),
            st.lists(_segment, min_size=0, max_size=4),
            st.sampled_from(["", "/", "//"]),
        ),
        # unstructured noise
        st.text(alphabet=_URL_CHARS, min_size=0, max_size=40),
    ),
    min_size=1,
    max_size=40,
)


def _py_regexp_extract(pattern: str, s: str) -> str:
    """regexp_extract contract in Python re: '' on no match (and '' for an
    unparticipating group)."""
    import re as _re

    m = _re.search(pattern, s)
    if m is None:
        return ""
    return m.group(1) or ""


@settings(max_examples=30, deadline=None)
@given(urls=_urls)
def test_url_meta_matches_python_re(_spark, urls):
    from logagg.schemas import HOST_RE, LOGTYPE_RE, NODE_RE

    spark = _spark
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    from logagg.parse import with_url_meta

    got = {
        r["url"]: (r["node"], r["log_type"], r["host"])
        for r in with_url_meta(df).collect()
    }
    for u in set(urls):
        want = (
            _py_regexp_extract(NODE_RE, u),
            _py_regexp_extract(LOGTYPE_RE, u),
            _py_regexp_extract(HOST_RE, u),
        )
        assert got[u] == want, repr(u)


# ---- required_literal soundness over RANDOM grok expressions ------------
# The literal pre-filter's whole contract is: every string matching the
# compiled pattern contains required_literal. st.from_regex generates
# matching strings directly from the compiled regex — a generative oracle
# that exercises segment literals, token bodies, quantified tokens,
# alternations, classes (including ones spanning token boundaries), and
# escape sequences far beyond the hand-written cases.

_SEG_ALPHA = "ab |()[]{}\\?*+.x:=-"
_GROK_TOKENS = [
    "%{WORD:w}", "%{INT:i}", "%{LOGLEVEL:l}", "%{JAVAFILE:f}",
    "%{DATA:d}", "%{PATH:p}", "%{NUMBER:n}", "%{JAVACLASS:c}",
]
_grok_exprs = st.lists(
    st.one_of(
        st.text(alphabet=_SEG_ALPHA, min_size=0, max_size=8),
        st.sampled_from(_GROK_TOKENS),
    ),
    min_size=1,
    max_size=5,
).map("".join)


@settings(max_examples=300, deadline=None)
@given(data=st.data())
def test_required_literal_soundness_fuzz(data):
    import re as _re

    from hypothesis import assume

    from logagg.grok import GrokPattern

    expr = data.draw(_grok_exprs)
    try:
        # fuzz-built class syntax like '[[' makes re emit FutureWarning
        # ("possible nested set"); escalate it locally and reject those
        # inputs the same way as outright re.error — ambiguous class syntax
        # is not a pattern the engine claims to support
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error", FutureWarning)
            p = GrokPattern(expr)
            _re.compile(p.regex)
    except (KeyError, _re.error, FutureWarning):
        assume(False)
        return
    lit = p.required_literal
    if not lit:
        return  # nothing claimed, nothing to violate
    probe = data.draw(st.from_regex(p.regex))
    # probe CONTAINS a match of the pattern; the claimed literal must be in it
    assert lit in probe, (expr, p.regex, lit, probe)
