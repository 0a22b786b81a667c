"""Grok compiler: JVM path == vectorized path == pure-Python match."""

import pytest

from logagg.grok import GrokPattern, grok_extract_jvm, grok_extract_vectorized

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
