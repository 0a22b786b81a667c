"""Round-6 reuse contract: the extracted outlink table is materialized
once per (session, sf) and shared by every link_* query (VERDICT r5 ask:
"selfcheck sweep runs one extract_links pass")."""

import pytest

from tests.conftest import SF_SMOKE


def test_links_extraction_runs_once_per_session(spark, pages_cache, monkeypatch):
    import __spark_entry__ as entrymod
    from logagg import linkgraph

    entrymod._LINKS_MEMO.clear()
    calls = {"n": 0}
    real = linkgraph.extract_links

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(linkgraph, "extract_links", counting)

    first = entrymod._links(spark, SF_SMOKE)
    n_first = first.count()
    second = entrymod._links(spark, SF_SMOKE)
    n_second = second.count()

    # one Arrow extraction pass; the second call reads the landed parquet
    assert calls["n"] == 1
    assert n_first == n_second
    # identical content, not merely identical counts
    assert first.exceptAll(second).count() == 0
    assert second.exceptAll(first).count() == 0


def test_links_memo_invalidated_by_new_application(spark, pages_cache):
    import __spark_entry__ as entrymod

    entrymod._LINKS_MEMO.clear()
    entrymod._links(spark, SF_SMOKE).count()
    app, path = entrymod._LINKS_MEMO[SF_SMOKE]
    assert app == spark.sparkContext.applicationId
    # a stale applicationId must force recomputation (memo keyed to the
    # session exactly like _PAIRS_MEMO)
    entrymod._LINKS_MEMO[SF_SMOKE] = ("app-from-a-dead-session", path)
    entrymod._links(spark, SF_SMOKE).count()
    assert entrymod._LINKS_MEMO[SF_SMOKE] == (app, path)
