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
