"""Web link graph: href extraction from crawled HTML, host-graph rollup,
and distributed PageRank — the host-authority quality signal web-corpus
curation ranks domains by (the public Common Crawl host ranks are exactly
this computation at 100 TB).

Reference scope note: the reference's graph-free pipeline ends at per-log
aggregates (aggregator/logs.py); the webtext corpus those pages form IS a
graph, and domain authority is a first-class curation feature. Three
operators:

* :func:`extract_links` — one map-only Arrow pass over ``(url, html)``:
  stdlib tag-soup parser collects ``<a href>``, resolves each against the
  page URL (RFC 3986 join), drops fragments and non-http(s) schemes.
  Kernel single-sourced in :func:`extract_links_py`.
* :func:`host_graph` — ``(src_host, dst_host, n_links)`` edge rollup: one
  partial+final hash aggregation, self-loops dropped (intra-host nav bars
  would otherwise dominate every host's rank).
* :func:`pagerank` — power iteration with the standard damping + uniform
  teleport + dangling-mass redistribution (Page et al. 1999, public).
  Each iteration: contributions = edges ⋈ ranks on ``src`` → ONE
  ``sum`` aggregation on ``dst``. Edges are hash-partitioned on ``src``
  once and persisted, so every iteration's join reuses that layout and
  only the (#nodes-sized) rank table shuffles. Lineage is cut every
  iteration (parquet checkpoint on a cluster, ``localCheckpoint``
  locally — the dup_clusters contract, including the non-local-master
  guard), so 50 iterations never build a 50-deep plan. Convergence =
  L1 delta below ``tol`` (one scalar per iteration off an aggregate —
  the only driver traffic); a non-converged run RAISES rather than
  returning silently-wrong ranks.

Determinism note: float sums depend on reduction order, so ranks are
reproducible only to ~1e-12 relative across partitionings — the twin
check (dense numpy power iteration, same damping/dangling math) asserts
agreement to 1e-9, not bit equality. Content-hash tie-breaks are not
needed: rank VALUES, not orderings, are the output.
"""

from __future__ import annotations

import re
from typing import Iterator
from urllib.parse import urljoin, urlparse

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logagg import util

LINKS_SCHEMA = "url string, dst_url string, anchor string"


# ---------------------------------------------------------------------------
# link extraction
# ---------------------------------------------------------------------------

def extract_links_py(url: str, html: bytes | str) -> list[dict]:
    """All resolved outlinks of one page: ``{dst_url, anchor}`` rows.
    http(s) only, fragment stripped, anchor text whitespace-collapsed and
    capped (anchors are a relevance signal, not a text corpus)."""
    from html.parser import HTMLParser

    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")

    links: list[dict] = []

    class _P(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.href: str | None = None
            self.anchor: list[str] = []

        def _flush(self) -> None:
            if self.href is None:
                return
            try:
                dst = urljoin(url, self.href)
            except ValueError:
                dst = None
            if dst:
                dst = dst.split("#", 1)[0]
                if dst.startswith(("http://", "https://")):
                    links.append(
                        {
                            "dst_url": dst,
                            "anchor": re.sub(r"\s+", " ", " ".join(self.anchor)).strip()[
                                :200
                            ],
                        }
                    )
            self.href = None
            self.anchor = []

        def handle_starttag(self, tag: str, attrs) -> None:
            if tag == "a":
                self._flush()  # tag-soup: unclosed <a> flushed by the next
                for k, v in attrs:
                    if k == "href" and v:
                        self.href = v.strip()
                        break

        def handle_endtag(self, tag: str) -> None:
            if tag == "a":
                self._flush()

        def handle_data(self, data: str) -> None:
            if self.href is not None and data:
                self.anchor.append(data)

    p = _P()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # tag-soup beyond the parser: keep what was collected
    p._flush()
    return links


def extract_links(
    pages: DataFrame, *, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """``(url, html)`` → ``(url, dst_url, anchor)`` outlink table. One
    Arrow pass, zero shuffles (plan-pinned in tests)."""
    src = pages.select(F.col(url_col).alias("url"), F.col(html_col).alias("_h"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for u, h in zip(pdf["url"], pdf["_h"]):
                for r in extract_links_py(u, h):
                    r["url"] = u
                    out.append(r)
            yield pd.DataFrame(out, columns=["url", "dst_url", "anchor"])

    return src.mapInPandas(kernel, schema=LINKS_SCHEMA)


def host_graph(links: DataFrame, *, keep_self_loops: bool = False) -> DataFrame:
    """Outlink table → weighted host edge list ``(src, dst, n_links)``.
    One hash aggregation; junk/unparseable hosts drop (no vertex to credit)."""
    e = links.select(
        F.lower(F.try_parse_url("url", F.lit("HOST"))).alias("src"),
        F.lower(F.try_parse_url("dst_url", F.lit("HOST"))).alias("dst"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if not keep_self_loops:
        e = e.filter(F.col("src") != F.col("dst"))
    return e.groupBy("src", "dst").agg(F.count("*").alias("n_links"))


# ---------------------------------------------------------------------------
# anchor-text aggregation
# ---------------------------------------------------------------------------

def anchor_stats(links: DataFrame, *, top_k: int = 3) -> DataFrame:
    """Per-target anchor rollup — the classic off-page relevance signal
    (what OTHER pages call this page): ``(dst_url, n_inlinks,
    n_src_hosts, top_anchors)``.

    ``top_anchors`` = the ``top_k`` most frequent normalized anchor
    strings — lowercased, ASCII-whitespace runs collapsed to one space
    (the pinned cross-engine class: Java ``\\s``), trimmed, non-empty —
    count-desc then lexical: a total order, so the list is deterministic
    across partitionings.

    Scale shape: both aggregations shuffle on ``dst_url`` (the same key,
    so AQE coalesces them into one exchange reuse); the per-anchor top-k
    is a ``row_number`` window over (dst_url) — partial aggregation has
    already collapsed each (dst_url, anchor) to one row, so the window
    input is bounded by distinct-anchor count, not inlink count. A
    skew-hot page (millions of inlinks) is therefore reduced map-side
    before any single task sees it; no ``collect_list`` of raw inlinks
    ever materializes.
    """
    from pyspark.sql import Window

    a = links.select(
        F.col("dst_url"),
        F.lower(F.try_parse_url("url", F.lit("HOST"))).alias("_src_host"),
        F.trim(
            F.regexp_replace(F.lower(F.col("anchor")), "[ \\t\\n\\x0b\\f\\r]+", " ")
        ).alias("_anchor"),
    )
    stats = a.groupBy("dst_url").agg(
        F.count("*").alias("n_inlinks"),
        F.count_distinct("_src_host").alias("n_src_hosts"),
    )
    per_anchor = (
        a.filter(F.col("_anchor") != "")
        .groupBy("dst_url", "_anchor")
        .agg(F.count("*").alias("_n"))
    )
    w = Window.partitionBy("dst_url").orderBy(F.desc("_n"), F.asc("_anchor"))
    top = (
        per_anchor.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= top_k)
        .groupBy("dst_url")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_rk", "_anchor"))),
                lambda s: s["_anchor"],
            ).alias("top_anchors")
        )
    )
    return stats.join(top, "dst_url", "left").select(
        "dst_url",
        "n_inlinks",
        "n_src_hosts",
        F.coalesce("top_anchors", F.array().cast("array<string>")).alias(
            "top_anchors"
        ),
    )


def anchor_stats_py(
    rows: list[tuple[str, str, str]], *, top_k: int = 3
) -> dict[str, tuple[int, int, list[str]]]:
    """Driver-side twin of :func:`anchor_stats` over ``(url, dst_url,
    anchor)`` tuples, for differential tests."""
    from collections import Counter, defaultdict

    inlinks: Counter = Counter()
    hosts: dict[str, set] = defaultdict(set)
    anchors: dict[str, Counter] = defaultdict(Counter)
    for url, dst, anchor in rows:
        inlinks[dst] += 1
        h = urlparse(url).hostname
        if h:  # count_distinct skips NULL — unparseable srcs don't count
            hosts[dst].add(h.lower())
        a = re.sub(r"[ \t\n\x0b\f\r]+", " ", anchor.lower()).strip(" ")
        if a:
            anchors[dst][a] += 1
    out = {}
    for dst in inlinks:
        top = sorted(anchors[dst].items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        out[dst] = (inlinks[dst], len(hosts[dst]), [a for a, _ in top])
    return out


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def pagerank(
    edges: DataFrame,
    *,
    damping: float = 0.85,
    max_iter: int = 40,
    tol: float = 1e-6,
    weighted: bool = False,
    checkpoint_every: int = 5,
    partitions: int | None = None,
    materialize: str = "local",
    out_path: str | None = None,
    on_max_iter: str = "raise",
) -> DataFrame:
    """Power-iteration PageRank over ``(src, dst[, n_links])`` →
    ``(node, rank)`` summing to 1.

    ``weighted=True`` splits a page's vote by edge weight (``n_links``)
    instead of uniformly across distinct out-neighbors. Dangling nodes
    (no out-edges) spread their mass uniformly — the standard stochastic
    completion, matched exactly by the numpy twin in tests.

    Iteration shape (the plan that survives 100×): edges repartitioned on
    ``src`` ONCE and persisted; per iteration one join on ``src`` (rank
    table is #nodes-sized — tiny next to edges), one ``sum`` agg on
    ``dst``, two scalar aggregates (dangling mass, L1 delta). Lineage cut
    every ``checkpoint_every`` iterations via the dup_clusters checkpoint
    contract: a configured ``sparkContext`` checkpoint dir (executor-
    reachable by contract) gets a fresh subdir, left in place; otherwise a
    driver-local temp dir — allowed only on a local master, refused
    elsewhere — removed on return after the (#hosts-sized, bounded)
    result is materialized. ``materialize="path"`` + ``out_path`` lands
    the ranks in parquet instead — the 100 TB result shape (a page-level
    graph's rank table is corpus-sized; it never visits the driver).

    ``on_max_iter``: ``"raise"`` (default) refuses to return ranks that
    have not met ``tol`` — the audit contract. ``"return"`` hands back the
    ``max_iter``-step ranks regardless — the fixed-iteration-budget mode
    production host-rank jobs actually run (published web host ranks are
    fixed-budget power iterations; beyond ~an L1 delta of 1e-4 the
    ORDERING of hosts is already stable even though the values drift)."""
    import shutil
    import tempfile
    import uuid

    spark = edges.sparkSession
    if on_max_iter not in ("raise", "return"):
        raise ValueError(
            f"on_max_iter must be 'raise' or 'return', got {on_max_iter!r}"
        )
    if materialize not in ("local", "path"):
        raise ValueError(f"materialize must be 'local' or 'path', got {materialize!r}")
    if materialize == "path" and not out_path:
        raise ValueError("materialize='path' requires out_path")
    sc_ckpt = spark.sparkContext.getCheckpointDir()
    if sc_ckpt:
        base = f"{sc_ckpt.rstrip('/')}/logagg-pr-{uuid.uuid4().hex[:8]}"
        owns_tmp = False
    elif spark.conf.get("spark.master", "").startswith("local"):
        base = tempfile.mkdtemp(prefix="logagg-pr-")
        owns_tmp = True
    else:
        raise ValueError(
            "pagerank needs spark.sparkContext.setCheckpointDir (executor-"
            "reachable storage) on a non-local master — the default "
            "checkpoint location is a driver-local temp dir"
        )

    n_cuts = [0]

    def cut(df: DataFrame) -> DataFrame:
        # unique dir per cut, nothing reused or deleted mid-run: an evicted
        # persisted intermediate may recompute from lineage that reads ANY
        # earlier cut, so overwriting one is silent corruption
        path = f"{base}/iter_{n_cuts[0]}"
        n_cuts[0] += 1
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    w = F.col("n_links").cast("double") if weighted else F.lit(1.0)
    e = edges.select(
        F.col("src").cast("string"),
        F.col("dst").cast("string"),
        w.alias("w"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if partitions:
        e = e.repartition(partitions, "src")
    else:
        e = e.repartition("src")
    # per-src normalized vote share: w / total outgoing weight
    out_w = e.groupBy("src").agg(F.sum("w").alias("_ow"))
    e = e.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("_ow")).alias("share")
    )
    e = e.persist()

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        empty = spark.createDataFrame([], "node string, rank double")
        if owns_tmp:
            shutil.rmtree(base, ignore_errors=True)
        if materialize == "path":
            return util.materialize(empty, mode="path", path=out_path)
        return empty
    src_nodes = e.select(F.col("src").alias("_src_node")).distinct()

    ranks = cut(nodes.select("node", F.lit(1.0 / n).alias("rank")))
    # initial dangling mass (one scalar job; subsequent iterations fold it
    # into the delta aggregate — ONE driver round-trip per iteration)
    dangling = (
        ranks.join(src_nodes, ranks["node"] == src_nodes["_src_node"], "left_anti")
        .agg(F.sum("rank"))
        .collect()[0][0]
        or 0.0
    )
    converged = False
    for it in range(max_iter):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select("dst", (F.col("share") * F.col("rank")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        teleport = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 or it == max_iter - 1:
            new_ranks = cut(new_ranks)
        else:
            new_ranks = new_ranks.persist()
        # one aggregate drives BOTH the stop rule (L1 delta vs old ranks)
        # and the NEXT round's dangling mass (rank parked on non-src nodes);
        # it is also the job that populates new_ranks' cache
        row = (
            new_ranks.join(ranks.withColumnRenamed("rank", "_old"), "node")
            .join(src_nodes, F.col("node") == src_nodes["_src_node"], "left")
            .agg(
                F.sum(F.abs(F.col("rank") - F.col("_old"))).alias("delta"),
                F.sum(F.when(src_nodes["_src_node"].isNull(), F.col("rank"))).alias(
                    "dang"
                ),
            )
            .collect()[0]
        )
        delta = row["delta"]
        dangling = row["dang"] or 0.0
        ranks.unpersist()
        ranks = new_ranks
        if delta is not None and delta < tol:
            converged = True
            break
    e.unpersist()
    nodes.unpersist()
    try:
        if not converged and on_max_iter == "raise":
            raise RuntimeError(
                f"pagerank did not converge in {max_iter} iterations "
                f"(last L1 delta {delta:.3e} ≥ tol {tol:.1e}); raise max_iter "
                "or loosen tol"
            )
        if materialize == "path":
            return util.materialize(ranks, mode="path", path=out_path)
        return util.materialize_local(ranks)
    finally:
        ranks.unpersist()
        if owns_tmp:
            shutil.rmtree(base, ignore_errors=True)


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-node degree table from a weighted edge list —
    ``(node, out_deg, in_deg, out_links, in_links)`` where ``*_deg``
    counts distinct neighbors and ``*_links`` sums edge weights. Two
    partial+final aggregations + one full-outer join on the node key;
    absent sides coalesce to 0 (a pure sink has out_deg 0, not a missing
    row). The first sanity read of any crawl's graph (degree skew tells
    you whether the PageRank edge partitioning needs salting)."""
    o = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_deg"), F.sum("n_links").alias("out_links")
    )
    i = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("in_deg"), F.sum("n_links").alias("in_links")
    )
    return o.join(i, "node", "full").select(
        "node",
        *[
            F.coalesce(c, F.lit(0)).alias(c)
            for c in ("out_deg", "out_links", "in_deg", "in_links")
        ],
    )


def host_scorecard(
    docs: DataFrame,
    ranks: DataFrame,
    *,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Per-host curation scorecard: corpus footprint × link authority —
    ``(host, n_docs, n_tokens, mean_quality, rank)``.

    One partial+final aggregation over the docs (host key), then a join
    with the (host-sized) rank table; hosts absent from the graph keep
    ``rank = 0.0`` (no authority evidence ≠ dropped). This is the table a
    corpus owner eyeballs to decide mixing policy, and the input
    :func:`authority_weights` turns into per-host sampling rates."""
    from logagg import textstats

    per_host = (
        docs.select(
            F.coalesce(
                F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST"))),
                F.lit("\x00invalid"),
            ).alias("host"),
            textstats.token_count(F.col(text_col)).alias("_nt"),
            textstats.quality_score(
                F.col(text_col), F.length(text_col).cast("long")
            ).alias("_q"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_nt").alias("n_tokens"),
            F.avg("_q").alias("mean_quality"),
        )
    )
    r = ranks.select(F.col("node").alias("host"), "rank")
    return per_host.join(r, "host", "left").select(
        "host",
        "n_docs",
        "n_tokens",
        "mean_quality",
        F.coalesce("rank", F.lit(0.0)).alias("rank"),
    )


def authority_weights(
    scorecard: DataFrame,
    *,
    floor: float = 0.1,
    cap: float = 3.0,
    target_total: int | None = None,
) -> DataFrame:
    """Per-host sampling rates from the scorecard: a host's raw rate is
    its authority-per-document ratio ``(rank share) / (doc share)`` —
    hosts whose link authority outruns their corpus footprint get
    upsampled, link-farm-sized footprints with no authority get
    downsampled — clipped to ``[floor, cap]`` (teleport mass guarantees
    every host a nonzero rank, but the clip is the policy guardrail),
    then rescaled so the EXPECTED mixture size is ``target_total``
    documents (default: the input size — reweight without growing).

    Everything stays distributed: two scalar aggregates (corpus totals,
    expected size) are the only driver traffic; the returned
    ``(host, weight)`` table feeds :func:`logagg.mix.mix_sources_df`
    directly. Note the post-scale weight can exceed ``cap`` — the clip
    bounds the RELATIVE spread, the rescale preserves corpus size."""
    totals = scorecard.agg(
        F.sum("n_docs").alias("nd"), F.sum("rank").alias("nr")
    ).collect()[0]
    n_docs_total, rank_total = totals["nd"], totals["nr"]
    if not n_docs_total:
        return scorecard.sparkSession.createDataFrame(
            [], "host string, weight double"
        )
    budget = float(target_total if target_total is not None else n_docs_total)
    rank_share = (
        (F.col("rank") / F.lit(rank_total)) if rank_total else F.lit(0.0)
    )
    doc_share = F.col("n_docs") / F.lit(float(n_docs_total))
    raw = F.least(
        F.greatest(rank_share / doc_share, F.lit(float(floor))), F.lit(float(cap))
    )
    w = scorecard.select("host", "n_docs", raw.alias("_raw"))
    expected = w.agg(F.sum(F.col("_raw") * F.col("n_docs"))).collect()[0][0]
    scale = budget / expected if expected else 0.0
    return w.select("host", (F.col("_raw") * F.lit(scale)).alias("weight"))


def pagerank_py(
    edges: list[tuple[str, str, float]],
    *,
    damping: float = 0.85,
    max_iter: int = 200,
    tol: float = 1e-12,
    weighted: bool = False,
) -> dict[str, float]:
    """Dense numpy twin — same damping/teleport/dangling math, driver-side,
    for differential tests on small graphs."""
    import numpy as np

    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    if n == 0:
        return {}
    M = np.zeros((n, n))
    out_w = np.zeros(n)
    for s, d, w in edges:
        ww = w if weighted else 1.0
        M[idx[d], idx[s]] += ww
        out_w[idx[s]] += ww
    nz = out_w > 0
    M[:, nz] /= out_w[nz]
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        dangling = r[~nz].sum()
        new = (1 - damping) / n + damping * (M @ r + dangling / n)
        if np.abs(new - r).sum() < tol:
            r = new
            break
        r = new
    return {v: float(r[idx[v]]) for v in nodes}
