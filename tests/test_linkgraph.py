"""Link graph: href extraction semantics, host rollup, and PageRank vs the
dense numpy twin (incl. dangling mass, weights, convergence raise)."""

import pytest

from pyspark.sql import functions as F

from logagg import linkgraph


# ---------------------------------------------------------------------------
# extraction kernel
# ---------------------------------------------------------------------------

def test_extract_links_py_resolution_and_filters():
    html = b"""<html><body>
      <a href="/rel/path">Rel</a>
      <a href="other.html">Sibling</a>
      <a href="http://b.example.org/abs#frag">Abs <b>bold</b> text</a>
      <a href="mailto:x@y.z">mail</a>
      <a href="javascript:void(0)">js</a>
      <a href="//cdn.example.net/x">proto-relative</a>
      <a name="anchor-only">no href</a>
    </body></html>"""
    links = linkgraph.extract_links_py("http://a.example.com/dir/page.html", html)
    got = {l["dst_url"]: l["anchor"] for l in links}
    assert got == {
        "http://a.example.com/rel/path": "Rel",
        "http://a.example.com/dir/other.html": "Sibling",
        "http://b.example.org/abs": "Abs bold text",
        "http://cdn.example.net/x": "proto-relative",
    }


def test_extract_links_py_tag_soup():
    # unclosed <a>, nested junk, truncated tail
    html = "<a href='/one'>first <a href='/two'>second</a> trailing <a href='/three'>last"
    links = linkgraph.extract_links_py("http://h.example.com/", html)
    assert [l["dst_url"] for l in links] == [
        "http://h.example.com/one",
        "http://h.example.com/two",
        "http://h.example.com/three",
    ]


def test_extract_links_spark_matches_kernel_and_plan(spark, pages_cache):
    pages = spark.read.parquet(f"{pages_cache}/pages.parquet")
    plan = (
        linkgraph.extract_links(pages)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # map-only (limit() would add one — n/a here)
    sample = pages.filter(F.crc32(F.col("url").cast("binary")) % 16 == 0)
    got = linkgraph.extract_links(sample).toPandas()
    pdf = sample.toPandas()
    want = []
    for u, h in zip(pdf["url"], pdf["html"]):
        for r in linkgraph.extract_links_py(u, h):
            want.append((u, r["dst_url"], r["anchor"]))
    assert sorted(map(tuple, got.itertuples(index=False))) == sorted(want)


# ---------------------------------------------------------------------------
# anchor-text aggregation
# ---------------------------------------------------------------------------

def test_anchor_stats_matches_twin(spark):
    rows = [
        # (src url, dst, anchor) — t.com gets 4 inlinks from 2 hosts;
        # "click here" wins on count, then lexical ties
        ("http://a.com/1", "http://t.com/", "Click  HERE"),
        ("http://a.com/2", "http://t.com/", "click here "),
        ("http://b.com/x", "http://t.com/", "best page"),
        ("http://b.com/y", "http://t.com/", "awesome page"),
        ("http://a.com/1", "http://u.com/", ""),  # empty anchor: counts as inlink only
        ("not a url", "http://u.com/", "U"),  # unparseable src host
    ]
    links = spark.createDataFrame(rows, "url string, dst_url string, anchor string")
    got = {
        r["dst_url"]: (r["n_inlinks"], r["n_src_hosts"], r["top_anchors"])
        for r in linkgraph.anchor_stats(links, top_k=2).collect()
    }
    want = linkgraph.anchor_stats_py(rows, top_k=2)
    assert got == want
    assert got["http://t.com/"] == (4, 2, ["click here", "awesome page"])
    assert got["http://u.com/"] == (2, 1, ["u"])


def test_anchor_stats_corpus_scale_invariants(spark, pages_cache):
    pages = spark.read.parquet(f"{pages_cache}/pages.parquet")
    footer = F.concat(
        F.lit(b'<a href="http://h'),
        F.lpad((F.crc32(F.col("url").cast("binary")) % 7).cast("string"), 3, "0"),
        F.lit(b'.example.com/">next page</a>'),
    )
    # v11 corpora carry native outlink footers (synth._link_footer) — this
    # invariant needs the controlled footer to be the ONLY links, so replace
    # the html instead of appending (native links are covered by the
    # extract-twin test above and the link_* oracle queries)
    linked = pages.withColumn("html", footer.cast("binary"))
    links = linkgraph.extract_links(linked)
    stats = linkgraph.anchor_stats(links).persist()
    assert stats.count() == 7
    total = stats.agg(F.sum("n_inlinks")).collect()[0][0]
    assert total == links.count()
    for r in stats.collect():
        assert r["top_anchors"] == ["next page"]
    stats.unpersist()


# ---------------------------------------------------------------------------
# host graph + pagerank
# ---------------------------------------------------------------------------

@pytest.fixture()
def toy_edges(spark):
    # a.com -> b.com twice, a -> c, b -> c, c -> a ; d.com dangling target
    rows = [
        ("http://a.com/1", "http://b.com/x"),
        ("http://a.com/2", "http://b.com/y"),
        ("http://a.com/1", "http://c.com/"),
        ("http://a.com/1", "http://a.com/self"),  # self-loop, dropped
        ("http://b.com/x", "http://c.com/z"),
        ("http://c.com/", "http://a.com/1"),
        ("http://c.com/", "http://d.com/end"),  # d has no out-edges
    ]
    links = spark.createDataFrame(
        [(s, d, "") for s, d in rows], "url string, dst_url string, anchor string"
    )
    return linkgraph.host_graph(links)


def test_host_graph_rollup(toy_edges):
    got = {(r["src"], r["dst"]): r["n_links"] for r in toy_edges.collect()}
    assert got == {
        ("a.com", "b.com"): 2,
        ("a.com", "c.com"): 1,
        ("b.com", "c.com"): 1,
        ("c.com", "a.com"): 1,
        ("c.com", "d.com"): 1,
    }


def _edge_tuples(edges_df):
    return [(r["src"], r["dst"], float(r["n_links"])) for r in edges_df.collect()]


@pytest.mark.parametrize("weighted", [False, True])
def test_pagerank_matches_numpy_twin(spark, toy_edges, weighted):
    ranks = {
        r["node"]: r["rank"]
        for r in linkgraph.pagerank(
            toy_edges, tol=1e-10, max_iter=200, weighted=weighted
        ).collect()
    }
    want = linkgraph.pagerank_py(_edge_tuples(toy_edges), weighted=weighted)
    assert set(ranks) == set(want)
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    for node in want:
        assert ranks[node] == pytest.approx(want[node], abs=1e-8), node
    # sanity: c has the most in-mass in the unweighted toy graph
    if not weighted:
        assert max(ranks, key=ranks.get) == "c.com"


def test_pagerank_dangling_only_graph(spark):
    # one edge a->b; b dangling. Closed-form stationary point exists.
    e = spark.createDataFrame(
        [("a", "b", 1)], "src string, dst string, n_links long"
    )
    ranks = {r["node"]: r["rank"] for r in linkgraph.pagerank(e, tol=1e-12).collect()}
    want = linkgraph.pagerank_py([("a", "b", 1.0)])
    for n in want:
        assert ranks[n] == pytest.approx(want[n], abs=1e-9)
    assert ranks["b"] > ranks["a"]


def test_pagerank_partitioning_invariant(spark, toy_edges):
    a = linkgraph.pagerank(toy_edges, tol=1e-10, partitions=1).collect()
    b = linkgraph.pagerank(toy_edges.repartition(5), tol=1e-10, partitions=7).collect()
    ra = {r["node"]: r["rank"] for r in a}
    rb = {r["node"]: r["rank"] for r in b}
    for n in ra:
        assert ra[n] == pytest.approx(rb[n], abs=1e-9)


def test_pagerank_nonconvergence_raises(toy_edges):
    with pytest.raises(RuntimeError, match="did not converge"):
        linkgraph.pagerank(toy_edges, max_iter=2, tol=1e-15)


def test_pagerank_fixed_budget_mode(toy_edges):
    # on_max_iter="return": the production fixed-iteration-budget contract
    ranks = {
        r["node"]: r["rank"]
        for r in linkgraph.pagerank(
            toy_edges, max_iter=3, tol=0.0, on_max_iter="return"
        ).collect()
    }
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    with pytest.raises(ValueError, match="on_max_iter"):
        linkgraph.pagerank(toy_edges, on_max_iter="nope")


def test_pagerank_no_cached_rdds_left(spark, toy_edges):
    # DELTA-based: earlier tests in the shared session may hold live
    # localCheckpoint frames (listed as persistent until GC'd), so an
    # absolute count is neighbor-sensitive — pagerank itself must add at
    # most its final checkpointed ranks
    import gc

    gc.collect()
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    linkgraph.pagerank(toy_edges, tol=1e-8).collect()
    gc.collect()
    assert jsc.getPersistentRDDs().size() <= before + 1


def test_corpus_pagerank_runs(spark, pages_cache, tmp_path):
    """End-to-end over the synthetic corpus: append one extra deterministic
    footer link per page (Catalyst binary concat — url-hash picks the target
    host) on top of the native v11 outlinks and run extract → host graph
    → ranks in path mode (invariants are footer-count-independent)."""
    pages = spark.read.parquet(f"{pages_cache}/pages.parquet")
    footer = F.concat(
        F.lit(b'<a href="http://h'),
        F.lpad((F.crc32(F.col("url").cast("binary")) % 40).cast("string"), 3, "0"),
        F.lit(b'.example.com/">next</a>'),
    )
    linked = pages.withColumn("html", F.concat("html", footer.cast("binary")))
    edges = linkgraph.host_graph(linkgraph.extract_links(linked))
    assert edges.count() > 0
    out = str(tmp_path / "ranks")
    ranks = linkgraph.pagerank(
        edges, tol=1e-8, materialize="path", out_path=out
    )
    pdf = ranks.toPandas()
    assert abs(pdf["rank"].sum() - 1.0) < 1e-6
    # path mode landed the result where asked
    assert spark.read.parquet(out).count() == len(pdf)
    assert len(pdf) >= 40


def test_pagerank_checkpoints_stay_in_base_dir(spark, toy_edges, monkeypatch, tmp_path):
    """Regression: the per-iteration teleport scalar once shadowed the
    checkpoint-dir variable, so every cut after iteration 0 wrote to a
    float-named directory in the CWD (and the real temp dir leaked).
    checkpoint_every=1 forces a cut per iteration; the CWD must stay clean
    and the temp base must be removed on return."""
    import os

    monkeypatch.chdir(tmp_path)
    before = set(os.listdir(tmp_path))
    tmp_before = set(os.listdir("/tmp"))
    linkgraph.pagerank(toy_edges, tol=1e-8, checkpoint_every=1).collect()
    assert set(os.listdir(tmp_path)) == before
    leaked = {
        d for d in set(os.listdir("/tmp")) - tmp_before if d.startswith("logagg-pr-")
    }
    assert leaked == set()


@pytest.mark.parametrize("weighted", [False, True])
def test_hits_fixed_budget_matches_twin(spark, toy_edges, weighted):
    """Step-exact differential: the same fixed iteration budget must land
    Spark and the dense numpy twin on the same (hub, authority) state —
    a stronger check than comparing two independently-converged runs."""
    sc = spark.sparkContext._jsc.sc()
    n_persisted_before = sc.getPersistentRDDs().size()
    budget = 12
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in linkgraph.hits(
            toy_edges,
            tol=0.0,
            max_iter=budget,
            weighted=weighted,
            on_max_iter="return",
        ).collect()
    }
    rows = [
        (r["src"], r["dst"], float(r["n_links"])) for r in toy_edges.collect()
    ]
    want = linkgraph.hits_py(rows, weighted=weighted, max_iter=budget, tol=0.0)
    assert set(got) == set(want)
    for node, (wh, wa) in want.items():
        gh, ga = got[node]
        assert gh == pytest.approx(wh, abs=1e-9), node
        assert ga == pytest.approx(wa, abs=1e-9), node
    # structure: d.com is a pure sink → zero hub; a.com cites b,c → hub
    assert got["d.com"][0] == 0.0
    assert got["a.com"][0] > 0.0
    # no persisted frames leak past the call
    assert sc.getPersistentRDDs().size() == n_persisted_before


def test_hits_converges_on_star_and_max_iter_contract(spark):
    # hub h cites three leaves: fixpoint reached in ~2 iterations exactly
    # (hub=1, authorities uniform 1/sqrt(3))
    edges = spark.createDataFrame(
        [("h.com", "a.com", 1), ("h.com", "b.com", 1), ("h.com", "c.com", 1)],
        "src string, dst string, n_links long",
    )
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in linkgraph.hits(edges, tol=1e-10, max_iter=10).collect()
    }
    import math

    third = 1.0 / math.sqrt(3.0)
    assert got["h.com"][0] == pytest.approx(1.0)
    assert got["h.com"][1] == 0.0
    for leaf in ("a.com", "b.com", "c.com"):
        assert got[leaf][1] == pytest.approx(third)
        assert got[leaf][0] == 0.0
    # audit mode refuses a budget too small to converge
    with pytest.raises(RuntimeError, match="did not converge"):
        linkgraph.hits(edges, max_iter=1, tol=0.0)
    out = linkgraph.hits(edges, max_iter=1, tol=0.0, on_max_iter="return")
    assert out.count() == 4  # fixed-budget mode still returns all nodes


def test_components_two_islands(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("y", "x"), ("x", "y"), ("z", "y")],
        "src string, dst string",
    )
    got = {
        r["node"]: r["component"]
        for r in linkgraph.components(edges).collect()
    }
    assert got == {
        "a": "a", "b": "a", "c": "a",   # weakly connected via b
        "x": "x", "y": "x", "z": "x",
    }


def test_personalized_pagerank_matches_twin(spark, toy_edges):
    # restart biased onto a.com (weight 3) and b.com (weight 1)
    weights = spark.createDataFrame(
        [("a.com", 3.0), ("b.com", 1.0), ("not-in-graph.com", 9.0)],
        "node string, weight double",
    )
    got = {
        r["node"]: r["rank"]
        for r in linkgraph.pagerank(
            toy_edges, tol=1e-10, max_iter=200, teleport_weights=weights
        ).collect()
    }
    want = linkgraph.pagerank_py(
        _edge_tuples(toy_edges), teleport={"a.com": 3.0, "b.com": 1.0}
    )
    assert set(got) == set(want)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-8), node
    # off-graph weight is ignored, not redistributed as rank
    assert "not-in-graph.com" not in got


def test_trustrank_spam_screen(spark):
    # trusted cluster t1<->t2 -> good; spam farm s1<->s2 -> good (the farm
    # links AT a target to inflate it, nothing links at the farm)
    edges = spark.createDataFrame(
        [
            ("t1", "t2", 1), ("t2", "t1", 1), ("t1", "good", 1),
            ("s1", "s2", 1), ("s2", "s1", 1), ("s1", "good", 1),
        ],
        "src string, dst string, n_links long",
    )
    seeds = spark.createDataFrame([("t1",)], "node string")
    # the 2-cycles damp at only 0.85/iter — full convergence needs ~150
    # iterations, so compare STEP-EXACT at a fixed budget instead (the
    # spam-screen zeros and the cluster symmetry hold at every step)
    budget = 12
    plain = {
        r["node"]: r["rank"]
        for r in linkgraph.pagerank(
            edges, tol=0.0, max_iter=budget, on_max_iter="return"
        ).collect()
    }
    trust = {
        r["node"]: r["rank"]
        for r in linkgraph.trustrank(
            edges, seeds, tol=0.0, max_iter=budget, on_max_iter="return"
        ).collect()
    }
    # plain pagerank cannot separate the farm from the trusted cluster…
    assert plain["s1"] == pytest.approx(plain["t1"], abs=1e-9)
    # …trustrank zeroes every node with no forward path from the seeds
    assert trust["s1"] == 0.0 and trust["s2"] == 0.0
    assert trust["t1"] > 0.0 and trust["good"] > 0.0
    assert abs(sum(trust.values()) - 1.0) < 1e-9
    # twin agrees step-exactly at the same budget
    want = linkgraph.pagerank_py(
        [(r["src"], r["dst"], 1.0) for r in edges.collect()],
        teleport={"t1": 1.0},
        max_iter=budget,
        tol=0.0,
    )
    for node in want:
        assert trust[node] == pytest.approx(want[node], abs=1e-9), node


def test_teleport_weights_without_graph_overlap_raise(spark, toy_edges):
    weights = spark.createDataFrame(
        [("nowhere.com", 1.0)], "node string, weight double"
    )
    with pytest.raises(ValueError, match="no positive weight"):
        linkgraph.pagerank(toy_edges, teleport_weights=weights)


def test_pagerank_warm_start(spark, toy_edges):
    cold = linkgraph.pagerank(toy_edges, tol=1e-10, max_iter=200)
    # warm-start from converged ranks: a 2-iteration budget suffices…
    warm = {
        r["node"]: r["rank"]
        for r in linkgraph.pagerank(
            toy_edges, tol=1e-8, max_iter=2, init_ranks=cold
        ).collect()
    }
    c = {r["node"]: r["rank"] for r in cold.collect()}
    for n in c:
        assert warm[n] == pytest.approx(c[n], abs=1e-7), n
    # …while a cold start with the same budget cannot converge — the
    # warm start genuinely skipped the iteration work
    with pytest.raises(RuntimeError, match="did not converge"):
        linkgraph.pagerank(toy_edges, tol=1e-8, max_iter=2)
    # stale/partial init is renormalized, absent nodes seeded at 1/n:
    # same fixpoint as cold (uniqueness), just started elsewhere
    stale = spark.createDataFrame(
        [("a.com", 80.0), ("b.com", 20.0)], "node string, rank double"
    )
    redo = {
        r["node"]: r["rank"]
        for r in linkgraph.pagerank(
            toy_edges, tol=1e-10, max_iter=200, init_ranks=stale
        ).collect()
    }
    for n in c:
        assert redo[n] == pytest.approx(c[n], abs=1e-8), n
    # an all-zero init vector is refused
    zero = spark.createDataFrame(
        [(n, 0.0) for n in c], "node string, rank double"
    )
    with pytest.raises(ValueError, match="no positive mass"):
        linkgraph.pagerank(toy_edges, init_ranks=zero)


def test_graph_health_datasheet(spark, toy_edges):
    # toy host graph: a->b(2), a->c, b->c, c->a, c->d — one weak component
    row = linkgraph.graph_health(toy_edges).collect()[0]
    assert row["n_nodes"] == 4
    assert row["n_edges"] == 5
    assert row["n_links"] == 6.0          # a->b carries weight 2
    assert row["n_sinks"] == 1            # d has no out-edges
    assert row["n_sources"] == 0          # every node is cited
    assert row["max_in_deg"] == 2         # c cited by a and b; a by c only
    # a->c + c->a is the only reciprocal pair: 2 of 5 distinct edges
    assert row["reciprocity"] == pytest.approx(2 / 5)
    assert row["n_components"] == 1
    assert row["giant_share"] == pytest.approx(1.0)


def test_graph_health_two_islands_and_empty(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("x", "y")], "src string, dst string"
    )
    row = linkgraph.graph_health(edges).collect()[0]
    assert row["n_components"] == 2
    assert row["giant_share"] == pytest.approx(0.5)
    assert row["reciprocity"] == pytest.approx(2 / 3)
    assert row["n_sources"] == 1          # x
    assert row["n_sinks"] == 1            # y
    empty = linkgraph.graph_health(
        spark.createDataFrame([], "src string, dst string")
    ).collect()[0]
    assert empty["n_nodes"] == 0 and empty["giant_share"] == 0.0


def test_degree_stats(spark, toy_edges):
    got = {r["node"]: (r["out_deg"], r["out_links"], r["in_deg"], r["in_links"])
           for r in linkgraph.degree_stats(toy_edges).collect()}
    assert got == {
        "a.com": (2, 3, 1, 1),   # out: b(2)+c(1); in: c(1)
        "b.com": (1, 1, 1, 2),
        "c.com": (2, 2, 2, 2),
        "d.com": (0, 0, 1, 1),   # pure sink, present with zeros
    }


def test_host_scorecard_and_authority_weights(spark):
    docs = spark.createDataFrame(
        [
            ("http://big.com/%d" % i, "common words " * 20) for i in range(8)
        ]
        + [("http://tiny.com/1", "rare insight " * 20)]
        + [("not a url", "junk " * 5)],
        "url string, text string",
    )
    ranks = spark.createDataFrame(
        [("big.com", 0.3), ("tiny.com", 0.6)], "node string, rank double"
    )
    sc = linkgraph.host_scorecard(docs, ranks).persist()
    rows = {r["host"]: r for r in sc.collect()}
    assert rows["big.com"]["n_docs"] == 8
    assert rows["big.com"]["n_tokens"] == 8 * 40
    assert rows["tiny.com"]["rank"] == pytest.approx(0.6)
    assert rows["\x00invalid"]["rank"] == 0.0  # absent from graph, kept

    w = {r["host"]: r["weight"] for r in linkgraph.authority_weights(sc).collect()}
    # authority-per-doc: tiny.com has 2/3 of the rank on 1/10 of the docs →
    # capped at 3.0 pre-scale; big.com ratio (0.3/0.9)/(8/10)=0.42;
    # invalid host ratio 0 → floored at 0.1 pre-scale
    assert w["tiny.com"] / w["\x00invalid"] == pytest.approx(3.0 / 0.1)
    assert w["big.com"] / w["\x00invalid"] == pytest.approx((0.3 / 0.9) / 0.8 / 0.1)
    # expected mixture size == input size (default target)
    expected = sum(w[h] * rows[h]["n_docs"] for h in w)
    assert expected == pytest.approx(10.0)
    # explicit target rescales
    w2 = {
        r["host"]: r["weight"]
        for r in linkgraph.authority_weights(sc, target_total=30).collect()
    }
    assert sum(w2[h] * rows[h]["n_docs"] for h in w2) == pytest.approx(30.0)
    sc.unpersist()


def test_pagerank_empty_graph_path_mode(spark, tmp_path):
    e = spark.createDataFrame([], "src string, dst string, n_links long")
    out = str(tmp_path / "empty_ranks")
    got = linkgraph.pagerank(e, materialize="path", out_path=out)
    assert got.count() == 0
    assert spark.read.parquet(out).columns == ["node", "rank"]


def test_cocitation_matches_twin(spark):
    edges = [
        ("s1", "a"), ("s1", "b"),
        ("s2", "a"), ("s2", "b"),
        ("s3", "a"), ("s3", "c"),
        ("s4", "b"), ("s4", "c"),
        ("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "d"),
        ("s1", "a"),  # duplicate capture — must count once
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["a"], r["b"]): (r["n_common"], r["jaccard"])
        for r in linkgraph.cocitation(df, min_common=1).collect()
    }
    want = linkgraph.cocitation_py(edges, min_common=1)
    assert set(got) == set(want)
    for p, (wc, wj) in want.items():
        gc, gj = got[p]
        assert gc == wc, p
        assert gj == pytest.approx(wj, rel=1e-12), p
    # a and b share citers s1, s2, hub → the strongest pair
    assert got[("a", "b")][0] == 3
    # min_common prunes weak pairs
    strong = {
        (r["a"], r["b"])
        for r in linkgraph.cocitation(df, min_common=3).collect()
    }
    assert strong == {("a", "b")}


def test_cocitation_max_out_cut_and_path_mode(spark, tmp_path):
    edges = [
        ("s1", "a"), ("s1", "b"),
        ("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "d"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["a"], r["b"]): (r["n_common"], r["jaccard"])
        for r in linkgraph.cocitation(df, min_common=1, max_out=3).collect()
    }
    want = linkgraph.cocitation_py(edges, min_common=1, max_out=3)
    assert got.keys() == want.keys()
    # the 4-outlink hub is cut: only s1's (a,b) pair survives, and the
    # jaccard denominators come from the FILTERED graph (1 citer each)
    assert got == {("a", "b"): (1, 1.0)}
    out = str(tmp_path / "pairs")
    linkgraph.cocitation(df, min_common=1, materialize="path", out_path=out)
    back = spark.read.parquet(out)
    assert back.count() == len(
        linkgraph.cocitation_py(edges, min_common=1)
    )
    with pytest.raises(ValueError, match="out_path"):
        linkgraph.cocitation(df, materialize="path")


# ------------------------------------------------- mirror-host detection


def test_host_mirrors_matches_twin(spark):
    # m1/m2 mirror each other (5 shared pages, one extra each);
    # solo shares nothing; every host serves the boilerplate 404 body,
    # which the max_hosts_per_digest cut removes
    pages = (
        [(f"https://M1.example/p{i}", f"content {i}") for i in range(5)]
        + [(f"https://m2.example/q{i}", f"content {i}") for i in range(5)]
        + [("https://m1.example/only", "m1 extra")]
        + [("https://m2.example/only", "m2 extra")]
        + [(f"https://solo.example/s{i}", f"solo {i}") for i in range(4)]
        + [
            (f"https://{h}.example/missing", "404 not found")
            for h in ("m1", "m2", "solo", "a", "b", "c")
        ]
        + [("junk-url", "content 0"), ("https://m1.example/null", None)]
    )
    df = spark.createDataFrame(pages, "url string, text string")
    kw = dict(min_common=2, min_jaccard=0.5, max_hosts_per_digest=3)
    got = {
        (r["a"], r["b"]): (r["n_common"], r["jaccard"])
        for r in linkgraph.host_mirrors(df, **kw).collect()
    }
    want = linkgraph.host_mirrors_py(pages, **kw)
    assert set(got) == set(want)
    for k, (wc, wj) in want.items():
        assert got[k][0] == wc, k
        assert got[k][1] == pytest.approx(wj, rel=1e-12), k
    # the mirror pair: 5 shared of 7 distinct content digests
    # (the 404 body was cut, so it inflates neither numerator nor union)
    assert got == {("m1.example", "m2.example"): (5, pytest.approx(5 / 7))}
    # a stricter jaccard floor prunes before materialization
    assert (
        linkgraph.host_mirrors(df, min_common=2, min_jaccard=0.8).count()
        == 0
    )


def test_host_mirrors_digest_col_and_path_mode(spark, tmp_path):
    pages = [
        ("https://x.example/1", "dA"),
        ("https://y.example/1", "dA"),
        ("https://x.example/2", "dB"),
        ("https://y.example/2", "dB"),
    ]
    df = spark.createDataFrame(pages, "url string, sig string")
    got = linkgraph.host_mirrors(
        df, digest_col="sig", min_common=2, min_jaccard=0.9
    ).collect()
    assert [
        (r["a"], r["b"], r["n_common"], r["jaccard"]) for r in got
    ] == [("x.example", "y.example", 2, 1.0)]
    out = str(tmp_path / "mirrors")
    linkgraph.host_mirrors(
        df,
        digest_col="sig",
        min_common=2,
        min_jaccard=0.9,
        materialize="path",
        out_path=out,
    )
    back = spark.read.parquet(out).collect()
    assert len(back) == 1 and back[0]["jaccard"] == 1.0


# ------------------------------------------------- bibliographic coupling


def test_coupling_matches_twin_and_duals_cocitation(spark):
    edges = [
        # p1 and p2 cite 3 shared targets; p3 shares one with each;
        # EVERYONE cites the homepage — which max_in must cut
        ("p1", "t1"), ("p1", "t2"), ("p1", "t3"), ("p1", "home"),
        ("p2", "t1"), ("p2", "t2"), ("p2", "t3"), ("p2", "home"),
        ("p3", "t1"), ("p3", "t9"), ("p3", "home"),
        ("p4", "home"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    kw = dict(min_common=1, max_in=3)
    got = {
        (r["a"], r["b"]): (r["n_common"], r["jaccard"])
        for r in linkgraph.coupling(df, **kw).collect()
    }
    want = linkgraph.coupling_py(edges, **kw)
    assert set(got) == set(want)
    for k, (wc, wj) in want.items():
        assert got[k][0] == wc and got[k][1] == pytest.approx(wj, rel=1e-12), k
    # home is cited by 4 > max_in sources: cut, so p4 pairs with nobody
    assert not any("p4" in k for k in got)
    # after the home cut p1 and p2 cite IDENTICAL sets {t1,t2,t3}
    assert got[("p1", "p2")] == (3, pytest.approx(1.0))
    assert got[("p1", "p3")] == (1, pytest.approx(1 / 4))
    # duality: coupling(E) == cocitation(E reversed), bit-for-bit
    rev = spark.createDataFrame(
        [(d, s) for s, d in edges], "src string, dst string"
    )
    dual = {
        (r["a"], r["b"]): (r["n_common"], r["jaccard"])
        for r in linkgraph.cocitation(rev, min_common=1, max_out=3).collect()
    }
    assert dual == got
