"""Frontier operators: RFC 9309 robots semantics (hand-pinned examples +
differential fuzz vs the Python twin), politeness scheduling, seen-set
increments, and plan shapes."""

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from logagg import frontier

BODY_MAIN = """
# synthetic robots
User-agent: other-bot
Disallow: /

User-agent: logagg
Disallow: /private
Allow: /private/ok
Disallow: /tmp/*.bak$
Crawl-delay: 2.5

User-agent: *
Disallow: /all-denied
"""

BODY_STAR_ONLY = """
User-agent: *
Disallow: /x
Allow: /x/y
Crawl-delay: 7
"""


# ---------------------------------------------------------------------------
# twin semantics (pure Python)
# ---------------------------------------------------------------------------

def test_twin_group_selection_specific_beats_star():
    # crawler 'logagg-bot/1.0' matches token 'logagg' → that group, not '*'
    assert frontier.robots_allowed_py(BODY_MAIN, "logagg-bot/1.0", "/all-denied")
    assert not frontier.robots_allowed_py(BODY_MAIN, "logagg-bot/1.0", "/private/x")
    # unknown crawler falls to '*'
    assert not frontier.robots_allowed_py(BODY_MAIN, "nobody", "/all-denied")
    assert frontier.robots_allowed_py(BODY_MAIN, "nobody", "/private/x")


def test_twin_longest_match_and_tie():
    assert frontier.robots_allowed_py(BODY_MAIN, "logagg", "/private/ok/file")
    assert not frontier.robots_allowed_py(BODY_MAIN, "logagg", "/private/no")
    # equal-length allow/disallow tie → allow
    body = "User-agent: *\nDisallow: /ab\nAllow: /ab"
    assert frontier.robots_allowed_py(body, "x", "/ab/z")


def test_twin_wildcard_and_anchor():
    assert not frontier.robots_allowed_py(BODY_MAIN, "logagg", "/tmp/a.bak")
    assert frontier.robots_allowed_py(BODY_MAIN, "logagg", "/tmp/a.bak.txt")
    assert frontier.robots_allowed_py(BODY_MAIN, "logagg", "/tmp/a.txt")


def test_twin_empty_disallow_and_headerless_rules():
    assert frontier.robots_allowed_py("User-agent: *\nDisallow:", "x", "/any")
    # rules before any User-agent line are ignored
    assert frontier.robots_allowed_py("Disallow: /\nUser-agent: *\nAllow: /", "x", "/p")


def test_twin_multi_agent_group_and_regroup():
    body = (
        "User-agent: a\nUser-agent: b\nDisallow: /g\n"
        "User-agent: c\nDisallow: /h\n"
    )
    assert not frontier.robots_allowed_py(body, "a", "/g/1")
    assert not frontier.robots_allowed_py(body, "b", "/g/1")
    assert frontier.robots_allowed_py(body, "b", "/h/1")  # /h is c's group
    assert not frontier.robots_allowed_py(body, "c", "/h/1")
    assert frontier.robots_allowed_py(body, "c", "/g/1")


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def rules(spark):
    robots = spark.createDataFrame(
        [("h1.example.com", BODY_MAIN), ("h2.example.com", BODY_STAR_ONLY)],
        "host string, body string",
    )
    return frontier.parse_robots(robots).cache()


def test_parse_robots_rows(rules):
    pdf = rules.toPandas()
    star_h1 = pdf[(pdf["host"] == "h1.example.com") & (pdf["agent"] == "*")]
    assert list(star_h1["pattern"]) == ["/all-denied"]
    logagg_rows = pdf[(pdf["host"] == "h1.example.com") & (pdf["agent"] == "logagg")]
    assert set(logagg_rows["kind"]) == {"allow", "disallow", "crawl-delay"}
    delay = logagg_rows[logagg_rows["kind"] == "crawl-delay"]["delay"]
    assert list(delay) == [2.5]


def test_robots_filter_matches_twin_on_urls(spark, rules):
    urls = [
        f"http://{h}{p}"
        for h in ("h1.example.com", "h2.example.com", "h3.norobots.com")
        for p in (
            "/", "/private", "/private/ok", "/private/ok/deep", "/privateer",
            "/tmp/a.bak", "/tmp/a.bak.gz", "/all-denied/x", "/x/y/z", "/x/q",
            "/a?b=1",
        )
    ]
    crawler = "logagg-bot/2.0"
    got = frontier.robots_filter(
        spark.createDataFrame([(u,) for u in urls], "url string"),
        rules,
        crawler,
        keep_denied=True,
    ).toPandas()
    bodies = {"h1.example.com": BODY_MAIN, "h2.example.com": BODY_STAR_ONLY}
    assert len(got) == len(urls)
    for u, allowed in zip(got["url"], got["robots_allowed"]):
        host = u.split("/")[2]
        path = "/" + u.split("/", 3)[3] if u.count("/") >= 3 else "/"
        want = (
            frontier.robots_allowed_py(bodies[host], crawler, path)
            if host in bodies
            else True
        )
        assert allowed == want, (u, allowed, want)


def test_robots_filter_drops_denied(spark, rules):
    urls = spark.createDataFrame(
        [("http://h1.example.com/private/x",), ("http://h1.example.com/ok",)],
        "url string",
    )
    kept = frontier.robots_filter(urls, rules, "logagg").toPandas()
    assert list(kept["url"]) == ["http://h1.example.com/ok"]
    assert "robots_allowed" not in kept.columns


ROBOTS_LINES = st.lists(
    st.sampled_from(
        [
            "User-agent: *",
            "User-agent: logagg",
            "User-agent: zeta-crawler",
            "Disallow: /a",
            "Disallow: /a/b",
            "Disallow: /a*c",
            "Disallow: /b$",
            "Allow: /a/b/c",
            "Allow: /a",
            "Allow: /b",
            "Disallow:",
            "Crawl-delay: 3",
            "# comment",
            "Sitemap: http://x/s.xml",
        ]
    ),
    min_size=0,
    max_size=12,
)
PATHS = st.sampled_from(["/", "/a", "/a/b", "/a/b/c", "/abc", "/axc", "/b", "/b/c"])


@settings(max_examples=25, deadline=None)
@given(lines=ROBOTS_LINES, paths=st.lists(PATHS, min_size=1, max_size=4, unique=True))
def test_fuzz_spark_verdicts_equal_twin(spark, lines, paths):
    body = "\n".join(lines)
    crawler = "logagg-bot/1.0"
    rules = frontier.parse_robots(
        spark.createDataFrame([("h.example.com", body)], "host string, body string")
    )
    urls = spark.createDataFrame(
        [(f"http://h.example.com{p}",) for p in paths], "url string"
    )
    got = frontier.robots_filter(urls, rules, crawler, keep_denied=True).toPandas()
    for u, allowed in zip(got["url"], got["robots_allowed"]):
        p = "/" + u.split("/", 3)[3]
        assert allowed == frontier.robots_allowed_py(body, crawler, p), (body, p)


def test_politeness_schedule(spark, rules):
    urls = [
        (f"http://h1.example.com/p{i}",) for i in range(6)
    ] + [(f"http://h2.example.com/q{i}",) for i in range(3)]
    sched = frontier.politeness_schedule(
        spark.createDataFrame(urls, "url string"),
        delays=frontier.crawl_delays(rules, "logagg-bot"),
        default_delay=1.0,
    ).toPandas()
    h1 = sched[sched["host"] == "h1.example.com"].sort_values("slot")
    h2 = sched[sched["host"] == "h2.example.com"].sort_values("slot")
    assert list(h1["slot"]) == [1, 2, 3, 4, 5, 6]
    # h1 delay = 2.5 from the logagg group
    assert list(h1["not_before_s"]) == [0.0, 2.5, 5.0, 7.5, 10.0, 12.5]
    # h2: crawler 'logagg-bot' has no specific group → '*' delay 7
    assert list(h2["not_before_s"]) == [0.0, 7.0, 14.0]


def test_politeness_deterministic_under_shuffle(spark):
    urls = [(f"http://h.example.com/p{i}",) for i in range(20)]
    a = frontier.politeness_schedule(
        spark.createDataFrame(urls, "url string").repartition(7)
    ).toPandas()
    b = frontier.politeness_schedule(
        spark.createDataFrame(list(reversed(urls)), "url string")
    ).toPandas()
    assert dict(zip(a["url"], a["slot"])) == dict(zip(b["url"], b["slot"]))


def test_politeness_single_exchange(spark):
    urls = spark.createDataFrame(
        [("http://h.example.com/p",)], "url string"
    )
    plan = (
        frontier.politeness_schedule(urls)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_frontier_increment(spark, tmp_path):
    seen = str(tmp_path / "seen")
    b1 = spark.createDataFrame(
        [
            ("http://A.example.com/p?utm_source=x",),
            ("http://a.example.com/p",),  # same canonical → one kept
            ("http://a.example.com/q",),
        ],
        "url string",
    )
    got1 = frontier.frontier_increment(b1, seen).toPandas()
    assert len(got1) == 2
    b2 = spark.createDataFrame(
        [
            ("http://a.example.com/p#frag",),  # seen in batch 1
            ("http://a.example.com/r",),  # new
        ],
        "url string",
    )
    got2 = frontier.frontier_increment(b2, seen).toPandas()
    assert list(got2["url"]) == ["http://a.example.com/r"]
    # third increment with nothing new
    got3 = frontier.frontier_increment(b2, seen).toPandas()
    assert len(got3) == 0


# ---------------------------------------------------------------------------
# sitemaps
# ---------------------------------------------------------------------------

SITEMAP_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://h.example.com/a</loc><lastmod>2022-07-01</lastmod><priority>0.8</priority></url>
  <url><loc> http://h.example.com/b </loc></url>
  <url><lastmod>2022-07-02</lastmod></url>
</urlset>"""

SITEMAP_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://h.example.com/sitemap-1.xml</loc></sitemap>
  <sitemap><loc>http://h.example.com/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap_py_urlset_and_index():
    rows = frontier.parse_sitemap_py(SITEMAP_URLSET)
    assert [(r["kind"], r["loc"]) for r in rows] == [
        ("url", "http://h.example.com/a"),
        ("url", "http://h.example.com/b"),  # whitespace stripped, locless row dropped
    ]
    assert rows[0]["lastmod"] == "2022-07-01" and rows[0]["priority"] == 0.8
    idx = frontier.parse_sitemap_py(SITEMAP_INDEX)
    assert {r["kind"] for r in idx} == {"sitemap"}
    assert len(idx) == 2


def test_parse_sitemap_py_malformed_falls_back():
    truncated = SITEMAP_URLSET[: SITEMAP_URLSET.index("</urlset>")]  # no close tag
    rows = frontier.parse_sitemap_py(truncated)
    assert [r["loc"] for r in rows] == [
        "http://h.example.com/a",
        "http://h.example.com/b",
    ]


def test_sitemap_to_frontier_chain(spark, rules, tmp_path):
    """sitemap → increment → robots → politeness, end to end."""
    sm = spark.createDataFrame(
        [("http://h1.example.com/sitemap.xml",
          SITEMAP_URLSET.replace("h.example.com", "h1.example.com")
          .replace("/a<", "/private/x<").replace("/b ", "/ok "))],
        "sitemap_url string, body string",
    )
    entries = frontier.parse_sitemaps(sm)
    urls = entries.filter(F.col("kind") == "url").select(F.col("loc").alias("url"))
    fresh = frontier.frontier_increment(urls, str(tmp_path / "seen"))
    fetchable = frontier.robots_filter(fresh, rules, "logagg")
    sched = frontier.politeness_schedule(fetchable).toPandas()
    # /private/x denied for logagg by h1's rules; /ok survives
    assert list(sched["url"]) == ["http://h1.example.com/ok"]
    assert list(sched["slot"]) == [1]


def test_resolve_redirects_chains_loops_dups(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "t"),   # 3-hop chain to terminal t
        ("p", "q"), ("q", "p"),               # redirect loop
        ("x", "p"),                           # chain INTO the loop
        ("dup", "z2"), ("dup", "z1"),         # duplicate capture → min dst
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["url"]: (r["final"], r["hops"], r["resolved"])
        for r in frontier.resolve_redirects(df).collect()
    }
    assert got == frontier.resolve_redirects_py(edges)
    assert got["a"] == ("t", 3, True)
    assert got["b"] == ("t", 2, True)
    assert got["p"] == (None, None, False)
    assert got["x"] == (None, None, False)
    assert got["dup"] == ("z1", 1, True)
    assert "t" not in got  # terminals are targets, not sources


def test_resolve_redirects_hop_bound_and_path_mode(spark, tmp_path):
    # 25-hop chain n0→…→n25: the give-up bound cuts it exactly like the twin
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(25)]
    df = spark.createDataFrame(edges, "src string, dst string")
    for bound in (20, 32):
        got = {
            r["url"]: (r["final"], r["hops"], r["resolved"])
            for r in frontier.resolve_redirects(df, max_hops=bound).collect()
        }
        assert got == frontier.resolve_redirects_py(edges, max_hops=bound)
    assert got["n00"] == ("n25", 25, True)        # bound 32 resolves the head
    short = {
        r["url"]: r["resolved"]
        for r in frontier.resolve_redirects(df, max_hops=20).collect()
    }
    assert short["n00"] is False and short["n05"] is True  # 20 hops exactly
    # path mode lands the table without a driver round-trip
    out = str(tmp_path / "resolved")
    frontier.resolve_redirects(df, materialize="path", out_path=out)
    back = {r["url"] for r in spark.read.parquet(out).collect()}
    assert back == {s for s, _ in edges}
    with pytest.raises(ValueError, match="out_path"):
        frontier.resolve_redirects(df, materialize="path")


# ------------------------------------------------- url-template mining


def test_url_template_classes(spark):
    cases = [
        ("HTTP://WWW.Ex.COM:8080/A/B?z=1&a=2", "www.ex.com:8080/a/b?a=*&z=*"),
        ("https://h/p/", "h/p"),
        ("https://h", "h/"),
        ("https://h/?x", "h/?x=*"),
        ("https://h/2024/05/17", "h/<n>/<n>/<n>"),
        ("https://h/550e8400-e29b-41d4-a716-446655440000", "h/<uuid>"),
        ("https://h/abcdef0123456789", "h/<hex>"),
        ("https://h/item-42/view", "h/<mix>/view"),
        ("https://h//double//slash", "h/double/slash"),
        ("https://h/a?a=1&a=2&b", "h/a?a=*&b=*"),
        ("not a url", None),
        ("nohost://", None),
        ("relative/path", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["t"]
        for r in df.select(
            frontier.url_template(F.col("url")).alias("t")
        ).collect()
    ]
    assert got == [t for _, t in cases]
    assert [frontier.url_template_py(u) for u, _ in cases] == got


def test_url_templates_matches_twin_and_flags_traps(spark):
    urls = (
        # calendar trap: 30 distinct urls, ONE template, whole host
        [
            f"http://trap.example/cal/2024/{m:02d}/{d:02d}"
            for m in (1, 2, 3)
            for d in range(1, 11)
        ]
        # session-id item pages: dominant share but under min_pages
        + [
            f"https://shop.example/item/ab12cd{i}?sid=deadbeef{i}&page={i}"
            for i in range(5)
        ]
        + ["https://shop.example/about", "https://shop.example/contact"]
        + [f"http://ids.example/abcdef01{i:08x}" for i in range(3)]
        + ["https://u.example/550e8400-e29b-41d4-a716-446655440000"]
        + ["not a url", "nohost://", "relative/path"]
        + ["http://trap.example/cal/2024/01/01"]  # duplicate — one count
    )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        (r["host"], r["template"]): (
            r["n_pages"],
            r["host_pages"],
            r["share"],
            r["trap_candidate"],
        )
        for r in frontier.url_templates(
            df, min_pages=10, trap_share=0.5
        ).collect()
    }
    want = frontier.url_templates_py(urls, min_pages=10, trap_share=0.5)
    assert set(got) == set(want)
    for k, (wc, wt, ws, wf) in want.items():
        gc, gt, gs, gf = got[k]
        assert (gc, gt, gf) == (wc, wt, wf), k
        assert gs == pytest.approx(ws, rel=1e-12), k
    cal = got[("trap.example", "trap.example/cal/<n>/<n>/<n>")]
    assert cal == (30, 30, pytest.approx(1.0), True)
    item = got[
        ("shop.example", "shop.example/item/<mix>?page=*&sid=*")
    ]
    assert item[0] == 5 and item[1] == 7 and item[3] is False  # < min_pages
    assert ("u.example", "u.example/<uuid>") in got
    assert got[("ids.example", "ids.example/<hex>")][0] == 3
    # pure-Catalyst projection: no Python in the plan, partial+final aggs
    plan = (
        frontier.url_templates(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan


# ------------------------------------------------- recrawl change rates


def _cr_rows(spark, hist):
    return spark.createDataFrame(
        hist, "url string, fetch_ts double, digest string"
    )


def test_change_rates_crafted(spark):
    day = 86400.0
    hist = (
        # A: changes on every one of 4 daily intervals
        [("a", i * day, f"d{i}") for i in range(5)]
        # B: fetched 5x, never changes
        + [("b", i * day, "same") for i in range(5)]
        # C: single fetch — estimator undefined, explore-first
        + [("c", 0.0, "x")]
        # D: two fetches at the SAME instant (zero span) — undefined
        + [("d", 7.0, "x"), ("d", 7.0, "y")]
        # duplicate observation collapses
        + [("a", 0.0, "d0")]
    )
    got = {
        r["url"]: (
            r["n_fetches"],
            r["n_changes"],
            r["span_s"],
            r["lambda_day"],
            r["p_stale"],
            r["priority"],
        )
        for r in frontier.change_rates(_cr_rows(spark, hist)).collect()
    }
    want = frontier.change_rates_py(hist)
    assert set(got) == set(want)
    for url, w in want.items():
        g = got[url]
        assert g[:3] == w[:3], url
        for gi, wi in zip(g[3:], w[3:]):
            if wi is None:
                assert gi is None, url
            else:
                assert gi == pytest.approx(wi, rel=1e-12), url
    # hot page: every interval changed -> high rate, ~certain staleness
    assert got["a"][1] == 4 and got["a"][4] > 0.99
    # frozen page: lambda exactly 0, p_stale exactly 0
    assert got["b"][3] == 0.0 and got["b"][4] == 0.0 and got["b"][5] == 0.0
    # unknown pages explore first
    assert got["c"][3] is None and got["c"][5] == 1.0
    assert got["d"][5] == 1.0
    # the scheduler orders hot > frozen
    assert got["a"][5] > got["b"][5]


def test_change_rates_random_differential(spark):
    import random

    rng = random.Random(42)
    hist = []
    for i in range(60):
        url = f"u{i}"
        t = 0.0
        dig = rng.randint(0, 3)
        for _ in range(rng.randint(1, 7)):
            hist.append((url, t, f"v{dig}"))
            t += rng.uniform(3600.0, 10 * 86400.0)
            if rng.random() < 0.4:
                dig = rng.randint(0, 3)
    got = {
        r["url"]: (
            r["n_fetches"],
            r["n_changes"],
            r["span_s"],
            r["lambda_day"],
            r["p_stale"],
            r["priority"],
        )
        for r in frontier.change_rates(
            _cr_rows(spark, hist), horizon_days=3.0
        ).collect()
    }
    want = frontier.change_rates_py(hist, horizon_days=3.0)
    assert set(got) == set(want)
    for url, w in want.items():
        g = got[url]
        assert g[0] == w[0] and g[1] == w[1], url
        assert g[2] == pytest.approx(w[2], rel=1e-12), url
        for gi, wi in zip(g[3:], w[3:]):
            if wi is None:
                assert gi is None, url
            else:
                assert gi == pytest.approx(wi, rel=1e-12), url
    # plan: pure Catalyst, one aggregation shuffle
    plan = (
        frontier.change_rates(_cr_rows(spark, hist))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# ------------------------------------------------- crawl-budget allocation


def test_crawl_budget_matches_twin(spark):
    pri = (
        [(f"http://hot.example/p{i}", 0.9) for i in range(20)]
        + [(f"http://cold.example/c{i}", 0.05) for i in range(20)]
        + [(f"http://slow.example/s{i}", 0.9) for i in range(20)]
        + [("junk url", 1.0), ("also junk", 1.0)]
    )
    authority = {"hot.example": 2.0, "cold.example": 0.5}
    delays = {"slow.example": 600.0}
    df = spark.createDataFrame(pri, "url string, priority double")
    adf = spark.createDataFrame(
        list(authority.items()), "host string, weight double"
    )
    ddf = spark.createDataFrame(
        list(delays.items()), "host string, delay double"
    )
    got = {
        r["host"]: (r["n_urls"], r["demand"], r["polite_cap"], r["budget"])
        for r in frontier.crawl_budget(
            df, 30, authority=adf, delays=ddf, window_s=3600.0
        ).collect()
    }
    want = frontier.crawl_budget_py(
        pri, 30, authority=authority, delays=delays, window_s=3600.0
    )
    assert set(got) == set(want)
    for h, (wn, wd, wc, wb) in want.items():
        gn, gd, gc, gb = got[h]
        assert (gn, gc, gb) == (wn, wc, wb), h
        assert gd == pytest.approx(wd, rel=1e-12), h
    # the authority-boosted hot host gets the biggest slice
    assert got["hot.example"][3] > got["cold.example"][3]
    # the slow host is politeness-capped: 3600/600 + 1 = 7 fetches max
    assert got["slow.example"][2] == 7 and got["slow.example"][3] <= 7
    # junk urls pool into the bounded sentinel pseudo-host
    assert "\x00invalid" in got and got["\x00invalid"][0] == 2
    # nothing exceeds its url count
    assert all(b <= n for n, _, _, b in got.values())


def test_crawl_budget_edges(spark):
    df = spark.createDataFrame(
        [("http://a.example/1", 0.0), ("http://b.example/1", 0.0)],
        "url string, priority double",
    )
    # zero total demand -> zero budgets, not a crash
    got = {
        r["host"]: r["budget"]
        for r in frontier.crawl_budget(df, 100).collect()
    }
    assert got == {"a.example": 0, "b.example": 0}
    assert got == {
        h: v[3] for h, v in frontier.crawl_budget_py(
            [("http://a.example/1", 0.0), ("http://b.example/1", 0.0)], 100
        ).items()
    }
    # zero delay -> capped by url count only
    ddf = spark.createDataFrame([("a.example", 0.0)], "host string, delay double")
    df2 = spark.createDataFrame(
        [(f"http://a.example/{i}", 1.0) for i in range(5)],
        "url string, priority double",
    )
    row = frontier.crawl_budget(df2, 1000, delays=ddf).collect()[0]
    assert row["polite_cap"] == 5 and row["budget"] == 5
    assert frontier.crawl_budget_py(
        [(f"http://a.example/{i}", 1.0) for i in range(5)],
        1000,
        delays={"a.example": 0.0},
    )["a.example"][2:] == (5, 5)


# ------------------------------------------------- crawl snapshot diffing


def test_snapshot_diff_matches_twin(spark):
    old = (
        [(f"https://a.example/p{i}", f"v1-{i}") for i in range(6)]
        + [(f"https://b.example/q{i}", f"b-{i}") for i in range(3)]
        # same canonical key twice in one snapshot (tracking param)
        + [("https://a.example/p0?utm_source=x", "v1-0")]
    )
    new = (
        # p0/p1 unchanged, p2/p3 changed, p4/p5 removed, two added
        [(f"https://a.example/p{i}", f"v1-{i}") for i in range(2)]
        + [(f"https://a.example/p{i}", f"v2-{i}") for i in (2, 3)]
        + [(f"https://a.example/new{i}", f"n-{i}") for i in range(2)]
        # b.example vanished entirely; c.example is new
        + [(f"https://c.example/r{i}", f"c-{i}") for i in range(4)]
    )
    df_old = spark.createDataFrame(old, "url string, text string")
    df_new = spark.createDataFrame(new, "url string, text string")
    got = {
        r["host"]: (
            r["n_old"], r["n_new"], r["added"], r["removed"],
            r["changed"], r["unchanged"], r["churn"],
        )
        for r in frontier.snapshot_diff(df_old, df_new).collect()
    }
    want = frontier.snapshot_diff_py(old, new)
    assert set(got) == set(want)
    for h, w in want.items():
        g = got[h]
        assert g[:6] == w[:6], h
        if w[6] is None:
            assert g[6] is None, h
        else:
            assert g[6] == pytest.approx(w[6], rel=1e-12), h
    assert got["a.example"] == (6, 6, 2, 2, 2, 2, pytest.approx(1.0))
    assert got["b.example"][:6] == (3, 0, 0, 3, 0, 0)
    assert got["b.example"][6] == pytest.approx(1.0)
    # brand-new host: no old baseline, churn undefined
    assert got["c.example"][:6] == (0, 4, 4, 0, 0, 0)
    assert got["c.example"][6] is None


# ------------------------------------------------- robots sitemap discovery


def test_robots_sitemaps_matches_twin(spark):
    bodies = {
        "h1": (
            "User-agent: *\nDisallow: /x\n"
            "Sitemap: https://h1/s1.xml\n"
            "sitemap:https://h1/s2.xml   # trailing comment\n"
            "SITEMAP:   https://h1/s1.xml\n"  # duplicate — once
        ),
        "h2": "# only comments\nSitemap: https://h2/a b.xml\nSitemap:\n",
        "h3": "User-agent: *\nAllow: /\n",
        "h4": "Sitemap: https://h4/idx.xml\r\nDisallow: /\r\n",
    }
    df = spark.createDataFrame(
        list(bodies.items()), "host string, body string"
    )
    got = {
        (r["host"], r["sitemap_url"])
        for r in frontier.robots_sitemaps(df).collect()
    }
    want = {
        (h, u)
        for h, b in bodies.items()
        for u in frontier.robots_sitemaps_py(b)
    }
    assert got == want
    assert got == {
        ("h1", "https://h1/s1.xml"),
        ("h1", "https://h1/s2.xml"),
        ("h4", "https://h4/idx.xml"),
    }
    # a sitemap line does NOT start a rule group: h4's headerless
    # Disallow stays ignored (rules before any User-agent line)
    assert frontier.robots_allowed_py(bodies["h4"], "any", "/p")
    # and inside a group it does not split the group either
    grouped = "User-agent: *\nSitemap: https://x/s.xml\nDisallow: /p\n"
    assert not frontier.robots_allowed_py(grouped, "any", "/p")
    assert frontier.robots_sitemaps_py(grouped) == ["https://x/s.xml"]


# ------------------------------------------------- fetch plan (composition)


def test_fetch_plan_matches_twin_and_invariants(spark):
    pri = (
        [(f"http://hot.example/p{i}", float(i % 5) / 4) for i in range(12)]
        + [(f"http://slow.example/s{i}", 1.0) for i in range(10)]
        + [(f"http://meh.example/m{i}", 0.1) for i in range(4)]
    )
    delays = {"slow.example": 900.0}
    authority = {"hot.example": 3.0}
    df = spark.createDataFrame(pri, "url string, priority double")
    adf = spark.createDataFrame(list(authority.items()), "host string, weight double")
    ddf = spark.createDataFrame(list(delays.items()), "host string, delay double")
    kw = dict(window_s=3600.0, default_delay=2.0)
    got = {
        r["url"]: (r["host"], r["slot"], r["not_before_s"])
        for r in frontier.fetch_plan(
            df, 12, authority=adf, delays=ddf, **kw
        ).collect()
    }
    want = frontier.fetch_plan_py(
        pri, 12, authority=authority, delays=delays, **kw
    )
    assert got == want
    # per-host counts equal the budget table exactly
    budgets = frontier.crawl_budget_py(
        pri, 12, authority=authority, delays=delays, **kw
    )
    from collections import Counter

    per_host = Counter(h for h, _, _ in got.values())
    assert all(per_host.get(h, 0) == b for h, (_, _, _, b) in budgets.items())
    # politeness invariant: every planned fetch starts inside the window
    assert all(nb <= 3600.0 for _, _, nb in got.values())
    # the slow host is politeness-capped: 3600/900 + 1 = 5 slots max
    assert per_host["slow.example"] <= 5
    # within a host the highest-priority urls made the cut
    hot_kept = {u for u, (h, _, _) in got.items() if h == "hot.example"}
    if hot_kept:
        kept_min = min(p for u, p in pri if u in hot_kept)
        cut_max = max(
            (p for u, p in pri
             if u.startswith("http://hot.example") and u not in hot_kept),
            default=-1.0,
        )
        assert kept_min >= cut_max


def test_snapshot_overlap_sketch_estimates(spark):
    """Sketch-scale crawl overlap: canonicalization collapses recrawl
    noise before sampling, and with k >= |union| the estimates are
    exact."""
    a_urls = [f"http://h.example.com/p/{i}" for i in range(100)]
    b_urls = [
        f"http://H.example.com/p/{i}?utm_source=x#frag" for i in range(50, 150)
    ]  # same canonical space, shifted window: |∩|=50, |∪|=150
    a = spark.createDataFrame([(u,) for u in a_urls], "url string")
    b = spark.createDataFrame([(u,) for u in b_urls], "url string")
    est = frontier.snapshot_overlap(a, b, k=4096)
    assert est["k_used"] == 150
    assert est["jaccard"] == pytest.approx(50 / 150)
    assert est["union"] == pytest.approx(150.0)
    assert est["intersection"] == pytest.approx(50.0)
    assert est["n_a"] == 100 and est["n_b"] == 100
    # sketch regime still lands near truth
    small = frontier.snapshot_overlap(a, b, k=48)
    assert abs(small["jaccard"] - 1 / 3) < 0.25
