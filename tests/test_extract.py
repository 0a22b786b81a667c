"""Main-content extraction (logagg/extract.py): block segmentation and
the jusText-lite keep rule, pinned on crafted pages with known furniture;
Spark kernel ≡ driver twin corpus-wide over the synth html column."""

import pytest

from logagg import extract, textfns

SF = "/root/testdata/sf0.001"

PAGE = b"""<!DOCTYPE html><html><head>
<title>t</title><style>body { color: red }</style>
<script>var x = "inline script junk must never leak";</script>
</head><body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>
<div>
  <h1>The Article Title Goes Here For Real</h1>
  <p>This is the first real content paragraph and it carries more than
  eight whitespace tokens of actual prose &amp; decoded entities.</p>
  <p>Second paragraph also long enough to clear the minimum token bar
  with room to spare, no links at all.</p>
  <p>Short stub.</p>
</div>
<footer><a href="/tos">Terms</a> | <a href="/privacy">Privacy</a></footer>
</body></html>"""


@pytest.fixture(scope="module")
def pages(spark, pages_cache):
    return spark.read.parquet(f"{pages_cache}/pages.parquet")


def test_crafted_page_keeps_content_drops_furniture():
    content, n_blocks, n_kept = textfns.main_content_py(PAGE.decode())
    assert "first real content paragraph" in content
    assert "Second paragraph also long" in content
    assert "& decoded entities" in content  # charref decoded
    # furniture gone: nav links, footer links, script/style bodies, stubs
    assert "Home" not in content and "Privacy" not in content
    assert "inline script junk" not in content and "color: red" not in content
    assert "Short stub" not in content  # below min_tokens
    assert n_kept == 2 and n_blocks >= 5
    # title block: 7 tokens < 8 → dropped by the default bar
    assert "Article Title" not in content


def test_link_density_rule():
    html = (
        "<p><a href='/'>one two three four five six seven eight nine</a></p>"
        "<p>plain one two three four five six seven eight nine</p>"
    )
    content, _, n_kept = textfns.main_content_py(html)
    assert n_kept == 1 and content.startswith("plain")
    # raising the ceiling admits the link-heavy block too
    content2, _, n2 = textfns.main_content_py(html, max_link_density=1.0)
    assert n2 == 2


def test_tag_soup_tolerance():
    soup = "<div><p>unclosed paragraph with plenty of tokens to keep here ok</div><td>stray"
    content, n_blocks, n_kept = textfns.main_content_py(soup)
    assert "unclosed paragraph" in content
    # and pure junk never crashes
    for junk in ("", "<<<>>>", "<a href=", None):
        textfns.main_content_py(junk or "")


def test_br_and_startend_tags_split_blocks():
    html = "<p>alpha beta gamma delta epsilon zeta eta theta</p>iota<br/>kappa"
    blocks = textfns.extract_blocks_py(html)
    assert [b[0] for b in blocks] == [
        "alpha beta gamma delta epsilon zeta eta theta",
        "iota",
        "kappa",
    ]


def test_spark_matches_twin_on_corpus(spark, pages):
    got = {
        r["url"]: (r["content"], r["n_blocks"], r["n_kept"])
        for r in extract.extract_main_content(pages).collect()
    }
    src = pages.select("url", "html").collect()
    assert len(got) == len(src)
    for r in src:
        want = textfns.main_content_py(r["html"].decode("utf-8", errors="replace"))
        assert got[r["url"]] == want, r["url"]
    # the synth pages wrap their text in one <pre> block: extraction must
    # recover a non-empty content body for the vast majority
    nonempty = sum(1 for c, _, _ in got.values() if c)
    assert nonempty / len(got) > 0.9


def test_extract_plan_is_map_only(spark, pages):
    plan = (
        extract.extract_main_content(pages)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "MapInPandas" in plan
