"""WARC ingestion: writer↔reader round-trip, framing traps, damage
tolerance, the pages bridge, and the map-only plan contract."""

import gzip

import pytest

from pyspark.sql import functions as F

from logagg import warc

N = 60  # pages used for the round-trip corpora


@pytest.fixture(scope="module")
def pages_pdf(spark, pages_cache):
    return (
        spark.read.parquet(f"{pages_cache}/pages.parquet")
        .orderBy("url")
        .limit(N)
        .toPandas()
    )


@pytest.fixture(scope="module")
def warc_dir(pages_pdf, tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    recs = warc.pages_to_warc_records(pages_pdf)
    paths = warc.write_warc_dir(recs, d, records_per_file=25, with_requests=True)
    assert len(paths) == 3  # 60 pages / 25 → multi-file scan
    return str(d)


def test_round_trip_payloads_exact(spark, pages_pdf, warc_dir):
    got = warc.read_warc(spark, warc_dir).toPandas()
    assert set(got["warc_type"]) == {"response"}  # requests/info filtered
    assert len(got) == N
    want = {u: bytes(h) for u, h in zip(pages_pdf["url"], pages_pdf["html"])}
    for u, p, st, mime in zip(
        got["url"], got["payload"], got["http_status"], got["mime"]
    ):
        assert bytes(p) == want[u]
        assert st == 200 and mime == "text/html"


def test_all_record_types_and_summary(spark, warc_dir):
    got = warc.read_warc(
        spark, warc_dir, record_types=None, emit_summary=True
    ).toPandas()
    counts = got["warc_type"].value_counts().to_dict()
    assert counts["response"] == N
    assert counts["request"] == N
    assert counts["warcinfo"] == 3  # one per file
    assert counts["__file_summary__"] == 3
    assert (got[got["warc_type"] == "__file_summary__"]["n_bad"] == 0).all()


def test_single_member_layout_equivalent(pages_pdf):
    recs = warc.pages_to_warc_records(pages_pdf)[:10]
    multi = warc.parse_warc_file(warc.build_warc_gz(recs), "m")
    single = warc.parse_warc_file(
        warc.build_warc_gz(recs, member_per_record=False), "s"
    )
    assert multi[1] == 0 and single[1] == 0
    strip = lambda rows: [
        {k: v for k, v in r.items() if k != "warc_file"} for r in rows
    ]
    assert strip(multi[0]) == strip(single[0])


def test_payload_containing_warc_magic_round_trips():
    """Content-Length, not magic-scanning, frames records: a body embedding
    the record separator + version line must survive byte-exact."""
    evil = b"<html>\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nfake</html>"
    recs = [
        {"url": "http://a/x", "date": "2022-07-11T00:00:00Z", "payload": evil},
        {"url": "http://a/y", "date": "2022-07-11T00:00:07Z", "payload": b"ok"},
    ]
    rows, n_bad = warc.parse_warc_file(warc.build_warc_gz(recs), "f")
    resp = [r for r in rows if r["warc_type"] == "response"]
    assert n_bad == 0 and len(resp) == 2
    assert resp[0]["payload"] == evil and resp[1]["payload"] == b"ok"


def test_record_spanning_members():
    """A record split across gzip members (carry buffer) parses whole."""
    recs = [
        {"url": "http://a/1", "date": "2022-07-11T00:00:00Z", "payload": b"A" * 500},
        {"url": "http://a/2", "date": "2022-07-11T00:00:07Z", "payload": b"B" * 500},
    ]
    raw = gzip.decompress(warc.build_warc_gz(recs, member_per_record=False))
    cut = len(raw) // 2  # mid-record for sure
    data = warc._gzip_member(raw[:cut]) + warc._gzip_member(raw[cut:])
    rows, n_bad = warc.parse_warc_file(data, "f")
    assert n_bad == 0
    assert [r["payload"] for r in rows if r["warc_type"] == "response"] == [
        b"A" * 500,
        b"B" * 500,
    ]


def test_corrupt_record_resync_loses_only_itself():
    recs = [
        {"url": f"http://a/{i}", "date": "2022-07-11T00:00:00Z", "payload": b"x%d" % i}
        for i in range(5)
    ]
    members = [
        warc._gzip_member(m)
        for m in (
            warc._warc_record(
                "response",
                [("WARC-Type", "response"), ("WARC-Target-URI", r["url"]),
                 ("WARC-Date", r["date"])],
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + r["payload"],
            )
            for r in recs
        )
    ]
    # re-frame member #2's record with a LYING Content-Length (framing damage
    # inside an intact gzip stream)
    bad_raw = gzip.decompress(members[2]).replace(
        b"Content-Length:", b"Content-Length: 999999\r\nX-Orig:", 1
    )
    members[2] = warc._gzip_member(bad_raw)
    rows, n_bad = warc.parse_warc_file(b"".join(members), "f")
    urls = [r["url"] for r in rows]
    assert n_bad >= 1
    assert "http://a/2" not in urls
    for i in (0, 1, 3, 4):
        assert f"http://a/{i}" in urls


def test_truncated_file_keeps_complete_records(pages_pdf):
    recs = warc.pages_to_warc_records(pages_pdf)[:8]
    data = warc.build_warc_gz(recs)
    rows_full, _ = warc.parse_warc_file(data, "f")
    rows_cut, n_bad = warc.parse_warc_file(data[: len(data) * 2 // 3], "f")
    assert 0 < len(rows_cut) < len(rows_full)
    complete = {r["record_id"] for r in rows_cut}
    full_ids = [r["record_id"] for r in rows_full]
    assert all(rid in full_ids for rid in complete)


def test_warc_to_pages_matches_source(spark, pages_pdf, warc_dir):
    got = (
        warc.warc_to_pages(warc.read_warc(spark, warc_dir))
        .orderBy("url")
        .toPandas()
    )
    assert list(got["url"]) == list(pages_pdf["url"])
    assert [bytes(h) for h in got["html"]] == [bytes(h) for h in pages_pdf["html"]]
    # WARC-Date second-granularity round-trip of warc_ts
    assert [t.floor("s") for t in pages_pdf["warc_ts"]] == list(got["warc_ts"])


def test_extraction_over_warc_equals_direct(spark, pages_pdf, warc_dir):
    """The crawl path (warc → pages → extract) yields the same text as
    extracting from the source pages table."""
    from logagg import extract

    direct = (
        extract.extract_main_content(
            spark.createDataFrame(pages_pdf[["url", "html"]])
        )
        .orderBy("url")
        .toPandas()
    )
    via_warc = (
        extract.extract_main_content(
            warc.warc_to_pages(warc.read_warc(spark, warc_dir))
        )
        .orderBy("url")
        .toPandas()
    )
    assert list(direct["content"]) == list(via_warc["content"])


def test_read_warc_plan_map_only(spark, warc_dir):
    plan = (
        warc.read_warc(spark, warc_dir)
        .filter(F.col("http_status") == 200)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# property fuzz
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(
    payloads=st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=6),
    per_member=st.booleans(),
)
def test_fuzz_arbitrary_payloads_round_trip(payloads, per_member):
    recs = [
        {"url": f"http://f/{i}", "date": "2022-07-11T00:00:00Z", "payload": p}
        for i, p in enumerate(payloads)
    ]
    data = warc.build_warc_gz(recs, member_per_record=per_member)
    rows, n_bad = warc.parse_warc_file(data, "f")
    resp = [r for r in rows if r["warc_type"] == "response"]
    assert n_bad == 0
    assert [r["payload"] for r in resp] == payloads
    assert [r["url"] for r in resp] == [r["url"] for r in recs]


@settings(max_examples=60, deadline=None)
@given(junk=st.binary(min_size=0, max_size=2000))
def test_fuzz_garbage_never_raises(junk):
    rows, n_bad = warc.parse_warc_file(junk, "f")
    assert isinstance(rows, list)


@settings(max_examples=30, deadline=None)
@given(junk=st.binary(min_size=1, max_size=200), cut=st.integers(0, 10**6))
def test_fuzz_gzipped_garbage_never_raises(junk, cut):
    data = warc._gzip_member(junk)
    rows, n_bad = warc.parse_warc_file(data[: max(1, len(data) - cut % len(data))], "f")
    assert isinstance(rows, list)


# ---------------------------------------------------------------------------
# streaming ingest
# ---------------------------------------------------------------------------

def test_stream_equals_batch_and_exactly_once_per_file(
    spark, pages_pdf, tmp_path_factory
):
    d = tmp_path_factory.mktemp("warcstream")
    ckpt = str(d / "_ckpt")
    recs = warc.pages_to_warc_records(pages_pdf)
    warc.write_warc_dir(recs[:30], d, records_per_file=15)

    out = str(d / "_out")

    def drain():
        q = (
            warc.read_warc_stream(spark, str(d))
            .select("url", "record_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got1 = spark.read.parquet(out).toPandas()
    batch1 = warc.read_warc(spark, str(d)).select("url", "record_id").toPandas()
    assert sorted(got1["record_id"]) == sorted(batch1["record_id"])

    # a new file lands; restart the stream: ONLY its records are appended
    (d / "part-99999.warc.gz").write_bytes(warc.build_warc_gz(
        warc.pages_to_warc_records(pages_pdf)[30:40]
    ))
    drain()
    got2 = spark.read.parquet(out).toPandas()
    batch2 = warc.read_warc(spark, str(d)).select("url", "record_id").toPandas()
    assert sorted(got2["record_id"]) == sorted(batch2["record_id"])
    assert len(got2) == len(got1) + 10
