"""WARC (Web ARChive, ISO 28500) ingestion — the on-disk format a web-scale
text pipeline actually starts from (Common Crawl publishes ~100 TB of
``.warc.gz`` per monthly crawl).

Reference scope note: the reference ingests zip archives of log files
(aggregator/logs.py extracts the one member and decodes it); WARC is the
web-corpus analog of that archive step — a container of fetched pages whose
payloads feed the same downstream parse/curate path. This module supplies
the three pieces a crawler-to-trainer pipeline needs:

* :func:`build_warc_gz` / :func:`write_warc_dir` — a deterministic,
  stdlib-only WARC *writer* (each record its own gzip member — the Common
  Crawl convention, and the property that makes per-record random access
  possible) used to synthesize test/bench corpora from the pages table.
  No external data is fetched, ever.
* :func:`read_warc` — the Spark reader: ``binaryFile`` scan → one
  ``mapInPandas`` Arrow pass running the framing parser. Map-only: zero
  shuffles, no driver participation.
* :func:`warc_to_pages` — project ``response`` records onto the
  ``(url, warc_ts, html)`` pages shape so :func:`logagg.curate.curate_pages`
  (extract → curate) consumes a crawl unchanged.

Framing correctness notes (the traps, each pinned by a test):

* Record boundaries are governed by ``Content-Length``, NOT by scanning
  for the next ``WARC/1.`` magic — a page whose *body* contains the bytes
  ``WARC/1.0`` must round-trip intact.
* A reader must accept both one-gzip-member-per-record (Common Crawl) and
  a single gzip stream holding many records (some writers): the parser
  decompresses member-by-member into a carry buffer and frames records off
  the front, so both layouts — and records that *span* members — parse
  identically, and peak memory is O(largest record), not O(file).
* Malformed framing (truncation, flipped bytes, a lying Content-Length)
  loses only the damaged record: the parser resyncs on the next
  ``\\r\\nWARC/1.`` boundary and keeps going. Damaged-record counts are
  surfaced per file in the ``n_bad`` column of :func:`read_warc` rows
  (warc_type='__file_summary__') when ``emit_summary=True``.

100 TB scale shape: gzip members are not splittable, so the parallel unit
is the FILE — exactly how production Common Crawl jobs run (one task per
~1 GB warc.gz). ``binaryFile`` holds one file's *compressed* bytes per row;
decompression is streamed per member inside the kernel. With the standard
CC file size that is ~1 GB compressed per task and O(one record)
decompressed — sized for executor memory without tuning. More files ⇒ more
parallelism; the writer's ``records_per_file`` knob exists precisely so
synthetic corpora exercise multi-file scans.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from datetime import datetime, timezone
from pathlib import Path
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CRLF = b"\r\n"
WARC_VERSION = b"WARC/1.0"

# One flat record schema: header fields every consumer needs, payload as
# opaque binary (multimodal convention — logagg/multimodal.py).
WARC_SCHEMA = (
    "warc_file string, warc_type string, record_id string, url string, "
    "warc_date string, http_status int, mime string, payload binary, "
    "n_bad int"
)


# ---------------------------------------------------------------------------
# writer (driver/test side — deterministic synthesis, stdlib only)
# ---------------------------------------------------------------------------

def _record_id(url: str, date: str, kind: str) -> str:
    h = hashlib.md5(f"{kind}:{date}:{url}".encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def _warc_record(
    warc_type: str,
    headers: list[tuple[str, str]],
    body: bytes,
) -> bytes:
    """Serialize one WARC record (version line, headers, blank line, body,
    two CRLF record separators — §4 of the spec)."""
    head = [WARC_VERSION]
    head += [f"{k}: {v}".encode() for k, v in headers]
    head.append(f"Content-Length: {len(body)}".encode())
    return CRLF.join(head) + CRLF + CRLF + body + CRLF + CRLF


def _gzip_member(raw: bytes) -> bytes:
    """One deterministic gzip member (mtime pinned to 0 — byte-stable
    output is what lets tests hash files and caches stay valid)."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


def _iso(ts: datetime) -> str:
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def build_warc_gz(
    records: Iterable[dict],
    *,
    warcinfo: str = "software: logagg-synth",
    with_requests: bool = False,
    member_per_record: bool = True,
) -> bytes:
    """Build one ``.warc.gz`` file from dicts of
    ``{url, date (datetime|str), payload (bytes), status, mime}``.

    Emits a leading ``warcinfo`` record (as real crawls do) and, with
    ``with_requests``, a ``request`` record before each ``response`` — so
    readers must actually *filter* by WARC-Type rather than assume
    homogeneity. ``member_per_record=False`` compresses the whole file as
    one gzip stream (the alternate layout the parser must also accept).
    """
    info_date = None
    raws: list[bytes] = []
    for rec in records:
        date = rec["date"]
        iso = date if isinstance(date, str) else _iso(date)
        if info_date is None:
            info_date = iso
        url = rec["url"]
        payload = rec["payload"]
        status = int(rec.get("status", 200))
        mime = rec.get("mime", "text/html")
        if with_requests:
            req_body = (
                f"GET {url} HTTP/1.1\r\nHost: synthetic\r\n\r\n".encode()
            )
            raws.append(
                _warc_record(
                    "request",
                    [
                        ("WARC-Type", "request"),
                        ("WARC-Record-ID", _record_id(url, iso, "request")),
                        ("WARC-Date", iso),
                        ("WARC-Target-URI", url),
                        ("Content-Type", "application/http; msgtype=request"),
                    ],
                    req_body,
                )
            )
        reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(
            status, "Status"
        )
        http = (
            f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {mime}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode() + payload
        raws.append(
            _warc_record(
                "response",
                [
                    ("WARC-Type", "response"),
                    ("WARC-Record-ID", _record_id(url, iso, "response")),
                    ("WARC-Date", iso),
                    ("WARC-Target-URI", url),
                    ("Content-Type", "application/http; msgtype=response"),
                ],
                http,
            )
        )
    info_body = (warcinfo + "\r\n").encode()
    info = _warc_record(
        "warcinfo",
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", _record_id("warcinfo", info_date or "", "info")),
            ("WARC-Date", info_date or "1970-01-01T00:00:00Z"),
            ("Content-Type", "application/warc-fields"),
        ],
        info_body,
    )
    raws.insert(0, info)
    if member_per_record:
        return b"".join(_gzip_member(r) for r in raws)
    return _gzip_member(b"".join(raws))


def write_warc_dir(
    records: list[dict],
    out_dir: str | Path,
    *,
    records_per_file: int = 2000,
    with_requests: bool = False,
) -> list[Path]:
    """Write ``part-NNNNN.warc.gz`` files (CC-style multi-file layout →
    natural file-level scan parallelism). Returns the written paths."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths: list[Path] = []
    for fi, start in enumerate(range(0, len(records), records_per_file)):
        chunk = records[start : start + records_per_file]
        p = out / f"part-{fi:05d}.warc.gz"
        p.write_bytes(build_warc_gz(chunk, with_requests=with_requests))
        paths.append(p)
    return paths


WARC_CACHE_VERSION = 1


def ensure_warc_cache(sf_dir: str, *, records_per_file: int = 2000) -> Path:
    """Materialize (once) a ``.warc.gz`` corpus for the scale tag of
    ``sf_dir``, built from the deterministic pages cache — the ingest-side
    bench/test input. Byte-stable (pinned gzip mtime), versioned beside the
    pages cache under ``.cache/warc/<sf>/``."""
    import json

    from logagg import synth

    pages_dir = synth.ensure_cache(sf_dir, expected=False)
    out = synth.CACHE_ROOT.parent / "warc" / Path(sf_dir.rstrip("/")).name
    meta_path = out / "_meta.json"
    want = {
        "version": WARC_CACHE_VERSION,
        "pages_version": synth.GEN_VERSION,
        "records_per_file": records_per_file,
    }
    if meta_path.exists() and json.loads(meta_path.read_text()) == want:
        return out
    import pyarrow.parquet as pq

    pdf = pq.read_table(
        pages_dir / "pages.parquet", columns=["url", "warc_ts", "html"]
    ).to_pandas()
    pdf = pdf.sort_values("url").reset_index(drop=True)
    if out.exists():
        for p in out.glob("part-*.warc.gz"):
            p.unlink()
    write_warc_dir(
        pages_to_warc_records(pdf),
        out,
        records_per_file=records_per_file,
        with_requests=True,
    )
    meta_path.write_text(json.dumps(want))
    return out


def pages_to_warc_records(pdf: pd.DataFrame) -> list[dict]:
    """Adapt a pandas slice of the pages table (url, warc_ts, html) to the
    writer's record dicts."""
    return [
        {
            "url": u,
            "date": t.to_pydatetime() if hasattr(t, "to_pydatetime") else t,
            "payload": bytes(h),
            "status": 200,
            "mime": "text/html",
        }
        for u, t, h in zip(pdf["url"], pdf["warc_ts"], pdf["html"])
    ]


# ---------------------------------------------------------------------------
# parser (executor side — pure function of bytes, independently testable)
# ---------------------------------------------------------------------------

def _iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a (possibly multi-member) gzip byte string one member at
    a time. Raises zlib.error on a corrupt member — callers decide policy."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=47)  # 47 = auto gzip/zlib header
        yield d.decompress(data[pos:])
        tail = d.unused_data
        if not tail:
            break
        pos = n - len(tail)


def _parse_headers(block: bytes) -> dict:
    headers: dict = {}
    for line in block.split(CRLF):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
    return headers


class _Framer:
    """Incremental WARC record framer over a carry buffer: feed decompressed
    chunks, pop complete records. Content-Length drives boundaries; on
    malformed framing it drops to the next ``CRLF + 'WARC/1.'`` magic and
    counts the loss."""

    def __init__(self) -> None:
        self.buf = b""
        self.n_bad = 0
        self.eof = False

    def feed(self, chunk: bytes) -> None:
        self.buf += chunk

    def _resync(self) -> None:
        nxt = self.buf.find(CRLF + b"WARC/1.", 1)
        self.n_bad += 1
        self.buf = self.buf[nxt + 2 :] if nxt >= 0 else b""

    def pop_records(self) -> Iterator[tuple[dict, bytes]]:
        """Yield (warc_headers, body) for each complete record in the
        buffer; leave any trailing partial record for the next feed()."""
        while True:
            self.buf = self.buf.lstrip(b"\r\n")
            if not self.buf:
                return
            if not self.buf.startswith(b"WARC/"):
                if not self.eof and CRLF + b"WARC/1." not in self.buf:
                    return  # garbage so far, magic may arrive next member
                self._resync()
                continue
            head_end = self.buf.find(CRLF + CRLF)
            if head_end < 0:
                if self.eof:  # header can never complete — skip to next magic
                    self._resync()
                    continue
                return  # incomplete header block — wait for more bytes
            headers = _parse_headers(self.buf[: head_end])
            try:
                clen = int(headers["content-length"])
                if clen < 0:
                    raise ValueError
            except (KeyError, ValueError):
                self._resync()
                continue
            body_start = head_end + 4
            body_end = body_start + clen
            if len(self.buf) < body_end:
                if self.eof:
                    # body can never complete (truncation — or a lying
                    # Content-Length shadowing later records): resync so
                    # only the damaged record is lost
                    self._resync()
                    continue
                return  # body spans into the next member
            body = self.buf[body_start:body_end]
            # a well-formed record is followed by CRLF CRLF; tolerate EOF
            trailer = self.buf[body_end : body_end + 4]
            if trailer not in (CRLF + CRLF, b"") and not (
                self.eof and len(self.buf) <= body_end + 4
            ):
                if trailer.startswith(CRLF) and len(self.buf) < body_end + 4:
                    return  # trailer split across members
                self._resync()
                continue
            self.buf = self.buf[body_end + 4 :]
            yield headers, body


def parse_warc_file(data: bytes, path: str) -> tuple[list[dict], int]:
    """Parse one ``.warc.gz`` file's bytes into record rows.

    Returns ``(rows, n_bad)``; a corrupt gzip member or malformed record
    costs only itself (resync), never the rest of the file."""
    rows: list[dict] = []
    framer = _Framer()

    def drain() -> None:
        for headers, body in framer.pop_records():
            warc_type = headers.get("warc-type", "")
            status = None
            mime = None
            payload = body
            if warc_type == "response" and body[:5] == b"HTTP/":
                he = body.find(CRLF + CRLF)
                if he >= 0:
                    http_head = _parse_headers(body[:he])
                    first = body[: body.find(CRLF)].split(b" ")
                    try:
                        status = int(first[1])
                    except (IndexError, ValueError):
                        status = None
                    mime = http_head.get("content-type")
                    if mime and ";" in mime:
                        mime = mime.split(";", 1)[0].strip()
                    payload = body[he + 4 :]
            rows.append(
                {
                    "warc_file": path,
                    "warc_type": warc_type,
                    "record_id": headers.get("warc-record-id", ""),
                    "url": headers.get("warc-target-uri", ""),
                    "warc_date": headers.get("warc-date", ""),
                    "http_status": status,
                    "mime": mime,
                    "payload": payload,
                }
            )

    try:
        for member in _iter_gzip_members(data):
            framer.feed(member)
            drain()
    except zlib.error:
        # corrupt member: whatever framed so far survives; bytes after the
        # damage are unrecoverable without member offsets
        framer.n_bad += 1
    framer.eof = True
    drain()
    return rows, framer.n_bad


# ---------------------------------------------------------------------------
# Spark reader
# ---------------------------------------------------------------------------

def read_warc(
    spark: SparkSession,
    path: str,
    *,
    record_types: tuple[str, ...] | None = ("response",),
    emit_summary: bool = False,
) -> DataFrame:
    """Scan ``*.warc.gz`` under ``path`` into the flat record table.

    Plan: ``binaryFile`` scan → ``mapInPandas`` — map-only, no Exchange
    (pinned by tests/test_warc.py plan check). ``record_types`` filters
    INSIDE the kernel (requests/warcinfo never cross Arrow). With
    ``emit_summary`` each file also yields one ``__file_summary__`` row
    carrying its damaged-record count in ``n_bad``."""
    files = spark.read.format("binaryFile").load(f"{path}/*.warc.gz").select(
        "path", "content"
    )
    return files.mapInPandas(
        _warc_kernel(record_types, emit_summary), schema=WARC_SCHEMA
    )


BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_warc_stream(
    spark: SparkSession,
    path: str,
    *,
    record_types: tuple[str, ...] | None = ("response",),
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Continuous-ingest variant: the same parse kernel over a
    ``binaryFile`` FILE STREAM source — new ``.warc.gz`` files landing in
    ``path`` (a live crawl's output directory) are parsed exactly once per
    file, with the stream checkpoint carrying which files are done. Batch
    and stream share :func:`_warc_kernel`, so row-level results are
    identical by construction (pinned in tests)."""
    reader = spark.readStream.format("binaryFile").schema(BINARY_FILE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(f"{path}/*.warc.gz").select("path", "content")
    return files.mapInPandas(_warc_kernel(record_types, False), schema=WARC_SCHEMA)


def _warc_kernel(record_types: tuple[str, ...] | None, emit_summary: bool):
    keep = set(record_types) if record_types is not None else None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split(" ")[0] for f in WARC_SCHEMA.split(", ")]
        for pdf in batches:
            out: list[dict] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows, n_bad = parse_warc_file(bytes(content), p)
                for r in rows:
                    if keep is None or r["warc_type"] in keep:
                        r["n_bad"] = 0
                        out.append(r)
                if emit_summary:
                    out.append(
                        {
                            "warc_file": p,
                            "warc_type": "__file_summary__",
                            "record_id": "",
                            "url": "",
                            "warc_date": "",
                            "http_status": None,
                            "mime": None,
                            "payload": b"",
                            "n_bad": n_bad,
                        }
                    )
            res = pd.DataFrame(out, columns=cols)
            # None-bearing int columns must be pandas nullable ints — a
            # plain object/float64 column fails the Arrow cast to int32
            res["http_status"] = res["http_status"].astype("Int32")
            res["n_bad"] = res["n_bad"].astype("Int32")
            yield res

    return kernel


def warc_to_pages(records: DataFrame) -> DataFrame:
    """Project ``response`` records onto the pages shape
    ``(url, warc_ts timestamp, html binary)`` consumed by
    :func:`logagg.curate.curate_pages`: 200-status text/html only, WARC-Date
    parsed from its ISO-8601 Z form. Pure Catalyst — stays in the same
    map-only stage as the parse kernel."""
    return (
        records.filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & (F.col("mime") == "text/html")
        )
        .select(
            F.col("url"),
            F.to_timestamp(
                F.col("warc_date"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
            ).alias("warc_ts"),
            F.col("payload").alias("html"),
        )
    )
