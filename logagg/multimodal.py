"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata.

The container has no image/audio codecs, so the decode kernel is a
deterministic stub (clearly marked); the Spark-side plumbing — schema,
column pruning, Arrow batch shape, partition parallelism — is real and
tested. Swapping ``_fake_decode`` for a PIL/ffmpeg call is a one-function
change that does not touch the plan.
"""

from __future__ import annotations

import hashlib
import importlib.util
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "url string, media_kind string, byte_len long, magic string, "
    "width int, height int, feature0 double, feature1 double"
)

# explicit codec probe: the stub kernel stays ONLY because no image codec
# exists in this runtime. If this ever flips to True, swap _fake_decode for
# the real decode inside _decode_batches (the plan does not change) — a
# test asserts on this flag so the flip is loud, not silent.
REAL_CODECS_AVAILABLE = importlib.util.find_spec("PIL") is not None


def html_meta(pages: DataFrame) -> DataFrame:
    """Pure-JVM metadata over the binary column (no Python in the path)."""
    return pages.select(
        "url",
        F.length("html").cast("long").alias("html_bytes"),
        F.length("text").cast("long").alias("text_chars"),
        "lang",
    )


def _sniff(payload: bytes) -> str:
    if payload[:15] == b"<!DOCTYPE html>" or payload[:5] == b"<html":
        return "html"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] == b"RIFF":
        return "riff"
    return "unknown"


def _fake_decode(payload: bytes) -> tuple[int, int, float, float]:
    """STUB decode: a real deployment decodes pixels/samples here. The stub
    derives deterministic pseudo-features from a digest so downstream
    plumbing (schema, batching, aggregation) is exercised end-to-end."""
    d = hashlib.blake2b(payload, digest_size=16).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    f0 = int.from_bytes(d[2:6], "big") / 2**32
    f1 = int.from_bytes(d[6:10], "big") / 2**32
    return width, height, f0, f1


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {k: [] for k in ("url", "media_kind", "byte_len", "magic", "width", "height", "feature0", "feature1")}
        for url, payload in zip(pdf["url"], pdf["html"]):
            b = bytes(payload) if payload is not None else b""
            w, h, f0, f1 = _fake_decode(b)
            rows["url"].append(url)
            rows["media_kind"].append(_sniff(b))
            rows["byte_len"].append(len(b))
            rows["magic"].append(b[:6].hex())
            rows["width"].append(w)
            rows["height"].append(h)
            rows["feature0"].append(f0)
            rows["feature1"].append(f1)
        yield pd.DataFrame(
            {
                "url": pd.Series(rows["url"], dtype=object),
                "media_kind": pd.Series(rows["media_kind"], dtype=object),
                "byte_len": pd.Series(rows["byte_len"], dtype="int64"),
                "magic": pd.Series(rows["magic"], dtype=object),
                "width": pd.Series(rows["width"], dtype="int32"),
                "height": pd.Series(rows["height"], dtype="int32"),
                "feature0": pd.Series(rows["feature0"], dtype="float64"),
                "feature1": pd.Series(rows["feature1"], dtype="float64"),
            }
        )


def decode_media(pages: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column."""
    return pages.select("url", "html").mapInPandas(_decode_batches, schema=DECODE_SCHEMA)


def resize_media(pages: DataFrame, max_side: int = 128) -> DataFrame:
    """Aspect-preserving thumbnail dimensions for every decoded medium.

    The decode is the (stubbed) Arrow kernel above; the resize ARITHMETIC
    is deliberately JVM-side and integer-exact — ``shorter·max_side //
    longer`` with a floor-1 clamp — so it is engine-portable bit-for-bit
    and costs nothing per row. A real deployment does the pixel resample
    inside the decode UDF at these target dims (one Python hop total, the
    plan does not change)."""
    decoded = decode_media(pages)
    w, h = F.col("width").cast("long"), F.col("height").cast("long")
    longer = F.greatest(w, h)
    fit = lambda side: F.when(  # noqa: E731
        longer <= max_side, side
    ).otherwise(F.greatest(F.lit(1), (side * max_side) / longer).cast("long"))
    # integer division: (side * max_side) / longer floors via cast("long")
    # only for non-negative operands — true here (dims are positive)
    return decoded.select(
        "url",
        "media_kind",
        "width",
        "height",
        fit(w).cast("int").alias("out_w"),
        fit(h).cast("int").alias("out_h"),
    )


def frame_sample(
    pages: DataFrame, frame_ms: int = 40, bytes_per_frame: int = 256, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling schedule for media payloads: 1→N fan-out of
    (frame_idx, ts_ms) per payload, frame count derived from payload size,
    capped. The SCHEDULE is pure Catalyst (length → sequence → explode — a
    narrow fan-out that scales as a flatMap, no Python); ``frame_sig`` is
    the deterministic stub standing where a real pipeline drops to an
    Arrow-batched frame-decode UDF keyed by (url, ts_ms)."""
    n = F.least(F.lit(max_frames), 1 + (F.length("html") / bytes_per_frame).cast("long"))
    return (
        pages.select("url", F.explode(F.sequence(F.lit(0).cast("long"), n - 1)).alias("frame_idx"))
        .select(
            "url",
            "frame_idx",
            (F.col("frame_idx") * frame_ms).alias("ts_ms"),
            F.md5(F.concat_ws(":", "url", "frame_idx").cast("binary")).alias("frame_sig"),
        )
    )
