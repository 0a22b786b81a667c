"""Deduplication operators — exact, shingle-Jaccard (exact, distributed),
and MinHash-LSH (the probabilistic scale path).

Design for 100 TB:
* exact dedup — one hash-agg on md5(text); Catalyst partial+final.
* exact near-dup — explode K-token shingles, apply the DF_MAX stop-shingle
  cut (schemas.DEDUP_DF_MAX: template shingles shared by thousands of docs
  carry no signal and make the pair join quadratic), equi-join on shingle
  (fan-out bounded by DF_MAX), count shared shingles per pair, integer
  Jaccard threshold. Every step is a plain shuffle-bounded DataFrame op.
* MinHash-LSH — 64 permutations banded 16×4; candidate pairs from band-
  bucket equality, then exact verification. Probabilistic recall; this is
  the variant that survives corpora where even the DF-cut leaves hot keys.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logagg.schemas import (
    DEDUP_DF_MAX,
    JACCARD_DEN,
    JACCARD_NUM,
    SHINGLE_K,
    SHINGLE_SEP,
)

# ---------------------------------------------------------------- exact


def exact_dupes(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: md5(text) → keeper id (min) + group size."""
    return (
        docs.groupBy(F.md5(F.col(text_col).cast("binary")).alias("text_md5"))
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n"))
    )


# ------------------------------------------------- exact shingle-Jaccard


def shingles(df: DataFrame, id_col: str = "url", text_col: str = "text") -> DataFrame:
    """(id, shingle) pairs — distinct K-token shingles per doc; short docs
    collapse to one whole-doc shingle (mirrors textfns.shingle_set)."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit(""))
    sh = F.when(
        F.size(toks) < SHINGLE_K, F.array(F.array_join(toks, SHINGLE_SEP))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - SHINGLE_K),
            lambda i: F.array_join(F.slice(toks, i + 1, SHINGLE_K), SHINGLE_SEP),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("shingle"))
        .filter(F.col("shingle") != "")
    )


def jaccard_pairs(df: DataFrame, id_col: str = "url", text_col: str = "text") -> DataFrame:
    """Exact near-duplicate pairs with J >= 0.8 after the DF_MAX cut.

    Integer-exact output (shared / set sizes) so the result is engine-
    portable with no float tolerance.
    """
    sh = shingles(df, id_col, text_col)

    # One aggregation produces both the document-frequency cut and the
    # postings list: collect ids per shingle, keep lists of size 2..DF_MAX
    # (df=1 shingles pair with nothing; df>DF_MAX are stop-shingles).
    # Persisted because sizes and pairs both consume it — without this the
    # whole explode+shuffle subtree runs twice.
    postings = (
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") <= DEDUP_DF_MAX)
        .persist()
    )

    sizes = (
        postings.select(F.explode("ids").alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("set_size"))
    )

    # pairwise combinations per postings list, JVM-side: ids are sorted, so
    # (ids[i], y in ids[i+1:]) enumerates each unordered pair once with
    # url_a < url_b. Replaces a full self-join shuffle of the exploded
    # (id, shingle) table with one explode over DF_MAX-bounded lists.
    ids = F.col("ids")
    combos = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("url_a"), y.alias("url_b")),
            ),
        )
    )
    shared = (
        postings.filter(F.size("ids") >= 2)
        .select(F.explode(combos).alias("p"))
        .groupBy(F.col("p.url_a").alias("url_a"), F.col("p.url_b").alias("url_b"))
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("url_a"), F.col("set_size").alias("na"))
    sb = sizes.select(F.col("id").alias("url_b"), F.col("set_size").alias("nb"))
    return (
        shared.join(sa, "url_a")
        .join(sb, "url_b")
        .filter(
            F.lit(JACCARD_NUM) * F.col("shared")
            >= F.lit(JACCARD_DEN) * (F.col("na") + F.col("nb"))
        )
        .select("url_a", "url_b", "shared", "na", "nb")
    )


# ----------------------------------------------------------- MinHash-LSH

MINHASH_PERMS = 64
LSH_BANDS = 16
LSH_ROWS = MINHASH_PERMS // LSH_BANDS
_MERSENNE = (1 << 61) - 1


def _perm_params(n: int = MINHASH_PERMS) -> tuple[np.ndarray, np.ndarray]:
    # a,b < 2^30 and crc32 < 2^32 keep a*x+b < 2^62: no int64 overflow, so
    # the whole signature computes as one vectorized numpy expression.
    rng = np.random.default_rng(0x5EED)
    a = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
    b = rng.integers(0, 1 << 30, size=n, dtype=np.int64)
    return a, b


def _band_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import zlib

    a, b = _perm_params()
    for pdf in batches:
        ids: list[str] = []
        bands: list[int] = []
        keys: list[str] = []
        for did, sh_list in zip(pdf["id"], pdf["shingle_list"]):
            if sh_list is None or len(sh_list) == 0:
                continue
            x = np.fromiter(
                (zlib.crc32(s.encode("utf-8")) for s in sh_list),
                dtype=np.int64,
                count=len(sh_list),
            )
            sig = ((a[:, None] * x[None, :] + b[:, None]) % _MERSENNE).min(axis=1)
            for band in range(LSH_BANDS):
                chunk = sig[band * LSH_ROWS : (band + 1) * LSH_ROWS]
                ids.append(did)
                bands.append(band)
                keys.append(",".join(str(int(v)) for v in chunk))
        yield pd.DataFrame(
            {
                "id": pd.Series(ids, dtype=object),
                "band": pd.Series(bands, dtype="int32"),
                "key": pd.Series(keys, dtype=object),
            }
        )


def minhash_candidates(
    df: DataFrame, id_col: str = "url", text_col: str = "text", _shingles: DataFrame | None = None
) -> DataFrame:
    """LSH candidate pairs: equal (band, minhash-band-key) → same bucket."""
    sh = _shingles if _shingles is not None else shingles(df, id_col, text_col)
    sh_lists = sh.groupBy("id").agg(F.collect_list("shingle").alias("shingle_list"))
    bands = sh_lists.mapInPandas(
        _band_batches, schema="id string, band int, key string"
    ).persist()  # self-joined below: without persist the minhash UDF runs twice
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("url_a"), F.col("b.id").alias("url_b"))
        .distinct()
    )


def minhash_lsh_dupes(df: DataFrame, id_col: str = "url", text_col: str = "text") -> DataFrame:
    """Scale-path near-dup: LSH candidates verified with exact Jaccard.

    Join fan-in is |candidates|, not |corpus|² — survives hot templates that
    defeat the exact pair join. Recall < 1 by construction (banding curve);
    precision = 1 because candidates are exactly verified.
    """
    sh = shingles(df, id_col, text_col).persist()  # consumed 4× below
    cands = minhash_candidates(df, id_col, text_col, _shingles=sh)
    sizes = sh.groupBy("id").agg(F.count("*").alias("set_size"))
    a_sh = sh.select(F.col("id").alias("url_a"), "shingle")
    b_sh = sh.select(F.col("id").alias("url_b"), "shingle")
    shared = (
        cands.join(a_sh, "url_a")
        .join(b_sh, ["url_b", "shingle"])
        .groupBy("url_a", "url_b")
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("url_a"), F.col("set_size").alias("na"))
    sb = sizes.select(F.col("id").alias("url_b"), F.col("set_size").alias("nb"))
    return (
        shared.join(sa, "url_a")
        .join(sb, "url_b")
        .filter(
            F.lit(JACCARD_NUM) * F.col("shared")
            >= F.lit(JACCARD_DEN) * (F.col("na") + F.col("nb"))
        )
        .select("url_a", "url_b", "shared", "na", "nb")
    )
