"""Deduplication operators — exact (md5), shingle-Jaccard (exact,
distributed), MinHash-LSH (probabilistic scale path), SimHash (Hamming
near-dup, pigeonhole-exact banding), and embedding-cosine near-dup.

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


def _shingle_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from logagg import textfns

    for pdf in batches:
        ids: list = []
        shs: list = []
        for did, text in zip(pdf["id"], pdf["text"]):
            if not isinstance(text, str):
                continue
            ss = textfns.shingle_set(text)
            ss.discard("")
            ids.extend([did] * len(ss))
            shs.extend(ss)
        yield pd.DataFrame(
            {"id": pd.Series(ids, dtype=object), "shingle": pd.Series(shs, dtype=object)}
        )


def shingles(df: DataFrame, id_col: str = "url", text_col: str = "text") -> DataFrame:
    """(id, shingle) pairs — distinct K-token shingles per doc; short docs
    collapse to one whole-doc shingle (textfns.shingle_set semantics).

    Arrow-batched Python, not a Catalyst higher-order expression: measured
    2.7× faster (6 s vs 17 s for 7.5M shingles at sf0.1) — per-element
    string building in transform/slice/array_join generates far more JVM
    garbage than one CPython pass over the tokens."""
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    return src.mapInPandas(_shingle_batches, schema="id string, shingle string")


def stop_shingles(sh: DataFrame) -> DataFrame:
    """Shingles with document frequency > DEDUP_DF_MAX (template lines like
    'INFO | jvm 1 |' shared by thousands of pages — no dedup signal)."""
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > DEDUP_DF_MAX)
        .select("shingle")
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


# --------------------------------------------------------------- SimHash

SIMHASH_BITS = 64
SIMHASH_MAX_HAMMING = 3
_SIM_BANDS = 4  # pigeonhole: dist<=3 → at least one of 4 16-bit bands equal


def _simhash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import zlib

    weights = (1 << np.arange(SIMHASH_BITS, dtype=np.uint64)).astype(np.uint64)
    for pdf in batches:
        ids, sims = [], []
        for did, text in zip(pdf["id"], pdf["text"]):
            toks = text.split() if isinstance(text, str) else []
            if not toks:
                continue
            h = np.fromiter(
                (zlib.crc32(t.encode()) | (zlib.crc32(t[::-1].encode()) << 32) for t in set(toks)),
                dtype=np.uint64,
            )
            bits = ((h[:, None] >> np.arange(SIMHASH_BITS, dtype=np.uint64)) & 1).astype(np.int64)
            vote = (2 * bits - 1).sum(axis=0)
            sims.append(int(((vote > 0).astype(np.uint64) * weights).sum()))
            ids.append(did)
        yield pd.DataFrame(
            {"id": pd.Series(ids, dtype=object), "simhash": pd.Series(sims, dtype="uint64").astype("int64")}
        )


def simhash(df: DataFrame, id_col: str = "url", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document (token-set sign-vote, Arrow-batched)."""
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    return src.mapInPandas(_simhash_batches, schema="id string, simhash long")


def simhash_dupes(df: DataFrame, id_col: str = "url", text_col: str = "text") -> DataFrame:
    """Near-dup pairs with Hamming distance <= 3 between SimHashes.

    Banding (4×16 bits) is exact here by pigeonhole — ≤3 differing bits
    leave at least one band identical — so this finds ALL qualifying pairs
    with bucket-bounded join fan-out (no |corpus|² scan).
    """
    sh = simhash(df, id_col, text_col).persist()
    bands = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                )
                for i in range(_SIM_BANDS)
            ])
        ).alias("b"),
    ).select("id", "simhash", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("url_a"),
            F.col("b.id").alias("url_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
    )
    return pairs


# ------------------------------------------- embedding-cosine near-dup


def embedding_dupes(embeddings: DataFrame, threshold: float = 0.4) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold.

    Exact O(n²) formulation for the oracle scale; the production path is
    the LSH bucketing in logagg.similarity (same kernel, bounded buckets).
    """
    base = embeddings.select(
        F.col("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    a = base.select(F.col("vec_id").alias("id_a"), F.col("emb").alias("ea"))
    b = base.select(F.col("vec_id").alias("id_b"), F.col("emb").alias("eb"))
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", dot / (norm("ea") * norm("eb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 4).alias("sim"))
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


def _band_batches_fn(stop: frozenset):
    """(id, text) → LSH band keys, all inside one Arrow pass: tokenize,
    shingle (textfns semantics), drop stop-shingles, crc32, vectorized
    minhash, band split. No explode / collect_list shuffle — the signature
    never leaves Python until it is 16 short band rows per doc.

    The stop-shingle cut here is load-bearing: template shingles give every
    pair of log pages a raw-set Jaccard of ~0.1-0.2, which the banding curve
    turns into millions of false candidates (measured 2.29M at sf0.1; tens
    of thousands after the cut). It also aligns minhash semantics with the
    exact operator's effective sets."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        from logagg import textfns

        a, b = _perm_params()
        for pdf in batches:
            ids: list[str] = []
            bands: list[int] = []
            keys: list[str] = []
            for did, text in zip(pdf["id"], pdf["text"]):
                sh_set = textfns.shingle_set(text) if isinstance(text, str) else set()
                sh_set.discard("")
                sh_set -= stop
                if not sh_set:
                    continue
                x = np.fromiter(
                    (zlib.crc32(s.encode("utf-8")) for s in sh_set),
                    dtype=np.int64,
                    count=len(sh_set),
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

    return run


def minhash_candidates(
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    stop: frozenset = frozenset(),
) -> DataFrame:
    """LSH candidate pairs: equal (band, minhash-band-key) → same bucket."""
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    bands = src.mapInPandas(
        _band_batches_fn(stop), schema="id string, band int, key string"
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
    # the stop-shingle set comes from one aggregation over the corpus
    # shingles (at production scale: over a sample) and is tiny — collect
    # and ship it into the minhash UDF closure
    sh_all = shingles(df, id_col, text_col).persist()
    stop = frozenset(r["shingle"] for r in stop_shingles(sh_all).collect())
    cands = minhash_candidates(df, id_col, text_col, stop=stop).persist()
    # exact verification only touches docs that appear in some candidate
    # pair — semi-join the shingle table down, and drop stop-shingles so
    # verification Jaccard matches the effective-set semantics
    cand_ids = (
        cands.select(F.col("url_a").alias("cid"))
        .union(cands.select(F.col("url_b").alias("cid")))
        .distinct()
    )
    stop_df = stop_shingles(sh_all)
    sh = (
        sh_all.join(cand_ids, sh_all["id"] == F.col("cid"), "left_semi")
        .join(F.broadcast(stop_df), "shingle", "left_anti")
        .persist()
    )
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
