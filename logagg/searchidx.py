"""Full-text search over the curated corpus: a term-bucketed inverted
index in parquet plus BM25 (Robertson & Zaragoza 2009, public) ranked
retrieval — the "find documents about X" query every web-corpus owner
runs, and the retrieval half of a RAG/dedup-audit loop.

Reference scope note: the reference's query surface is equality filter +
sort + point lookup (aggregator/view.py); free-text relevance ranking is
the webtext-native generalization of its "find this record" queries.

Index layout (``build_index`` → ``<out_dir>/``):

* ``postings/`` — ``(term, id, tf, dl)`` partitioned by
  ``bucket = pmod(xxhash64(term), num_buckets)`` and sorted by ``term``
  within each file. Doc length ``dl`` is DENORMALIZED into every posting
  on purpose: BM25 needs it per hit, and at corpus scale a join from a
  term-sliced posting list back to a corpus-sized docstats table would
  shuffle the whole corpus per query. Repeating a small integer costs
  ~nothing under parquet RLE; the join costs a shuffle.
* ``meta/`` — one row: ``(n_docs, avgdl, num_buckets)``.

Query shape (``bm25_search``, the plan that survives 100×): the query's
terms resolve to ≤ |query| buckets, so the scan reads only those
partitions (``PartitionFilters`` on ``bucket`` — pinned in tests) and
pushes ``term IN (...)`` into the parquet scan of the sorted files
(row-group min/max skip). Per-term document frequency is ONE count over
the already-sliced postings, broadcast back; scoring is pure Catalyst
arithmetic; top-k is ``orderBy().limit()`` — TakeOrdered partials, no
global sort. Nothing corpus-sized moves.

Build shape: one ``explode`` of the token array, one partial+final
``(id, term)`` count (the key includes ``id``, so stopword skew cannot
concentrate a term on one task), one ``id``-keyed doc-length agg joined
back map-side-combinable. Token contract pinned to ``[a-z0-9]+`` over
the lowercased text (Java and Python agree byte-for-byte on this class;
:func:`search_tokens_py` is the same regex, single-sourced for the twin
:func:`bm25_search_py`).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEARCH_TOKEN_RE = re.compile(r"[a-z0-9]+")
_TOKEN_RE_LIT = "[a-z0-9]+"


def search_tokens_py(text: str) -> list[str]:
    """The pinned search-token contract: lowercase, ``[a-z0-9]+`` runs."""
    return SEARCH_TOKEN_RE.findall(text.lower())


def search_tokens_col(text):
    """Catalyst twin of :func:`search_tokens_py` (same regex, same class
    semantics in Java and Python for ASCII alnum runs)."""
    return F.regexp_extract_all(F.lower(text), F.lit(_TOKEN_RE_LIT), 0)


def _bucket(term_col, num_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(num_buckets)).cast("int")


def build_index(
    docs: DataFrame,
    out_dir: str,
    *,
    id_col: str = "id",
    text_col: str = "text",
    num_buckets: int = 16,
) -> dict:
    """Tokenize ``docs`` and land the BM25 index under ``out_dir``.
    Returns the corpus meta dict ``{n_docs, avgdl, num_buckets}``."""
    spark = docs.sparkSession
    postings, dl = _postings_frame(docs, id_col, text_col, num_buckets)
    postings.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{out_dir}/postings"
    )
    m = dl.agg(
        F.count("*").alias("n_docs"), F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl")
    ).collect()[0]
    return _write_meta(spark, out_dir, m["n_docs"], m["sum_dl"], num_buckets)


def _postings_frame(docs: DataFrame, id_col: str, text_col: str, num_buckets: int):
    """``(postings, doc_lengths)`` frames for a document batch. Postings
    are co-located per bucket and term-sorted within files so parquet
    row-group min/max statistics make the query-time ``term IN (...)`` a
    skip scan."""
    toks = docs.select(
        F.col(id_col).cast("string").alias("id"),
        search_tokens_col(F.col(text_col)).alias("_toks"),
    )
    dl = toks.select("id", F.size("_toks").alias("dl"))
    tf = (
        toks.select("id", F.explode("_toks").alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    postings = (
        tf.join(dl, "id")
        .select(
            "term", "id", "tf", "dl", _bucket(F.col("term"), num_buckets).alias("bucket")
        )
        .repartition("bucket")
        .sortWithinPartitions("bucket", "term")
    )
    return postings, dl


def _write_meta(spark, out_dir: str, n_docs: int, sum_dl: int, num_buckets: int) -> dict:
    avgdl = (sum_dl / n_docs) if n_docs else 0.0
    spark.createDataFrame(
        [(n_docs, int(sum_dl), float(avgdl), num_buckets)],
        "n_docs long, sum_dl long, avgdl double, num_buckets int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/meta")
    return {"n_docs": n_docs, "avgdl": avgdl, "num_buckets": num_buckets}


def update_index(
    docs: DataFrame,
    index_dir: str,
    *,
    id_col: str = "id",
    text_col: str = "text",
) -> dict:
    """Fold a NEW document batch into an existing index — the continuous-
    crawl composition: tokenize only the increment, append its postings to
    the same bucket layout, and update ``(n_docs, sum_dl)`` exactly, so
    ``bm25_search`` after k updates is numerically identical to one
    rebuild over the union (pinned in tests). Doc ids must be new —
    re-submitting a doc double-counts it (dedup upstream, exactly as the
    incremental MinHash index requires).

    Not atomic across the two writes (postings append, then meta
    overwrite): on a cluster the pair belongs in one table transaction
    (Iceberg); a crash between them leaves the meta one batch stale —
    detectable, since meta is rewritten last."""
    spark = docs.sparkSession
    old = spark.read.parquet(f"{index_dir}/meta").collect()[0]
    nb = old["num_buckets"]
    postings, dl = _postings_frame(docs, id_col, text_col, nb)
    postings.write.mode("append").partitionBy("bucket").parquet(
        f"{index_dir}/postings"
    )
    inc = dl.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("s")
    ).collect()[0]
    return _write_meta(
        spark, index_dir, old["n_docs"] + inc["n"], old["sum_dl"] + inc["s"], nb
    )


def _idf(n_docs: int, df_col):
    # BM25+-free classic idf with the +1 smoothing (always positive)
    return F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def query_postings(
    spark: SparkSession, index_dir: str, terms: list[str]
) -> DataFrame:
    """The bucket-pruned, term-filtered posting slice for ``terms`` —
    exposed separately so tests can pin ``PartitionFilters`` on its plan."""
    meta = spark.read.parquet(f"{index_dir}/meta").collect()[0]
    nb = meta["num_buckets"]
    buckets = sorted(
        {
            r["b"]
            for r in spark.createDataFrame(
                [(t,) for t in terms], "term string"
            )
            .select(_bucket(F.col("term"), nb).alias("b"))
            .collect()
        }
    )
    return (
        spark.read.parquet(f"{index_dir}/postings")
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(list(terms)))
    )


def bm25_search(
    spark: SparkSession,
    index_dir: str,
    query: str,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` ``(id, score)`` for ``query`` against a
    :func:`build_index` layout, score-desc then id-asc (total order)."""
    terms = sorted(set(search_tokens_py(query)))
    if not terms:
        return spark.createDataFrame([], "id string, score double")
    meta = spark.read.parquet(f"{index_dir}/meta").collect()[0]
    n_docs, avgdl = meta["n_docs"], float(meta["avgdl"])
    if n_docs == 0 or avgdl == 0.0:
        return spark.createDataFrame([], "id string, score double")

    p = query_postings(spark, index_dir, terms)
    # per-term document frequency over the already-sliced postings:
    # ≤ |query| rows, broadcast back
    df_t = p.groupBy("term").agg(F.count("*").alias("_df"))
    norm = F.col("tf") * (k1 + 1.0) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    )
    scored = (
        p.join(F.broadcast(df_t), "term")
        .select("id", (_idf(n_docs, F.col("_df")) * norm).alias("_s"))
        .groupBy("id")
        .agg(F.sum("_s").alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("id")).limit(k)


def snippet_py(text: str, terms: list[str], width: int = 30) -> str:
    """Best-window snippet: the ``width``-token window with the most
    distinct query terms (ties: more total hits, then earliest). Returns
    the ORIGINAL text span (offsets from the same tokenizer regex), with
    ``…`` ellipses marking truncation. Deterministic; kernel is single-
    sourced for the Spark pass and tests."""
    tset = set(terms)
    toks = list(SEARCH_TOKEN_RE.finditer(text.lower()))
    if not toks:
        return text[: width * 8] + ("…" if len(text) > width * 8 else "")
    hits = [i for i, m in enumerate(toks) if m.group(0) in tset]
    if not hits:
        end = toks[min(width, len(toks)) - 1].end()
        return text[:end] + ("…" if end < len(text) else "")
    best = (-1, -1, 0)  # (#distinct, #hits, -start) maximized
    best_start = 0
    for i in hits:
        lo = max(0, min(i - width // 4, len(toks) - width))
        in_win = [j for j in hits if lo <= j < lo + width]
        key = (
            len({toks[j].group(0) for j in in_win}),
            len(in_win),
            -lo,
        )
        if key > best:
            best, best_start = key, lo
    s = toks[best_start].start()
    e = toks[min(best_start + width, len(toks)) - 1].end()
    return ("…" if s > 0 else "") + text[s:e] + ("…" if e < len(text) else "")


def snippets(
    docs: DataFrame,
    hits: DataFrame,
    query: str,
    *,
    id_col: str = "id",
    text_col: str = "text",
    width: int = 30,
) -> DataFrame:
    """Attach a best-window snippet to each search hit →
    ``(id, score, snippet)``. ``hits`` is a :func:`bm25_search` result
    (columns ``id, score``); ``id_col``/``text_col`` name the DOCS
    frame's columns.

    Scale shape: ``hits`` is a top-k table (bounded by design), so its ids
    are collected and pushed into the docs scan as an ``isin`` parquet
    filter — the corpus is never scanned for a k-row decoration; the
    window selection is one Arrow pass over exactly k documents."""
    import pandas as pd

    terms = sorted(set(search_tokens_py(query)))
    pairs = hits.select("id", "score").collect()
    ids = [r["id"] for r in pairs]
    scores = {r["id"]: r["score"] for r in pairs}
    k = docs.select(
        F.col(id_col).cast("string").alias("id"), F.col(text_col).alias("_t")
    ).filter(F.col("id").isin(ids))

    def kernel(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "snippet": [snippet_py(t, terms, width) for t in pdf["_t"]],
                }
            )

    snip = k.mapInPandas(kernel, schema="id string, snippet string")
    b = snip.sparkSession.createDataFrame(
        [(i, float(scores[i])) for i in ids], "id string, score double"
    )
    return (
        snip.join(F.broadcast(b), "id")
        .select("id", "score", "snippet")
        .orderBy(F.desc("score"), F.asc("id"))
    )


def bm25_search_py(
    docs: dict[str, str],
    query: str,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> list[tuple[str, float]]:
    """Driver-side BM25 twin over ``{id: text}`` — same tokenizer, idf,
    and tf normalization, for differential tests on small corpora."""
    from collections import Counter

    tfs = {i: Counter(search_tokens_py(t)) for i, t in docs.items()}
    dls = {i: sum(c.values()) for i, c in tfs.items()}
    n = len(docs)
    if n == 0:
        return []
    avgdl = sum(dls.values()) / n
    if avgdl == 0:
        return []
    terms = sorted(set(search_tokens_py(query)))
    dfreq = {t: sum(1 for c in tfs.values() if t in c) for t in terms}
    scores: dict[str, float] = {}
    for i, c in tfs.items():
        s = 0.0
        for t in terms:
            tf = c.get(t, 0)
            if tf == 0 or dfreq[t] == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dls[i] / avgdl))
        if s > 0.0:
            scores[i] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
