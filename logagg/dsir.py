"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): pick the
raw-corpus documents whose hashed-n-gram distribution looks most like a
target corpus, by (1) fitting bag-of-hashed-ngram unigram models on the
target and on the raw pool, (2) scoring every raw document with the
importance log-weight sum_b count_b * (log p_target(b) − log p_raw(b)),
and (3) Gumbel-top-k sampling on the weights (sampling WITHOUT
replacement from the softmax — the paper's resampling step — reduced to
a deterministic top-k on logw + Gumbel noise).

Reference scope note: the reference pipeline (aggregator/logs.py) ends at
routed aggregates; this module is the model-targeted data-selection stage
a webtext user runs on those documents to build a pretraining mix.

Scale shapes (the 100 TB plan):

* :func:`hash_feature_counts` — one Arrow pass that pre-aggregates bucket
  counts PER BATCH (a Python map-side combine: the shuffle carries at most
  ``buckets`` rows per batch, usually far fewer) + one partial+final hash
  agg. Shuffle rows ≤ buckets, independent of corpus size.
* :func:`fit_log_probs` — the agg result is at most ``buckets`` rows
  (bounded by construction), collected once and folded into a dense
  ``float64[buckets]`` log-prob vector — the broadcastable model, DSIR's
  moral equivalent of the fastText/KenLM binary.
* :func:`with_importance` — sc.broadcast(log-ratio vector) + one map-only
  Arrow pass. Zero shuffles.
* :func:`dsir_select` — the only shuffle after scoring is the TakeOrdered
  top-k on (key desc, id asc): per-partition heads, never a global sort.

Determinism: feature hashing, the importance fold, and the Gumbel draw
are single-source CPython kernels (``textfns.hashed_ngrams_py`` /
``dsir_logw_py`` / ``gumbel_py``); smoothing and the log are applied by
:func:`fit_log_probs` on exact integer counts. The Python twin
(:func:`dsir_select_py`) reproduces selections, log-weights and keys
bit-for-bit.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logagg.textfns import dsir_logw_py, gumbel_py, hashed_ngrams_py

DEFAULT_BUCKETS = 10_000


def hash_feature_counts(
    docs: DataFrame, *, buckets: int = DEFAULT_BUCKETS, text_col: str = "text"
) -> DataFrame:
    """Corpus-total hashed-ngram bucket counts: ``(bucket int, cnt long)``.
    Per-batch Counter pre-aggregation keeps the shuffle bounded by the
    bucket vocabulary, not the token stream."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        acc: Counter = Counter()
        for pdf in it:
            for t in pdf["text"]:
                acc.update(hashed_ngrams_py(t, buckets))
        if acc:
            yield pd.DataFrame(
                {"bucket": list(acc.keys()), "cnt": list(acc.values())}
            )

    return (
        docs.select(F.col(text_col).alias("text"))
        .mapInPandas(_batches, "bucket int, cnt long")
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def fit_probs_py(counts: dict[int, int], buckets: int) -> np.ndarray:
    """Laplace-smoothed log-prob vector from exact integer bucket counts —
    the one place smoothing and the log happen (both engines call this on
    identical integers, so the doubles are identical)."""
    vec = np.zeros(buckets, dtype=np.float64)
    for b, c in counts.items():
        vec[int(b)] = float(c)
    total = float(vec.sum())
    return np.log((vec + 1.0) / (total + buckets))


def fit_log_probs(
    docs: DataFrame, *, buckets: int = DEFAULT_BUCKETS, text_col: str = "text"
) -> np.ndarray:
    """Distributed counts → bounded collect (≤ ``buckets`` rows by
    construction) → dense log-prob vector."""
    rows = hash_feature_counts(docs, buckets=buckets, text_col=text_col).collect()
    return fit_probs_py({r["bucket"]: r["cnt"] for r in rows}, buckets)


def with_importance(
    docs: DataFrame,
    log_ratio: np.ndarray,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str | None = None,
    out_col: str = "logw",
) -> DataFrame:
    """Score every document with its importance log-weight (one broadcast
    + one map-only Arrow pass, zero shuffles). With ``seed`` set, also
    emit ``key`` = logw + Gumbel(seed, id) — the Gumbel-top-k sampling
    key (Vieira 2014's "Gumbel-max trick" applied per the DSIR paper)."""
    buckets = len(log_ratio)
    bc = docs.sparkSession.sparkContext.broadcast(log_ratio)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ratio = bc.value
        for pdf in it:
            logw = [
                dsir_logw_py(hashed_ngrams_py(t, buckets), ratio)
                for t in pdf[text_col]
            ]
            pdf = pdf.copy()
            pdf[out_col] = logw
            if seed is not None:
                pdf["key"] = [
                    w + gumbel_py(seed, str(i))
                    for i, w in zip(pdf[id_col], logw)
                ]
            yield pdf

    # all input columns ride through the Arrow pass (no join-back, no
    # second scan): schema = input schema + the score columns. Build a
    # FRESH StructType — StructType.add mutates in place, and docs.schema
    # returns the DataFrame's cached schema object
    from pyspark.sql.types import DoubleType, StructField, StructType

    fields = list(docs.schema.fields) + [StructField(out_col, DoubleType())]
    if seed is not None:
        fields.append(StructField("key", DoubleType()))
    return docs.mapInPandas(_batches, StructType(fields))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    *,
    k: int,
    buckets: int = DEFAULT_BUCKETS,
    seed: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Select ``k`` raw documents by Gumbel-top-k on DSIR importance
    weights. Returns the selected rows with ``logw`` and ``key``, ordered
    (key desc, id asc) — a TakeOrdered plan, no global sort."""
    if k < 1:
        raise ValueError("k must be >= 1")
    log_t = fit_log_probs(target, buckets=buckets, text_col=text_col)
    log_r = fit_log_probs(raw, buckets=buckets, text_col=text_col)
    scored = with_importance(
        raw, log_t - log_r, id_col=id_col, text_col=text_col, seed=seed
    )
    return scored.orderBy(
        F.desc("key"), F.asc(F.col(id_col).cast("string"))
    ).limit(k)


def dsir_select_py(
    raw: list[tuple[str, str]],
    target_texts: list[str],
    *,
    k: int,
    buckets: int = DEFAULT_BUCKETS,
    seed: str = "dsir",
) -> list[tuple[str, float, float]]:
    """Pure-Python twin of :func:`dsir_select` over ``(id, text)`` pairs:
    returns ``[(id, logw, key)]`` in (key desc, id asc) order — bit-equal
    to the Spark path (shared kernels, shared fit)."""
    from collections import Counter

    def fit(texts: list[str]) -> np.ndarray:
        acc: Counter = Counter()
        for t in texts:
            acc.update(hashed_ngrams_py(t, buckets))
        return fit_probs_py(dict(acc), buckets)

    ratio = fit(target_texts) - fit([t for _, t in raw])
    scored = []
    for i, t in raw:
        logw = dsir_logw_py(hashed_ngrams_py(t, buckets), ratio)
        scored.append((str(i), logw, logw + gumbel_py(seed, str(i))))
    scored.sort(key=lambda r: (-r[2], r[0]))
    return scored[:k]
