"""N-gram language-model perplexity filtering — the CCNet-style quality
stage of a webtext curation pipeline (Wenzek et al. 2020 train a KenLM on
clean text and bucket crawl documents by perplexity; Brants et al. 2007
"Large Language Models in Machine Translation" define the stupid-backoff
score used here, the standard choice at web scale precisely because it
needs only raw counts).

Reference scope note: the reference pipeline (aggregator/logs.py) ends at
routed aggregates; this module covers the model-based quality filter a
webtext user runs on those documents next. No external model files — the
LM is trained ON a reference corpus slice with Spark and carried as a
bounded in-memory table, the moral equivalent of the KenLM binary CCNet
ships to every worker.

Scale shapes:

* :func:`unigram_counts` — explode + one partial+final hash agg; shuffle
  rows = distinct tokens, not corpus tokens.
* :func:`train_lm` — two passes: (1) unigram agg → top-k vocab selected by
  a TakeOrdered plan (driver receives exactly ``top_k`` rows — bounded by
  construction, like every other driver collect in this repo); (2) one
  Arrow pass that pre-aggregates bigram counts PER BATCH (a Python
  map-side combine: the shuffle then carries per-batch distinct bigrams,
  not one row per corpus position) followed by a hash agg, again capped by
  a TakeOrdered. Model size is (top_k + max_bigrams) rows by construction.
* :func:`doc_perplexity` / :func:`with_perplexity` — sc.broadcast(model)
  + scan → mapInPandas. Zero shuffles; the classic "ship the LM to every
  executor, score embarrassingly parallel" plan.

Determinism: all counts are exact integers; vocab/bigram selection orders
by (count desc, gram asc); scoring folds log-probs left-to-right per
document in one CPython kernel — bit-identical across runs, partitionings
and cluster sizes. The scoring math lives ONCE in
:func:`logagg.textfns.score_tokens_py` (same single-source pattern as
``repetition_stats``); tests pin it with hand-computed literals.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logagg.schemas import LM_BACKOFF_ALPHA as BACKOFF_ALPHA
from logagg.schemas import LM_UNK as UNK
from logagg.textstats import tokens_col


@dataclass
class LocalLM:
    """A pruned bigram LM with stupid backoff, small enough to broadcast.

    ``vocab`` maps token → corpus count for the ``top_k`` kept tokens;
    every other token scores as :data:`UNK`, whose count is
    ``total - sum(vocab)`` — exact without a second corpus pass. ``bigrams``
    maps "w1 w2" (tokens never contain whitespace, so the join is
    unambiguous) → count over the UNK-mapped token stream."""

    vocab: dict[str, int]
    unk_n: int
    total: int
    bigrams: dict[str, int] = field(default_factory=dict)
    alpha: float = BACKOFF_ALPHA
    trigrams: dict[str, int] = field(default_factory=dict)

    @property
    def n_vocab(self) -> int:
        return len(self.vocab) + 1  # + the UNK bucket

    def count(self, mapped_token: str) -> int:
        return self.unk_n if mapped_token == UNK else self.vocab[mapped_token]

    def to_json(self) -> str:
        return json.dumps(
            {
                "vocab": self.vocab,
                "unk_n": self.unk_n,
                "total": self.total,
                "bigrams": self.bigrams,
                "alpha": self.alpha,
                "trigrams": self.trigrams,
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "LocalLM":
        d = json.loads(s)
        return cls(
            vocab=d["vocab"],
            unk_n=d["unk_n"],
            total=d["total"],
            bigrams=d["bigrams"],
            alpha=d["alpha"],
            trigrams=d.get("trigrams", {}),  # pre-trigram model files load
        )


def unigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, n) corpus counts — explode + one partial+final hash agg."""
    return (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


def _bigram_batches_fn(vocab: set):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        from logagg.textfns import tokens

        for pdf in batches:
            counts: Counter = Counter()  # per-batch map-side combine
            for text in pdf["text"]:
                toks = tokens(text) if isinstance(text, str) else []
                mapped = [t if t in vocab else UNK for t in toks]
                for a, b in zip(mapped, mapped[1:]):
                    counts[a + " " + b] += 1
            if counts:
                yield pd.DataFrame(
                    {"gram": list(counts.keys()), "pn": list(counts.values())}
                )

    return fn


def _trigram_batches_fn(vocab: set):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        from logagg.textfns import tokens

        for pdf in batches:
            counts: Counter = Counter()  # per-batch map-side combine
            for text in pdf["text"]:
                toks = tokens(text) if isinstance(text, str) else []
                mapped = [t if t in vocab else UNK for t in toks]
                for a, b, c in zip(mapped, mapped[1:], mapped[2:]):
                    counts[a + " " + b + " " + c] += 1
            if counts:
                yield pd.DataFrame(
                    {"gram": list(counts.keys()), "pn": list(counts.values())}
                )

    return fn


def trigram_counts(docs: DataFrame, vocab: set, text_col: str = "text") -> DataFrame:
    """(gram "w1 w2 w3", n) counts over the UNK-mapped stream — the same
    per-batch map-side-combine Arrow pass as :func:`bigram_counts`."""
    src = docs.select(F.col(text_col).alias("text"))
    partial = src.mapInPandas(_trigram_batches_fn(vocab), schema="gram string, pn long")
    return partial.groupBy("gram").agg(F.sum("pn").alias("n"))


def bigram_counts(docs: DataFrame, vocab: set, text_col: str = "text") -> DataFrame:
    """(gram "w1 w2", n) counts over the UNK-mapped token stream. One Arrow
    pass emitting per-batch partial counts, then a hash agg — the shuffle
    carries per-batch DISTINCT bigrams, not one row per corpus position."""
    src = docs.select(F.col(text_col).alias("text"))
    partial = src.mapInPandas(_bigram_batches_fn(vocab), schema="gram string, pn long")
    return partial.groupBy("gram").agg(F.sum("pn").alias("n"))


def train_lm(
    docs: DataFrame,
    *,
    top_k: int = 50_000,
    max_bigrams: int = 500_000,
    min_bigram_count: int = 1,
    order: int = 2,
    max_trigrams: int = 500_000,
    min_trigram_count: int = 1,
    text_col: str = "text",
) -> LocalLM:
    """Train the pruned LM on ``docs`` (two distributed passes — three
    with ``order=3``, see module docstring). Every collect is bounded by
    ``top_k`` / ``max_bigrams`` / ``max_trigrams`` by construction;
    selection is deterministic under (count desc, gram asc).

    ``order=3`` adds a pruned trigram table and the scorer becomes
    3-gram stupid backoff (S(w|u,v) = c(uvw)/c(uv) when both grams are
    kept, else α·S(w|v)) — one rung closer to the 5-gram KenLM CCNet
    ships, at one extra bounded pass. An ``order=2`` model scores
    BIT-IDENTICALLY to the pre-trigram implementation (the kernel only
    engages trigram logic when the table is non-empty)."""
    if order not in (2, 3):
        raise ValueError("order must be 2 or 3")
    uni = unigram_counts(docs, text_col=text_col)
    total_row = uni.agg(F.sum("n").alias("t"), F.count("*").alias("d")).collect()[0]
    total = int(total_row["t"] or 0)
    # a literal "<unk>" token must land in the UNK bucket on BOTH sides of
    # the train/score contract — keep it out of the vocab so the mapping
    # `t if t in vocab else UNK` is the same expression everywhere
    top = (
        uni.filter(F.col("token") != UNK)
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(top_k)
        .collect()
    )
    vocab = {r["token"]: r["n"] for r in top}
    unk_n = total - sum(vocab.values())
    big = (
        bigram_counts(docs, set(vocab), text_col=text_col)
        .filter(F.col("n") >= min_bigram_count)
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(max_bigrams)
        .collect()
    )
    tri: dict[str, int] = {}
    if order == 3:
        tri_rows = (
            trigram_counts(docs, set(vocab), text_col=text_col)
            .filter(F.col("n") >= min_trigram_count)
            .orderBy(F.desc("n"), F.asc("gram"))
            .limit(max_trigrams)
            .collect()
        )
        tri = {r["gram"]: r["n"] for r in tri_rows}
    return LocalLM(
        vocab=vocab, unk_n=unk_n, total=total,
        bigrams={r["gram"]: r["n"] for r in big}, trigrams=tri,
    )


def _ppl_batches_fn(bc):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from logagg.textfns import score_tokens_py, tokens

        lm = bc.value
        for pdf in batches:
            ids, nt, lp, ppl = [], [], [], []
            for did, text in zip(pdf["id"], pdf["text"]):
                toks = tokens(text) if isinstance(text, str) else []
                n, logp, p = score_tokens_py(toks, lm)
                ids.append(did)
                nt.append(n)
                lp.append(logp)
                ppl.append(p)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="string"),
                    "n_tokens": pd.Series(nt, dtype="int64"),
                    "logprob": pd.Series(lp, dtype="float64"),
                    "ppl": pd.Series(ppl, dtype="float64"),
                }
            )

    return fn


def doc_perplexity(
    docs: DataFrame,
    lm: LocalLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document stupid-backoff perplexity: (id string, n_tokens,
    logprob, ppl). Zero-token documents get ppl NULL (no tokens to judge —
    callers decide their fate separately). The model rides one
    ``sc.broadcast`` (torrent-distributed once per executor, not pickled
    per task); ids ride the kernel as strings like every Arrow kernel in
    the repo (identity for url keys; use :func:`with_perplexity` to get
    the score joined back onto the original frame/id type)."""
    bc = docs.sparkSession.sparkContext.broadcast(lm)
    src = docs.select(
        F.col(id_col).cast("string").alias("id"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(
        _ppl_batches_fn(bc), schema="id string, n_tokens long, logprob double, ppl double"
    )


def with_perplexity(
    docs: DataFrame,
    lm: LocalLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "ppl",
) -> DataFrame:
    """``docs`` plus a ``ppl`` column — the INPUT SCHEMA carried straight
    through one Arrow pass (the :func:`logagg.dsir.with_importance` /
    ``pca_project`` no-join-back shape): zero shuffles, id types and
    every payload column untouched, and because the op is a stateless
    projection it lifts UNCHANGED to a streaming DataFrame (a join-back
    would be an unsupported stream-stream join — how the earlier shape
    was caught). ``id_col`` is unused and kept for signature
    compatibility. Zero-token documents get NULL ppl."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    bc = docs.sparkSession.sparkContext.broadcast(lm)
    # build a NEW StructType — .add() would mutate the input's cached schema
    schema = StructType(
        list(docs.schema.fields) + [StructField(out_col, DoubleType())]
    )
    cols = [f.name for f in docs.schema.fields]

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from logagg.textfns import score_tokens_py, tokens

        m = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ppl = [
                score_tokens_py(tokens(t) if isinstance(t, str) else [], m)[2]
                for t in pdf[text_col]
            ]
            out = pdf[cols].copy()
            out[out_col] = pd.Series(ppl, dtype="float64")
            yield out

    return docs.mapInPandas(_score, schema)


def ppl_buckets(
    docs: DataFrame,
    lm: LocalLM,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = None,
    sample_k: int = 4096,
    out_col: str = "ppl",
    bucket_col: str = "ppl_bucket",
) -> DataFrame:
    """CCNet perplexity bucketing (Wenzek et al. 2020 §4.3): score every
    document with the LM and tag it head / middle / tail by the per-
    language perplexity TERCILES — the standard "keep head+middle, let
    the tail go" quality split, as a column instead of a filter so
    downstream mixing can weight buckets differently.

    Tercile boundaries come from the coordinated bottom-k sample
    (k smallest (md5(id), id) among scored docs per language — the same
    content-independent rule as :func:`logagg.aggregate.bottomk_sample`)
    with type-1 cuts at ranks ceil(n/3) / ceil(2n/3): reproducible across
    runs, engines, partitionings, and cluster sizes, unlike
    ``approxQuantile``. Scale shape: one Arrow scoring pass (no shuffle),
    one window shuffle on the language key for the sample, a driver
    collect bounded by sample_k × #languages (languages are a bounded
    enum), and one broadcast join of the ≤ #languages-row cut table.
    Zero-token docs (NULL ppl) land in the tail — matching
    :func:`curate`'s pessimistic default for unscorable material. With
    ``lang_col=None`` the corpus is one global bucket group. Twin:
    :func:`logagg.textfns.ppl_buckets_py` (bucket-exact)."""
    from pyspark.sql import Window

    if sample_k < 3:
        raise ValueError("sample_k must be >= 3")
    scored = with_perplexity(docs, lm, text_col=text_col, out_col=out_col)
    grp = (
        F.coalesce(F.col(lang_col).cast("string"), F.lit(""))
        if lang_col
        else F.lit("")
    )
    sid = F.col(id_col).cast("string")
    ranked = (
        scored.filter(F.col(out_col).isNotNull())
        .select(
            grp.alias("_grp"),
            F.md5(sid.cast("binary")).alias("_hr"),
            sid.alias("_sid"),
            F.col(out_col).alias("_v"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_grp").orderBy("_hr", "_sid")
            ),
        )
        .filter(F.col("_rn") <= sample_k)
    )
    by_grp: dict[str, list[float]] = {}
    for r in ranked.select("_grp", "_v").collect():
        by_grp.setdefault(r["_grp"], []).append(r["_v"])
    import math

    cut_rows = []
    for g, vals in sorted(by_grp.items()):
        vals.sort()
        nn = len(vals)
        cut_rows.append(
            (g, vals[max(0, math.ceil(nn / 3) - 1)], vals[max(0, math.ceil(2 * nn / 3) - 1)])
        )
    cuts = docs.sparkSession.createDataFrame(
        cut_rows, "_grp string, _c1 double, _c2 double"
    )
    v = F.col(out_col)
    bucket = (
        F.when(v.isNull(), F.lit("tail"))
        .when(v <= F.col("_c1"), F.lit("head"))
        .when(v <= F.col("_c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.withColumn("_grp", grp)
        .join(F.broadcast(cuts), "_grp", "left")
        .withColumn(bucket_col, bucket)
        .drop("_grp", "_c1", "_c2")
    )


def perplexity_py(text: str, lm: LocalLM) -> float | None:
    """Driver-side convenience twin caller (tests / notebooks)."""
    from logagg.textfns import score_tokens_py, tokens

    return score_tokens_py(tokens(text), lm)[2]
