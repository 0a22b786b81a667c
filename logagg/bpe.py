"""BPE tokenizer training and corpus encoding — the "train a tokenizer on
the corpus, then tokenize the corpus" step of a training-data pipeline
(Sennrich et al. 2016 "Neural Machine Translation of Rare Words with
Subword Units"; the GPT-2 byte-pair encoder popularized the pre-token
regex + merge-ranks formulation used here).

Reference scope note: the reference pipeline (aggregator/logs.py) ends at
routed aggregates; this is the next step its webtext user takes before
training. Pre-tokenization reuses the repo's pinned ASCII
``textstats.BPE_SPLIT_RE`` contract (Java regex == RE2 == Python re on
this pattern, already fuzz-pinned for ``bpe_token_count``), and the
pattern PARTITIONS the text — every character lands in exactly one
pre-token — so decode(encode(text)) round-trips byte-exactly.

Scale shapes (the standard industrial BPE-trainer split):

* **corpus scan → word counts** is the distributed part: explode
  pre-tokens + one partial+final hash agg; shuffle rows = DISTINCT
  pre-tokens, not corpus positions. A ``max_words`` TakeOrdered cap
  (count desc, word asc) bounds what the driver sees — rare-word tails
  carry no merge signal, and the cap is the trainer's working-set knob.
* **merge learning** runs driver-local over that bounded (word, freq)
  table — exactly how real BPE trainers work (they never stream the
  corpus twice): incremental pair-count maintenance via an inverted
  pair→words index, so each merge touches only the words containing it.
* **encoding** broadcasts the merge ranks and runs one Arrow pass
  (scan → mapInPandas, zero shuffles) — the same ship-the-model plan as
  ``lm.doc_perplexity``.

Determinism: integer counts everywhere; the winning pair each round is
max count with ties to the lexicographically SMALLEST (a, b); vocab ids
are initial characters in code-point order followed by merge outputs in
merge order. The per-word merge kernel lives ONCE in
:func:`logagg.textfns.bpe_word_py`; tests pin the math with a
hand-traced training run.
"""

from __future__ import annotations

import json
import re
from collections import Counter
from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logagg.textstats import BPE_SPLIT_RE

_PRETOK_RE = re.compile(BPE_SPLIT_RE)

BPE_UNK_ID = -1  # characters unseen at training time encode to this id


@dataclass
class BPEModel:
    """Learned merges + the derived vocab. ``merges[(a, b)] -> rank`` is
    what encoding needs; ``vocab[symbol] -> id`` assigns stable integer
    ids (initial chars in code-point order, then merge outputs in merge
    order — deterministic by construction)."""

    merges: list = field(default_factory=list)  # [(a, b), ...] in rank order
    vocab: dict = field(default_factory=dict)  # symbol -> id

    @property
    def ranks(self) -> dict:
        return {pair: i for i, pair in enumerate(self.merges)}

    def id_to_symbol(self) -> dict:
        return {i: s for s, i in self.vocab.items()}

    def to_json(self) -> str:
        return json.dumps(
            {"merges": [list(p) for p in self.merges], "vocab": self.vocab}
        )

    @classmethod
    def from_json(cls, s: str) -> "BPEModel":
        d = json.loads(s)
        return cls(merges=[tuple(p) for p in d["merges"]], vocab=d["vocab"])


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) pre-token corpus counts — one JVM regexp_extract_all +
    explode + partial+final hash agg. The pre-token contract is the pinned
    ASCII BPE_SPLIT_RE (same expression as ``bpe_token_count``)."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_RE), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _merge_word(syms: tuple, pair: tuple) -> tuple:
    """One left-to-right pass combining every occurrence of ``pair``."""
    a, b = pair
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_bpe_from_counts(
    wc: dict, n_merges: int, min_pair_count: int = 2
) -> BPEModel:
    """Driver-local merge learning over a bounded (word → freq) table.

    Incremental maintenance: a pair→words inverted index plus a running
    pair-count Counter; each merge subtracts the affected words' old
    pairs and adds their new ones — O(Σ|word| over affected words) per
    round, the textbook efficient trainer. Stops early when no pair
    reaches ``min_pair_count``. Winner each round = max count, ties to
    the lexicographically smallest (a, b)."""
    symbols = {w: tuple(w) for w in wc}
    pair_counts: Counter = Counter()
    pair_words: dict = {}
    for w, freq in wc.items():
        syms = symbols[w]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += freq
            pair_words.setdefault(p, set()).add(w)

    merges: list = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # max count, ties to smallest pair: minimize (-count, pair)
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_pair_count:
            break
        merges.append(best)
        for w in list(pair_words.get(best, ())):
            old = symbols[w]
            freq = wc[w]
            for p in zip(old, old[1:]):
                pair_counts[p] -= freq
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(w)
                    if not ws:
                        del pair_words[p]
            new = _merge_word(old, best)
            symbols[w] = new
            for p in zip(new, new[1:]):
                pair_counts[p] += freq
                pair_words.setdefault(p, set()).add(w)

    chars = sorted({c for w in wc for c in w})
    vocab = {c: i for i, c in enumerate(chars)}
    for a, b in merges:
        sym = a + b
        if sym not in vocab:
            vocab[sym] = len(vocab)
    return BPEModel(merges=merges, vocab=vocab)


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    *,
    min_pair_count: int = 2,
    max_words: int = 1_000_000,
    text_col: str = "text",
) -> BPEModel:
    """Train BPE on ``docs``: distributed word counts (capped by a
    deterministic ``max_words`` TakeOrdered — count desc, word asc), then
    driver-local merge learning (see module docstring)."""
    top = (
        word_counts(docs, text_col=text_col)
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return learn_bpe_from_counts(
        {r["word"]: r["n"] for r in top}, n_merges, min_pair_count=min_pair_count
    )


def _encode_batches_fn(bc):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from logagg.textfns import bpe_word_py

        model = bc.value
        ranks = model.ranks
        vocab = model.vocab
        cache: dict = {}  # per-task word → ids memo (crawl text is Zipfian)
        for pdf in batches:
            ids_col, n_col = [], []
            for text in pdf["text"]:
                ids: list = []
                if isinstance(text, str):
                    for word in _PRETOK_RE.findall(text):
                        got = cache.get(word)
                        if got is None:
                            got = [
                                vocab.get(s, BPE_UNK_ID)
                                for s in bpe_word_py(word, ranks)
                            ]
                            cache[word] = got
                        ids.extend(got)
                ids_col.append(ids)
                n_col.append(len(ids))
            yield pd.DataFrame(
                {
                    "id": pd.Series(pdf["id"], dtype="string"),
                    "ids": ids_col,
                    "n_bpe_tokens": pd.Series(n_col, dtype="int64"),
                }
            )

    return fn


def bpe_encode(
    docs: DataFrame,
    model: BPEModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus: (id string, ids array<int>, n_bpe_tokens).
    One broadcast of the model + one Arrow pass, zero shuffles; a
    per-task word→ids memo exploits the Zipfian pre-token distribution.
    Characters unseen at training time encode to :data:`BPE_UNK_ID`;
    otherwise ``decode`` round-trips the text byte-exactly (the pre-token
    regex partitions the input)."""
    bc = docs.sparkSession.sparkContext.broadcast(model)
    src = docs.select(
        F.col(id_col).cast("string").alias("id"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(
        _encode_batches_fn(bc), schema="id string, ids array<int>, n_bpe_tokens long"
    )


def decode_ids(ids: list, model: BPEModel) -> str:
    """Driver-side decode (tests / spot checks): concatenate the symbols.
    Raises KeyError on BPE_UNK_ID — unknown characters are not decodable."""
    rev = model.id_to_symbol()
    return "".join(rev[i] for i in ids)


def fertility_report(
    docs: DataFrame,
    model: "BPEModel",
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-fit diagnostic per source: fertility (BPE tokens per
    whitespace word — the standard "how well does this vocab cover this
    text" number; near 1 on in-domain text, inflating on unseen
    languages/domains), bytes per token (compression), and the unknown-id
    share (coverage holes). The per-source numbers tell a data team
    WHICH slice of a mixture a tokenizer was not trained for — run it
    before committing a vocab to a training mix.

    One encode pass (:func:`bpe_encode` — broadcast model, zero
    shuffles) joined back to the doc metadata (broadcast-sized: the
    encode output is keyed by id) plus ONE partial+final agg over
    #sources groups. Output: (source, n_docs, n_words, n_tokens,
    n_bytes, fertility, bytes_per_token, unk_frac), source-sorted."""
    enc = bpe_encode(docs, model, id_col=id_col, text_col=text_col)
    # split() emits empty fields around separators; count words as
    # non-empty tokens exactly like the repo's ASCII-whitespace contract
    words = F.size(
        F.filter(
            F.split(F.col(text_col), r"[ \t\n\x0b\f\r]+"), lambda t: t != ""
        )
    )
    meta = docs.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(source_col).alias("_src"),
        words.alias("_words"),
        F.length(F.col(text_col).cast("binary")).alias("_bytes"),
    )
    joined = enc.join(meta, "id")
    unk = F.size(F.filter(F.col("ids"), lambda i: i == F.lit(BPE_UNK_ID)))
    return (
        joined.withColumn("_unk", unk)
        .groupBy(F.col("_src").alias(source_col))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_words").alias("n_words"),
            F.sum("n_bpe_tokens").alias("n_tokens"),
            F.sum("_bytes").alias("n_bytes"),
            F.sum("_unk").alias("n_unk"),
        )
        .withColumn(
            "fertility",
            F.when(F.col("n_words") > 0, F.col("n_tokens") / F.col("n_words")),
        )
        .withColumn(
            "bytes_per_token",
            F.when(F.col("n_tokens") > 0, F.col("n_bytes") / F.col("n_tokens")),
        )
        .withColumn(
            "unk_frac",
            F.when(F.col("n_tokens") > 0, F.col("n_unk") / F.col("n_tokens")),
        )
        .drop("n_unk")
        .orderBy(source_col)
    )
