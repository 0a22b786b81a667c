"""Text-analysis operators for a training-data pipeline, Spark-first.

Everything here except the fingerprint stays in Catalyst (split/filter/size
higher-order functions — JVM-side, codegen'd); the rolling-hash fingerprint
is an Arrow-batched pandas UDF (a per-byte loop has no SQL expression).
Differential oracles live in ``logagg.textfns``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logagg.schemas import FP_BASE, FP_MOD, LANG_MARKERS, LANG_UNKNOWN

STOPWORDS = ("the", "a", "and", "of")


def tokens_col(text: Column) -> Column:
    """ASCII-whitespace tokens (Java \\s = [ \\t\\n\\x0b\\f\\r]; no empties).

    This IS the pinned cross-engine token contract (textfns._WS_RE): the
    Python oracle spells the same class explicitly (str.split would add
    Unicode whitespace) and the DuckDB oracle SQL spells it for RE2 (whose
    \\s lacks \\x0b)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def profile_table(
    df: DataFrame, columns: list[str], approximate: bool = False
) -> DataFrame:
    """Single-pass data-profiling: per column, row count, null count,
    distinct count, and min/max (as strings — type-uniform output).

    One wide aggregate — every statistic is computed in the same
    partial+final pass over one scan (no per-column jobs, no driver loop).
    The ingest-time data-quality gate for a pipeline: schema drift, null
    blowups, and cardinality anomalies all surface here before training
    data ships. ``approximate=True`` swaps exact distinct for
    ``approx_count_distinct`` (HLL) — the 100 TB path: no expand, a
    fixed-size register per column instead of a distinct shuffle; exact is
    the oracle/audit path."""
    distinct_of = F.approx_count_distinct if approximate else F.count_distinct
    aggs = []
    for c in columns:
        col = F.col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"),
            distinct_of(col).alias(f"{c}__distinct"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
            )
            for c in columns
        ]
    )
    return (
        wide.select(F.explode(per_col).alias("p"))
        .select("p.column", "p.n_rows", "p.n_nulls", "p.n_distinct", "p.min_val", "p.max_val")
    )


# BPE-style pre-tokenizer (GPT-2-family shape, ASCII-pinned for engine
# portability: Java regex == RE2 == Python re on this pattern): a token is
# an optional leading space + a letter run, digit run, or punctuation run;
# bare whitespace runs are their own tokens. This is the "how many BPE-ish
# tokens will this doc cost" estimator a training pipeline budgets with —
# the merge step of real BPE only SPLITS these further, never crosses them.
BPE_SPLIT_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+"


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-style pre-tokens — one JVM regexp_extract_all, no UDF."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_RE), 0))


def stopword_hits(text: Column) -> Column:
    toks = tokens_col(text)
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def quality_score(text: Column, n_chars: Column) -> Column:
    """Mirror of textfns.quality_score: 0.5·len-saturation + 0.5·stop-ratio."""
    n_tok = token_count(text)
    len_score = F.least(n_chars.cast("double"), F.lit(400.0)) / F.lit(400.0)
    stop_ratio = stopword_hits(text).cast("double") / n_tok.cast("double")
    return F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.lit(0.5) * len_score + F.lit(0.5) * stop_ratio
    )


def with_lang_pred(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Marker-token language ID, pure Catalyst.

    Per-language hit counts land in named intermediate columns (one shared
    tokenization), then argmax = first language in sorted order reaching the
    max — the same (score desc, lang asc) tie-break as the Python oracle.
    A naive nested-``when`` fold would double the expression tree per
    language (2^N codegen blowup — measured 70 s for 6 languages on 6k
    rows); named columns keep it linear (<1 s).
    """
    def _hits(markers: tuple[str, ...]) -> Column:
        # single-arg lambda (a 2-arg lambda means (element, index) to F.filter)
        return F.size(F.filter(F.col("_toks"), lambda t: t.isin(*markers)))

    langs = sorted(LANG_MARKERS)
    tmp = df.withColumn("_toks", tokens_col(F.col(text_col)))
    for lang in langs:
        tmp = tmp.withColumn(f"_s_{lang}", _hits(LANG_MARKERS[lang]))
    best = F.greatest(*[F.col(f"_s_{lang}") for lang in langs])
    pred = F.lit(LANG_UNKNOWN)
    for lang in reversed(langs):  # build backwards so earlier langs win ties
        pred = F.when((F.col(f"_s_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return tmp.withColumn(out_col, pred).drop("_toks", *[f"_s_{lang}" for lang in langs])


def hash_split(
    df: DataFrame,
    key_col: str,
    threshold_hex: str = "3333",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/holdout assignment by content-independent hash of
    a stable key — the standard leakage-safe way to split a training corpus
    (same key → same split on every run, every engine, any partitioning).

    A row is "train" when the first 4 hex chars of md5(key) sort before
    ``threshold_hex`` (fixed-width lowercase hex compares lexicographically
    = numerically, so the fraction is int(threshold_hex,16)/65536 exactly —
    "3333" ≈ 20.0%). Pure Catalyst; the DuckDB oracle is the same
    expression verbatim."""
    # hash the key's STRING form: int→binary would be raw bytes in Spark
    # but a decimal string in the SQL oracle's md5(CAST(k AS VARCHAR))
    frag = F.substring(F.md5(F.col(key_col).cast("string").cast("binary")), 1, 4)
    return df.withColumn(
        out_col, F.when(frag < F.lit(threshold_hex), F.lit("train")).otherwise(F.lit("holdout"))
    )


def _fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    def fp(text: str) -> int:
        h = 0
        for b in text.encode("utf-8"):
            h = (h * FP_BASE + b) % FP_MOD
        return h

    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "fp": pd.Series(
                    [fp(t) if isinstance(t, str) else 0 for t in pdf["text"]],
                    dtype="int64",
                ),
            }
        )


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """Rolling-hash document fingerprint (doc_id, fp) — Arrow-batched."""
    return docs.select("doc_id", "text").mapInPandas(
        _fp_batches, schema="doc_id long, fp long"
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    capacity: int = 4096,
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic document → context-window assignment for LLM
    pre-training (sequence packing with document spanning).

    Docs are hash-assigned to ``n_buckets`` independent streams
    (content-independent md5 of the id — same rule as :func:`hash_split`),
    ordered deterministically inside each stream, concatenated, and cut
    into ``capacity``-token windows. A document may span a window boundary
    (the standard packed-pretraining layout; the attention mask handles
    doc boundaries downstream). Output per doc:

    * ``bucket``       — which independent stream
    * ``seq_idx``      — first window of this doc within the bucket
    * ``seq_offset``   — token offset of the doc inside that window
    * ``n_windows``    — how many windows the doc touches

    Every column derives from one running sum over (bucket, order) — a
    single window function per hash-bounded partition, so the plan scales
    with buckets (no global sort, no single-partition window). Exactly
    reproducible across runs/engines: the order key is (md5(id), id), the
    same rule everywhere else in the repo. Zero-token docs take no space
    but still receive the position they would start at.
    """
    from pyspark.sql import Window

    okey = F.md5(F.col(id_col).cast("string").cast("binary"))
    bucket = F.pmod(F.conv(F.substring(okey, 1, 8), 16, 10).cast("long"), F.lit(n_buckets))
    w = (
        Window.partitionBy("bucket")
        .orderBy("_okey", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(tokens_col).over(w) - F.col(tokens_col)).alias("_start")
    out = (
        df.select(
            F.col(id_col),
            F.col(tokens_col),
            okey.alias("_okey"),
            bucket.cast("int").alias("bucket"),
        )
        .withColumn("_start", start)
        .select(
            id_col,
            "bucket",
            F.floor(F.col("_start") / capacity).cast("long").alias("seq_idx"),
            F.pmod(F.col("_start"), F.lit(capacity)).cast("long").alias("seq_offset"),
            F.when(F.col(tokens_col) <= 0, F.lit(1))
            .otherwise(
                F.floor((F.col("_start") + F.col(tokens_col) - 1) / capacity)
                - F.floor(F.col("_start") / capacity)
                + 1
            )
            .cast("long")
            .alias("n_windows"),
        )
    )
    return out


# ------------------------------------------------- repetition (Gopher-style)


def _repetition_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from logagg import textfns

    for pdf in batches:
        rows = []
        for did, text in zip(pdf["id"], pdf["text"]):
            st = textfns.repetition_stats_py(text if isinstance(text, str) else "")
            st["id"] = did
            rows.append(st)
        out = pd.DataFrame(rows)
        if len(out):
            out["id"] = out["id"].astype("string")
        yield out


REPETITION_SCHEMA = (
    "id string, n_lines int, dup_line_frac double, dup_line_char_frac double, "
    "top2_char_frac double, top3_char_frac double, top4_char_frac double, "
    "dup10_char_frac double"
)


def repetition_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals, one row per document:
    duplicate-line fraction, duplicate-line character fraction, top
    {2,3,4}-gram character fraction, duplicated-10-gram character fraction
    (Rae et al. 2021, "Scaling Language Models" §A1.1 repetition filters).

    One Arrow-batched pass, zero shuffles — per-document n-gram counting is
    embarrassingly parallel, and the shingles() measurement (2.7× faster in
    CPython than Catalyst higher-order string building at sf0.1) applies
    verbatim to this kernel, which is the same tokens→ngram workload. At
    100 TB the plan is scan → mapInPandas → (downstream filter), the best
    possible shape. Kernel delegates to textfns.repetition_stats_py — the
    same single-source-of-truth pattern as _shingle_batches_fn; crafted
    hand-computed fixtures in tests pin the math itself.

    Output id column is ``id``, string-typed — the repo-wide Arrow-kernel
    id convention (identity for url keys; numeric callers join back on a
    string cast, as ``curate`` does)."""
    src = docs.select(
        F.col(id_col).cast("string").alias("id"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(_repetition_batches, schema=REPETITION_SCHEMA)


# ------------------------------------------------- per-domain capping


def cap_per_domain(
    pages: DataFrame,
    cap: int,
    id_col: str = "url",
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep at most ``cap`` pages per domain, chosen as a deterministic
    content-hash sample — the standard over-represented-domain downsampler
    in web-crawl curation.

    Scale shape: a naive ``row_number() OVER (PARTITION BY host)`` sorts
    every page of a domain inside ONE task — a 1B-page domain serializes.
    Instead the rank is two-level:

    1. each page gets a salt bucket ``crc32(url) % salt_buckets``; the big
       window ranks within (host, salt) — partitions are ~1/salt_buckets
       of the worst domain, and salt_buckets scales with cluster width;
    2. per-(host, salt) counts (a partial-agg groupBy) feed a tiny window
       over at most ``salt_buckets`` rows per host to produce each
       bucket's global offset within its host;
    3. global rank = offset + local rank; keep rank <= cap.

    The resulting order key is (salt, md5(url), url) — content-hash
    deterministic and uniform, reproducible across runs and engines (crc32
    == zlib.crc32, md5 hex order == byte order). Returns the input columns
    plus ``host`` for kept rows only."""
    from pyspark.sql import Window

    idc = F.col(id_col)
    # try_parse_url: a crawl ALWAYS contains malformed urls, and ANSI
    # parse_url would kill the whole job on the first one. NULL hosts
    # group together and are capped like any other domain (they're
    # usually junk — capping bounds them too).
    host = F.try_parse_url(idc, F.lit("HOST")).alias("_host")
    # the grouping/join key must be non-null (null keys silently drop out
    # of equi-joins): sentinel for the junk group, real host otherwise
    hkey = F.coalesce(F.try_parse_url(idc, F.lit("HOST")), F.lit("\x00invalid")).alias("_hkey")
    # string-then-binary cast: identity for url keys, and keeps numeric ids
    # legal under ANSI (no direct bigint→binary cast)
    idb = idc.cast("string").cast("binary")
    salt = F.pmod(F.crc32(idb), F.lit(salt_buckets)).cast("int").alias("_salt")
    okey = F.md5(idb).alias("_okey")
    tagged = pages.select("*", host, hkey, salt, okey)

    big = Window.partitionBy("_hkey", "_salt").orderBy("_okey", id_col)
    local = F.row_number().over(big).alias("_local_rank")

    counts = tagged.groupBy("_hkey", "_salt").agg(F.count("*").alias("_n"))
    tiny = (
        Window.partitionBy("_hkey")
        .orderBy("_salt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.select(
        "_hkey", "_salt", (F.sum("_n").over(tiny) - F.col("_n")).alias("_offset")
    )

    ranked = (
        tagged.withColumn("_local_rank", local)
        .join(offsets, ["_hkey", "_salt"])
        .withColumn("_rank", F.col("_offset") + F.col("_local_rank"))
    )
    kept = ranked.filter(F.col("_rank") <= cap)
    return kept.select(*pages.columns, F.col("_host").alias("host"))


def redact_pii(text: Column) -> Column:
    """Redact emails / IPv4s / phone-shaped numbers — Catalyst
    regexp_replace chain (JVM-side, codegen'd; zero Python in the hot
    path). Patterns live in textfns.PII_PATTERNS, the single source both
    engines compile — kept to the java.util.regex ∩ Python re dialect so
    the pure-Python oracle is bit-identical. Applied in declaration order
    (email before IPv4: 'a@b2.33.44.55' must not leak an <IP>)."""
    from logagg.textfns import PII_PATTERNS

    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


# ------------------------------------------------- context-window chunking


def chunk_documents(
    docs: DataFrame,
    *,
    max_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into context-length token windows — the
    "chunk long documents to the model's context size" stage of a training
    pipeline (tokenizer-style sliding windows: chunk k covers tokens
    [k*step, k*step + max_tokens) with step = max_tokens - overlap; the
    last window is the first one reaching the end of the doc, so no chunk
    is ever a suffix of its predecessor). Chunk text re-joins tokens with
    single spaces (the same pinned whitespace normalization as the
    exact-substring cut). Zero-token docs yield no chunks.

    Output: (id, chunk_idx int, n_tokens int, chunk_text string).

    Scale shape: pure Catalyst 1→N explode (sequence + slice + array_join,
    all JVM codegen) — zero shuffles, zero Python; the same shape as
    media_frame_sample. Twin: :func:`logagg.textfns.chunk_documents_py`."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not (0 <= overlap < max_tokens):
        raise ValueError(f"overlap must be in [0, max_tokens), got {overlap}")
    step = max_tokens - overlap
    toks = tokens_col(F.col(text_col))
    n = F.size(F.col("_toks"))
    # last chunk index: 0 when the doc fits, else ceil((n - max)/step)
    # ((n - max)/step is exact in a double for any real token count)
    last = F.when(n <= max_tokens, F.lit(0)).otherwise(
        F.ceil((n - F.lit(max_tokens)) / F.lit(step))
    )
    start = F.col("chunk_idx") * step
    return (
        docs.select(F.col(id_col), toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), last)))
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.least(F.lit(max_tokens), n - start).cast("int").alias("n_tokens"),
            F.array_join(F.slice("_toks", start + 1, F.lit(max_tokens)), " ").alias(
                "chunk_text"
            ),
        )
    )


# ------------------------------------------------- corpus datasheet


def corpus_report(
    docs: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """The corpus datasheet a data team publishes next to a training set:
    per (source × predicted language) document/token/char counts and mean
    quality, with per-source subtotals and a grand total from ONE
    ``rollup`` pass (Catalyst expands the grouping sets inside a single
    partial+final aggregate — no per-level jobs, no second scan).

    Subtotal rows carry NULL in the rolled-up columns (standard SQL
    rollup semantics). Language ID and quality are the repo's pinned
    Catalyst expressions — the whole report is JVM-side."""
    enriched = with_lang_pred(docs, text_col=text_col, out_col="lang_pred")
    return (
        enriched.rollup(source_col, "lang_pred")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count(F.col(text_col))).alias("n_tokens"),
            F.sum(F.length(text_col)).alias("n_chars"),
            F.avg(quality_score(F.col(text_col), F.length(text_col))).alias(
                "avg_quality"
            ),
        )
        .orderBy(
            F.col(source_col).asc_nulls_first(), F.col("lang_pred").asc_nulls_first()
        )
    )


def yield_curve(
    docs: DataFrame,
    score_col: str,
    thresholds: list[float],
    *,
    weight_col: str | None = None,
) -> list[dict]:
    """Threshold-sweep survival table — the "where do we set the quality
    cutoff" datasheet: for every candidate threshold t, how many
    documents (and how much ``weight_col`` mass — tokens/chars/bytes)
    survive ``score >= t``. Choosing a filter threshold by target
    token-yield is this one call.

    ONE wide partial+final aggregate over a single scan: per threshold a
    conditional count + conditional sum column (2|T|+2 agg expressions,
    one output row), unpacked on the driver — no explode, no |T|×N row
    blowup, no second pass. NULL scores are excluded from both numerator
    and denominator (undefined quality is a separate upstream problem;
    fractions here answer "of the scored docs, what survives").

    Returns ``[{threshold, n_docs, frac_docs[, weight, frac_weight]}]``
    sorted by threshold. Twin: :func:`logagg.textfns.yield_curve_py`."""
    if not thresholds:
        raise ValueError("need at least one threshold")
    ts = sorted(set(float(t) for t in thresholds))
    s = F.col(score_col).cast("double")
    scored = s.isNotNull() & ~F.isnan(s)
    aggs = [F.sum(scored.cast("long")).alias("_total")]
    if weight_col is not None:
        w = F.col(weight_col).cast("double")
        aggs.append(F.sum(F.when(scored, w).otherwise(0.0)).alias("_wtotal"))
    for i, t in enumerate(ts):
        live = scored & (s >= t)
        aggs.append(F.sum(live.cast("long")).alias(f"_n{i}"))
        if weight_col is not None:
            aggs.append(
                F.sum(F.when(live, F.col(weight_col).cast("double")).otherwise(0.0)).alias(f"_w{i}")
            )
    row = docs.agg(*aggs).collect()[0]
    total, wtotal = row["_total"] or 0, row["_wtotal"] if weight_col else None
    out = []
    for i, t in enumerate(ts):
        entry = {
            "threshold": t,
            "n_docs": row[f"_n{i}"] or 0,
            "frac_docs": (row[f"_n{i}"] or 0) / total if total else 0.0,
        }
        if weight_col is not None:
            entry["weight"] = row[f"_w{i}"] or 0.0
            entry["frac_weight"] = (row[f"_w{i}"] or 0.0) / wtotal if wtotal else 0.0
        out.append(entry)
    return out


# ------------------------------------------------- URL canonicalization

# tracking parameters stripped from canonical urls (the usual suspects);
# anchored at param start, matching bare ("utm_x") and valued ("utm_x=1")
TRACKING_PARAM_RE = r"^(utm_[^=&]*|gclid|fbclid|msclkid|mc_eid|igshid|ref|ref_src)(=|$)"


def canonical_url(url: Column) -> Column:
    """Canonical form of a crawl url — the recrawl/mirror dedup key:

    * scheme and authority lowercased; leading ``www.`` stripped
    * default ports dropped (``:80`` for http, ``:443`` for https)
    * fragment dropped; trailing path slashes trimmed
    * tracking params (:data:`TRACKING_PARAM_RE`) removed, the rest
      sorted — param order is presentation, not identity

    Unparseable urls come back UNCHANGED (``try_parse_url`` null →
    coalesce fallback; a crawl always contains junk and the junk still
    needs a stable key). Pure Catalyst — parse, regexes, higher-order
    filter/sort — zero Python. Twin: ``textfns.canonical_url_py``
    (contract pinned for RFC-ish well-formed urls; both engines pass
    junk through)."""
    proto = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    auth = F.regexp_replace(
        F.lower(F.try_parse_url(url, F.lit("AUTHORITY"))), r"^www\.", ""
    )
    auth = (
        F.when(proto == "http", F.regexp_replace(auth, ":80$", ""))
        .when(proto == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    path = F.regexp_replace(F.try_parse_url(url, F.lit("PATH")), "/+$", "")
    query = F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    canon = F.concat(
        proto,
        F.lit("://"),
        auth,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.coalesce(canon, url)


def dedup_urls(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Keep ONE page per canonical url (recrawl / mirror / tracking-param
    dedup). Keeper = the occurrence with the smallest (md5(url), url) —
    content-independent and reproducible. Returns surviving input rows
    plus the ``canonical_url`` column.

    Scale shape: exact-duplicate urls collapse in a first hash agg
    (dropDuplicates on the url — map-side combine), then the keeper per
    canonical key comes from one partial+final min(struct) aggregate and
    a left_semi restore — the same skew-proof pattern as
    ``dedup.dedup_paragraphs`` (a hot canonical key never serializes
    onto one task)."""
    uniq = pages.dropDuplicates([url_col])
    u = F.col(url_col)
    tagged = uniq.withColumn("canonical_url", canonical_url(u)).withColumn(
        "_okey", F.md5(u.cast("binary"))
    )
    keepers = (
        tagged.groupBy("canonical_url")
        .agg(F.min(F.struct("_okey", url_col)).alias("_keep"))
        .select(F.col("_keep._okey").alias("_okey"), F.col(f"_keep.{url_col}").alias(url_col))
    )
    return tagged.join(keepers, ["_okey", url_col], "left_semi").drop("_okey")


def collocations(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """PMI-ranked adjacent-word collocations over the corpus —
    ``(w1, w2, n_pair, pmi)``, top-``top_k`` by pmi desc then (w1, w2)
    asc, pairs under ``min_count`` dropped (PMI is noise at low counts).
    The corpus-datasheet companion to :func:`repetition_stats`: high-PMI
    pairs surface boilerplate phrases and templated navigation a
    per-document filter can't see, and a healthy natural corpus shows
    named entities / idioms at the top, not markup fragments.

    ``pmi = ln( (c_xy/N) / ((c_x/M)·(c_y/M)) )`` with N = total bigram
    positions, M = total tokens — the exact expression (division order
    included) mirrored by the :func:`logagg.textfns.collocations_py`
    twin so both engines round identically.

    Plan shape: ONE tokenization of the corpus (persisted array column),
    an explode+count for unigrams and one for adjacent pairs (both
    partial+final aggs), two scalar totals to the driver, vocab-sized
    joins of pair counts to the two unigram legs, TakeOrdered top-k.
    The bounded result is materialized so every intermediate cache is
    released before return."""
    from logagg import util

    toks = docs.select(tokens_col(F.col(text_col)).alias("_t")).persist()
    try:
        uni = (
            toks.select(F.explode("_t").alias("w"))
            .groupBy("w")
            .agg(F.count("*").alias("_cw"))
            .persist()
        )
        n = F.size(F.col("_t"))
        pairs = F.zip_with(
            F.slice(F.col("_t"), 1, F.greatest(n - 1, F.lit(0))),
            F.slice(F.col("_t"), 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
        bi = (
            toks.select(F.explode(pairs).alias("p"))
            .select("p.w1", "p.w2")
            .groupBy("w1", "w2")
            .agg(F.count("*").alias("n_pair"))
            .persist()
        )
        m_tokens = uni.agg(F.sum("_cw")).collect()[0][0] or 0
        n_bigrams = bi.agg(F.sum("n_pair")).collect()[0][0] or 0
        if n_bigrams == 0:
            uni.unpersist()
            bi.unpersist()
            return docs.sparkSession.createDataFrame(
                [], "w1 string, w2 string, n_pair long, pmi double"
            )
        big_n = F.lit(float(n_bigrams))
        big_m = F.lit(float(m_tokens))
        out = (
            bi.filter(F.col("n_pair") >= min_count)
            .join(
                uni.select(F.col("w").alias("w1"), F.col("_cw").alias("_c1")),
                "w1",
            )
            .join(
                uni.select(F.col("w").alias("w2"), F.col("_cw").alias("_c2")),
                "w2",
            )
            .select(
                "w1",
                "w2",
                "n_pair",
                F.log(
                    (F.col("n_pair") / big_n)
                    / ((F.col("_c1") / big_m) * (F.col("_c2") / big_m))
                ).alias("pmi"),
            )
            .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
            .limit(top_k)
        )
        res = util.materialize_local(out)
        uni.unpersist()
        bi.unpersist()
        return res
    finally:
        toks.unpersist()


def strip_host_boilerplate(
    pages: DataFrame,
    *,
    url_col: str = "url",
    text_col: str = "text",
    min_share: float = 0.5,
    min_pages: int = 3,
    min_chars: int = 4,
) -> DataFrame:
    """Remove per-host boilerplate LINES: a line appearing on at least
    ``min_share`` of a host's pages (and on ≥ ``min_pages`` pages) is
    site furniture — cookie banners, nav, footers — that survives even
    good per-page extraction because every host renders it differently.
    The host-frequency line cut is the CCNet/C4-family preprocessing
    step (public); lines shorter than ``min_chars`` never participate
    (too generic to be evidence). Returns the input rows with
    ``text_col`` rewritten (dropped lines removed, survivors rejoined
    with ``\\n`` in original order) plus ``n_lines_dropped``. Input rows
    must be unique by ``url_col`` (run :func:`dedup_urls` first — the
    curate pipeline already does).

    Scale shape, all Catalyst: one ``posexplode`` of the line split →
    per-(host, line-digest) DISTINCT page count (partial+final; the key
    includes the digest so one host's volume spreads across tasks) +
    one host-sized page count, joined back on (host, digest) — the
    digest join is corpus-lines × host-vocabulary, hash-partitioned —
    then per-page reassembly via one ``collect_list(struct(idx, line))``
    agg (page-bounded) and an ``array_sort`` rejoin. No Python, no
    windows, no driver traffic."""
    host = F.coalesce(
        F.try_parse_url(F.col(url_col), F.lit("HOST")), F.lit("\x00invalid")
    )
    base = pages.withColumn("_host", host)
    lines = base.select(
        "_host",
        F.col(url_col).alias("_u"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "_idx", "_line"
        ),
    ).withColumn("_sig", F.md5(F.col("_line").cast("binary")))
    host_pages = base.groupBy("_host").agg(
        F.count_distinct(F.col(url_col)).alias("_hp")
    )
    line_pages = (
        lines.filter(F.length("_line") >= min_chars)
        .select("_host", "_sig", "_u")
        .distinct()
        .groupBy("_host", "_sig")
        .agg(F.count("*").alias("_lp"))
    )
    tagged = (
        lines.join(line_pages, ["_host", "_sig"], "left")
        .join(host_pages, "_host")
        .withColumn(
            "_drop",
            (F.length("_line") >= min_chars)
            & (F.col("_lp") >= min_pages)
            & ((F.col("_lp") / F.col("_hp")) >= min_share),
        )
    )
    rebuilt = tagged.groupBy("_u").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("_drop"), F.struct("_idx", "_line")
                        )
                    )
                ),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("_new_text"),
        F.sum(F.col("_drop").cast("int")).alias("n_lines_dropped"),
    )
    return (
        pages.join(
            rebuilt.withColumnRenamed("_u", url_col), url_col
        )
        .withColumn(text_col, F.col("_new_text"))
        .drop("_new_text")
    )


def c4_filters(
    pages: DataFrame,
    *,
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    bad_words: tuple[str, ...] = (),
) -> DataFrame:
    """C4-style line and document cleaning (Raffel et al. 2020, §2.2 — the
    public heuristics behind the C4 corpus). Line rules: keep a line only
    if it (a) ends in a terminal punctuation mark (``.`` ``!`` ``?`` or a
    closing ``\"``, after trailing-ASCII-whitespace trim), (b) has at least
    ``min_words_per_line`` whitespace tokens, and (c) does not mention
    "javascript" (case-insensitive). Document rules, on the ORIGINAL
    text: drop pages containing ``{`` (code), the phrase "lorem ipsum"
    (placeholder boilerplate), any ``bad_words`` token (lowercased
    token-exact match), or fewer than ``min_sentences`` sentences in the
    kept text (sentence = terminal punct, optional closing quote, then
    whitespace — counted against a sentinel-``\\n``-terminated copy so no
    engine-specific ``$`` semantics are involved).

    Returns surviving rows with ``text_col`` rewritten to the kept lines
    (original order, ``\\n``-joined) plus ``n_lines_dropped`` and
    ``n_sentences``. Pure Catalyst — one projection, zero shuffles, zero
    Python; filters stay above the scan so column pruning and pushdown are
    untouched. Twin: :func:`logagg.textfns.c4_filter_py` (independent
    implementation, differential-tested).

    Reference scope note: the reference pipeline (aggregator/logs.py)
    validates and drops malformed log rows (P11); this is the analogous
    validate/drop pass a webtext user runs on page text."""
    ws = "[ \\t\\x0b\\f\\r]"
    text = F.coalesce(F.col(text_col), F.lit(""))

    def _keep_line(ln: Column) -> Column:
        trimmed = F.regexp_replace(ln, ws + "+$", "")
        last = F.substring(trimmed, -1, 1)
        ends_ok = last.isin(".", "!", "?", '"')
        n_words = F.size(F.filter(F.split(ln, ws + "+"), lambda w: w != F.lit("")))
        no_js = ~F.contains(F.lower(ln), F.lit("javascript"))
        return ends_ok & (n_words >= min_words_per_line) & no_js

    lines = F.split(text, "\n")
    # named intermediate so the filter-lambda tree is evaluated ONCE (an
    # inline reuse would duplicate it into every downstream expression)
    out = (
        pages.withColumn("_kept", F.filter(lines, _keep_line))
        .withColumn("n_lines_dropped", F.size(lines) - F.size(F.col("_kept")))
        .withColumn(
            # sentinel \n instead of `$`: Java and Python disagree on whether a
            # bare `$` matches before a final line terminator; the explicit
            # class never does
            "n_sentences",
            F.regexp_count(
                F.concat(F.array_join(F.col("_kept"), "\n"), F.lit("\n")),
                F.lit("[.!?][\"']?[ \\t\\n\\x0b\\f\\r]"),
            ),
        )
    )
    doc_ok = (
        ~F.contains(text, F.lit("{"))
        & ~F.contains(F.lower(text), F.lit("lorem ipsum"))
        & (F.col("n_sentences") >= min_sentences)
    )
    if bad_words:
        lowered = [w.lower() for w in bad_words]
        doc_ok = doc_ok & ~F.arrays_overlap(
            tokens_col(F.lower(text)), F.array(*[F.lit(w) for w in lowered])
        )
    return (
        out.filter(doc_ok)
        .withColumn(text_col, F.array_join(F.col("_kept"), "\n"))
        .drop("_kept")
    )


def winnow_fingerprints(
    docs: DataFrame,
    *,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowed local fingerprints per document (Schleimer et al. 2003 —
    MOSS): ``(id string, pos int, fp long)`` rows, one fingerprint per
    w-window of k-gram hashes (rightmost-minimum rule). The selection
    guarantee — any shared token run of ≥ k + w - 1 tokens between two
    documents shares a fingerprint — makes this the sparse index for
    partial-overlap detection (plagiarism / quotation / syndication),
    sitting between exact-substring dedup (dense positional n-grams,
    ~w/2× more postings) and MinHash (whole-document similarity only).
    Matching is the repo's standard postings shape: explode is already
    done — ``groupBy(fp)`` or self-join on ``fp`` exactly like the
    shingle-pair join, at ~2/(w+1) of the rows.

    One map-only Arrow pass (kernel single-sourced in
    :func:`logagg.textfns.winnow_py`); zero shuffles; ids ride as
    strings like every Arrow kernel here."""
    from logagg.textfns import winnow_py

    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")

    def _batches(batches):
        import pandas as pd

        for pdf in batches:
            ids, poss, fps = [], [], []
            for did, text in zip(pdf["id"], pdf["text"]):
                for pos, fp in winnow_py(text, k, w):
                    ids.append(did)
                    poss.append(pos)
                    fps.append(fp)
            if ids:
                yield pd.DataFrame(
                    {
                        "id": pd.Series(ids, dtype="string"),
                        "pos": pd.Series(poss, dtype="int32"),
                        "fp": pd.Series(fps, dtype="int64"),
                    }
                )

    src = docs.select(
        F.col(id_col).cast("string").alias("id"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(_batches, "id string, pos int, fp long")


def winnow_overlaps(
    docs: DataFrame,
    *,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    df_max: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Partial-overlap candidate pairs from winnowed fingerprints —
    "which documents share copied passages": ``(id_a, id_b, shared)``
    for every pair sharing ≥ ``min_shared`` fingerprints (id_a < id_b as
    strings). By the winnowing guarantee a shared token run of ≥
    k + w − 1 always contributes a shared fingerprint, so min_shared=2
    roughly demands two independent shared passages (or one long one).

    Scale shape = the shingle-postings pattern of
    ``logagg.dedup.jaccard_pairs``, on a ~2/(w+1)-thinner table:
    distinct (fp, id) postings → per-fp sorted id lists capped at
    ``df_max`` (a fingerprint in more docs than that is boilerplate —
    pairing everything-with-everything on it is quadratic noise, the
    same stop-shingle argument as dedup) → JVM combo explode over the
    bounded lists → one pair-count agg. No self-join of the exploded
    table, no driver materialization."""
    fps = (
        winnow_fingerprints(docs, k=k, w=w, id_col=id_col, text_col=text_col)
        .select("fp", "id")
        .distinct()
    )
    postings = (
        fps.groupBy("fp")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= df_max))
    )
    ids = F.col("ids")
    combos = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        postings.select(F.explode(combos).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
