"""Corpus mixing, ordering, and blocklist filtering — the "assemble the
training run" operators that sit between curation and the trainer.

Reference scope note: the reference pipeline (aggregator/logs.py,
aggregator/db.py) ends at routed, aggregated sinks; these operators cover
the step a webtext user takes NEXT with those sinks — weighting sources
into a mixture, fixing a reproducible training order, and dropping
blocklisted domains. All pure Catalyst; every random-looking choice is a
content-independent hash of (seed, id), so any run, engine, partitioning,
or cluster size reproduces the same mixture and the same order.

Scale shapes:

* ``mix_sources`` — one broadcast join against a #sources-row weight table
  plus a per-row hash; epoch repetition is an ``explode`` of a
  ``ceil(weight)``-element sequence (rows grow by exactly the mixture's
  oversampling factor, no shuffle).
* ``temperature_weights`` — one partial+final count agg; the collect is
  #sources rows (driver-sized by definition).
* ``training_order`` — ``repartitionByRange`` on the hash key (one range
  shuffle — the sampled range boundaries give balanced output tasks) +
  ``sortWithinPartitions``: globally sorted output without a
  single-partition sort.
* ``filter_blocklist`` — the host-suffix chain is exploded (a host has
  ≤ #labels suffixes, ~4-5 for real domains) and equi-joined against the
  broadcast blocklist: a hash join, NOT the BroadcastNestedLoopJoin an
  ``endswith`` OR-chain would force.

Pure-Python twins: :func:`logagg.textfns.mix_uniform_py` /
``mix_copies_py`` / ``host_suffixes_py`` (tests diff them row-exactly).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mix_uniform(id_col: Column, seed: str) -> Column:
    """Deterministic uniform in [0, 1): the first 8 hex chars of
    md5("<seed>:<id>") as an integer, divided by 2^32.

    Bit-identical across engines: the integer is < 2^32 (exact in a
    double) and the divisor is a power of two (exact division), so Spark,
    DuckDB (same expression in SQL) and the Python twin agree on every
    bit. A new ``seed`` re-rolls every document independently."""
    h = F.md5(F.concat(F.lit(seed + ":"), id_col.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(4294967296.0)


def mix_copies(id_col: Column, weight: Column, seed: str) -> Column:
    """How many times this row appears in the mixture at sampling rate
    ``weight`` (may exceed 1 — epoch repetition): ``floor(w)`` guaranteed
    copies plus one more with probability ``frac(w)``, decided by the
    content-independent uniform. Weight 0 → 0 copies, 2.3 → 2 or 3."""
    base = F.floor(weight).cast("int")
    frac = weight - F.floor(weight)
    return (base + (mix_uniform(id_col, seed) < frac).cast("int")).alias("n_copies")


def mix_sources(
    docs: DataFrame,
    weights: dict[str, float],
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix",
    epoch_col: str = "mix_epoch",
) -> DataFrame:
    """Assemble a weighted mixture: each document of source ``s`` is
    sampled ``weights[s]`` times in expectation (deterministically — the
    same seed always keeps/repeats the same documents). Sources absent
    from ``weights`` are dropped (an explicit mixture lists everything it
    ships). Output rows carry ``epoch_col`` (0-based copy index) so a
    downstream :func:`training_order` can interleave repeats instead of
    clustering them.

    The weight lookup is a broadcast hash join against a #sources-row
    table — scales to any number of sources with no when-chain codegen
    blowup and no shuffle of the docs side."""
    for w in weights.values():
        _check_weight(w)
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(s, float(w)) for s, w in sorted(weights.items())],
        f"{source_col} string, _w double",
    )
    return mix_sources_df(
        docs, wdf, source_col=source_col, weight_col="_w", id_col=id_col,
        seed=seed, epoch_col=epoch_col,
    )


def mix_sources_df(
    docs: DataFrame,
    weights: DataFrame,
    *,
    source_col: str = "source",
    weight_col: str = "weight",
    id_col: str = "doc_id",
    seed: str = "mix",
    epoch_col: str = "mix_epoch",
    broadcast_weights: bool = True,
) -> DataFrame:
    """:func:`mix_sources` with the weight table as a DataFrame — the
    form a PER-HOST mixture needs (millions of hosts never fit a driver
    dict; :func:`logagg.linkgraph.authority_weights` produces exactly this
    table). Same sampling semantics, same determinism contract. Flip
    ``broadcast_weights=False`` when the weight table outgrows the
    broadcast threshold — the join degrades to a shuffle hash join on the
    key, still never a when-chain."""
    wdf = weights.select(
        F.col(source_col), F.col(weight_col).cast("double").alias("_mix_weight")
    )
    if broadcast_weights:
        wdf = F.broadcast(wdf)
    copies = mix_copies(F.col(id_col), F.col("_mix_weight"), seed)
    return (
        docs.join(wdf, source_col)
        .withColumn("_n_copies", copies)
        .filter(F.col("_n_copies") > 0)
        .withColumn(epoch_col, F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)))
        .drop("_mix_weight", "_n_copies")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    *,
    id_col: str = "doc_id",
    seed: str = "wrs",
    key_col: str | None = None,
) -> DataFrame:
    """Exactly-k weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006 A-ES): every row draws the deterministic uniform
    u = (h+1)/2^32 (h as in :func:`mix_uniform`; the +1 keeps u in
    (0, 1] so ``log`` never sees 0 — Spark's ``log`` returns NULL there)
    and ranks by key = ln(u)/weight; the k LARGEST keys are the sample.
    Inclusion probabilities follow the weights (first pick ∝ w_i), so
    "sample 1M docs skewed by quality score" is this one call —
    :func:`mix_copies` is the expectation-sized Bernoulli dual, this is
    the exact-k dual.

    Scale shape: one map-side key projection + ``orderBy().limit(k)`` —
    Spark plans TakeOrdered (per-partition top-k heaps + a k-row driver
    merge), never a global sort. Like :func:`logagg.aggregate.
    bottomk_sample` the rule is content-independent and EXACTLY
    mergeable: top-k(A ∪ B) == top-k(top-k(A) ∪ top-k(B)), so per-shard /
    per-day samples compose without resampling. Rows with NULL,
    non-positive, or non-finite weight are excluded; ties break on id.
    ``key_col`` keeps the rank key in the output (for composing merges);
    default drops it. Twin: :func:`logagg.textfns.weighted_sample_py`
    (bit-identical keys — u is exact in a double and both engines use
    IEEE ``log``, the same portability argument as the DSIR gumbel
    keys)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col).cast("double")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")).cast("binary")),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(4294967296.0)
    key = F.log(u) / w
    out = (
        df.filter(w.isNotNull() & (w > 0) & ~F.isnan(w) & (w < F.lit(float("inf"))))
        .withColumn(key_col or "_wrs_key", key)
        .orderBy(F.col(key_col or "_wrs_key").desc(), F.col(id_col))
        .limit(k)
    )
    return out if key_col else out.drop("_wrs_key")


def temperature_weights(
    docs: DataFrame,
    *,
    alpha: float = 0.5,
    target_total: int | None = None,
    source_col: str = "source",
) -> dict[str, float]:
    """Temperature-flattened mixture weights (multilingual-LM style,
    Conneau & Lample 2019 §3.1): sampling probability q_s ∝ p_s^alpha
    where p_s is the source's share of the corpus, rescaled so the
    expected mixture size is ``target_total`` rows (default: the input
    size — reweight without growing). Returns {source: per-document
    sampling rate} for :func:`mix_sources`.

    alpha=1 reproduces the natural distribution; alpha→0 approaches
    uniform-over-sources. One count aggregate; the collect is one row per
    source (driver-sized by definition)."""
    counts = {
        r[0]: r[1]
        for r in docs.groupBy(source_col).agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    if total == 0:
        return {}
    budget = total if target_total is None else target_total
    q = {s: (n / total) ** alpha for s, n in counts.items()}
    z = sum(q.values())
    return {s: (q[s] / z) * budget / counts[s] for s in sorted(counts)}


def token_budget_plan_counts(
    token_counts: dict[str, int],
    *,
    target_tokens: int,
    alpha: float = 1.0,
    max_epochs: float | dict[str, float] = 4.0,
) -> dict:
    """Allocate a training token budget across sources under per-source
    epoch caps — the data-recipe table of GPT-3 §2.2 / LLaMA §2 ("weight
    %, epochs") as a pure function. Desired allocation is temperature-
    flattened over token shares (q_s ∝ n_s^alpha, same rule as
    :func:`temperature_weights`); no source may be repeated more than
    ``max_epochs`` times (a float or a per-source dict — e.g. cap the
    small high-quality source at 4 epochs, web text at 1).

    When a source's desired allocation exceeds its cap, the excess is
    REDISTRIBUTED to the uncapped sources in proportion to their q_s
    (water-filling), not dropped — the closed form sorts sources by
    cap_s/q_s ascending and scans for the pivot where the common scale
    λ = remaining_budget / remaining_q stops capping anyone (the twin,
    :func:`logagg.textfns.token_budget_plan_py`, reaches the same
    fixpoint by naive iteration; tests diff them). If the budget exceeds
    the sum of all caps the plan allocates every cap and reports the
    shortfall as ``unfilled_tokens``.

    Returns ``{"plan": [{source, tokens, alloc_tokens, epochs, capped}],
    "target_tokens", "allocated_tokens", "unfilled_tokens"}``. Each
    source's ``epochs`` (= alloc/tokens, the expected repetition rate)
    is directly a :func:`mix_sources` per-document weight: sampling each
    document of source s ``epochs_s`` times in expectation yields
    ``alloc_tokens_s`` expected tokens. Driver-side math over one row
    per source, by definition driver-sized."""
    if target_tokens < 0:
        raise ValueError("target_tokens must be >= 0")
    if not (alpha >= 0 and math.isfinite(alpha)):
        raise ValueError("alpha must be finite and >= 0")

    def cap_for(s: str) -> float:
        e = max_epochs.get(s, 0.0) if isinstance(max_epochs, dict) else max_epochs
        if not (e >= 0 and math.isfinite(e)):
            raise ValueError(f"max_epochs for {s!r} must be finite and >= 0")
        return float(e)

    sources = sorted(token_counts)
    n = {s: max(0, int(token_counts[s])) for s in sources}
    total = sum(n.values())
    # desired (uncapped) share: q_s ∝ (n_s/total)^alpha; n_s == 0 → 0
    q = {s: (n[s] / total) ** alpha if total and n[s] else 0.0 for s in sources}
    z = sum(q.values())
    q = {s: (q[s] / z if z else 0.0) for s in sources}
    cap = {s: cap_for(s) * n[s] for s in sources}

    budget = float(min(target_tokens, sum(cap[s] for s in sources)))
    # water-fill: alloc_s = min(cap_s, λ·q_s) with λ s.t. Σ alloc = budget.
    # Sources capped in increasing cap/q order; scan for the pivot.
    ranked = sorted((s for s in sources if q[s] > 0), key=lambda s: (cap[s] / q[s], s))
    alloc = {s: 0.0 for s in sources}
    lo = 0
    while True:
        rem_q = sum(q[s] for s in ranked[lo:])
        rem_b = budget - sum(cap[s] for s in ranked[:lo])
        lam = rem_b / rem_q if rem_q else 0.0
        if lo < len(ranked) and lam * q[ranked[lo]] > cap[ranked[lo]]:
            lo += 1
            continue
        break
    capped = set(ranked[:lo])
    for s in ranked[:lo]:
        alloc[s] = cap[s]
    for s in ranked[lo:]:
        alloc[s] = lam * q[s]
    allocated = sum(alloc.values())
    plan = [
        {
            "source": s,
            "tokens": n[s],
            "alloc_tokens": alloc[s],
            "epochs": (alloc[s] / n[s]) if n[s] else 0.0,
            "capped": s in capped,
        }
        for s in sources
    ]
    return {
        "plan": plan,
        "target_tokens": int(target_tokens),
        "allocated_tokens": allocated,
        "unfilled_tokens": max(0.0, target_tokens - allocated),
    }


def token_budget_plan(
    docs: DataFrame,
    *,
    target_tokens: int,
    alpha: float = 1.0,
    max_epochs: float | dict[str, float] = 4.0,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
) -> dict:
    """:func:`token_budget_plan_counts` over a corpus DataFrame: one
    partial+final sum aggregate per source (the collect is #sources rows)
    then the driver-side water-fill. ``plan_weights`` of the result feeds
    :func:`mix_sources` to realize the plan."""
    counts = {
        r[0]: int(r[1] or 0)
        for r in docs.groupBy(source_col)
        .agg(F.sum(F.col(tokens_col).cast("long")).alias("_t"))
        .collect()
    }
    return token_budget_plan_counts(
        counts, target_tokens=target_tokens, alpha=alpha, max_epochs=max_epochs
    )


def plan_weights(budget_plan: dict) -> dict[str, float]:
    """Per-document sampling weights (= epochs) from a
    :func:`token_budget_plan` result, ready for :func:`mix_sources`."""
    return {p["source"]: p["epochs"] for p in budget_plan["plan"]}


def training_order(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    seed: str = "order",
    epoch_col: str | None = None,
    key_col: str = "order_key",
    num_partitions: int | None = None,
) -> DataFrame:
    """Fix a reproducible global training order: every row gets
    ``key_col`` = md5("<seed>:<epoch>:<id>") and the frame comes back
    range-partitioned + sorted on (key, id) — i.e. globally sorted, with
    the sort parallel across ``num_partitions`` tasks (range boundaries
    from Spark's reservoir sample; no single-partition funnel).

    A different ``seed`` is a full reshuffle; with ``epoch_col`` (from
    :func:`mix_sources`) the copies of a repeated document land at
    independent positions instead of back-to-back. Writing the result
    with ``.write`` preserves the order per output file, files themselves
    ordered by partition id — the standard "pre-shuffled shards" layout
    a trainer streams sequentially."""
    epoch = F.col(epoch_col).cast("string") if epoch_col else F.lit("0")
    key = F.md5(
        F.concat(F.lit(seed + ":"), epoch, F.lit(":"), F.col(id_col).cast("string")).cast(
            "binary"
        )
    )
    out = df.withColumn(key_col, key)
    n = num_partitions or out.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(n, key_col, id_col).sortWithinPartitions(key_col, id_col)


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k: int,
    *,
    id_col: str = "doc_id",
    seed: str = "wrs",
) -> DataFrame:
    """Stratified :func:`weighted_sample`: exactly-k (or all, if fewer)
    rows PER GROUP, weighted within each group — "the quality-skewed k
    docs per language / per source / per k-means cluster" in one pass.
    Same A-ES key (ln(u)/w, deterministic md5 uniform), ranked by a
    window within the group instead of a global TakeOrdered: one shuffle
    on ``group_col``, so millions of groups are fine but a single
    monster group concentrates on one task — for the uniform-weight case
    at heavy skew use :func:`logagg.similarity.cluster_balanced_sample`'s
    hash-rank rule with salting instead. Exclusion rule (null/zero/
    negative/non-finite weights) and determinism contract match
    :func:`weighted_sample`; the per-group sample equals the global
    function applied to that group alone (pinned by test — windowed rank
    and TakeOrdered agree on the same key)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col).cast("double")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")).cast("binary")),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(4294967296.0)
    key = F.log(u) / w
    from pyspark.sql import Window

    win = Window.partitionBy(group_col).orderBy(
        F.col("_wrs_key").desc(), F.col(id_col)
    )
    return (
        df.filter(w.isNotNull() & (w > 0) & ~F.isnan(w) & (w < F.lit(float("inf"))))
        .withColumn("_wrs_key", key)
        .withColumn("_wrs_rn", F.row_number().over(win))
        .filter(F.col("_wrs_rn") <= k)
        .drop("_wrs_key", "_wrs_rn")
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    *,
    n_stages: int = 10,
    ascending: bool = True,
    id_col: str = "doc_id",
    seed: str = "curriculum",
    sample_k: int = 4096,
    stage_col: str = "stage",
    key_col: str = "order_key",
    num_partitions: int | None = None,
) -> DataFrame:
    """Curriculum training order: stage documents into ``n_stages``
    difficulty/quality bands and fix a reproducible order that runs the
    bands in sequence (easy→hard with ``ascending=True``) while fully
    shuffling WITHIN each band — the Bengio et al. 2009 schedule as a
    data-layout op, so the trainer just streams shards in order.

    Band boundaries come from the coordinated bottom-k sample's type-1
    quantiles (:func:`logagg.aggregate.sampled_quantiles`) rather than
    ``approxQuantile``: the bottom-k rule is content-independent and
    partitioning-invariant, so the SAME corpus always yields the SAME
    boundaries (reproducibility is the whole point of a fixed training
    order). Assignment is one broadcast-free range comparison per row
    (boundaries are a driver-side list of ≤ n_stages-1 values inlined
    into a Catalyst sum-of-flags), the order key is the usual
    md5(seed:id) shuffle within the band, and the global layout is one
    ``repartitionByRange`` + local sort on (stage, key, id) — no
    single-partition funnel, same plan family as
    :func:`training_order`. NULL scores land in the last band (train on
    unscored material at the end, where a curriculum's assumptions are
    weakest)."""
    from logagg import aggregate

    if n_stages < 2:
        raise ValueError("n_stages must be >= 2")
    probs = tuple(i / n_stages for i in range(1, n_stages))
    bounds = [
        v
        for _, v in aggregate.sampled_quantiles(
            df, score_col, id_col, k=sample_k, probs=probs
        )
        if v is not None
    ]
    s = F.col(score_col).cast("double")
    # stage = number of boundaries strictly below the score (dup
    # boundaries collapse bands — harmless, ordering is preserved)
    stage_expr = F.lit(0)
    for b in bounds:
        stage_expr = stage_expr + (s > F.lit(float(b))).cast("int")
    if not ascending:
        stage_expr = F.lit(len(bounds)) - stage_expr
    stage_expr = F.when(s.isNull() | F.isnan(s), F.lit(len(bounds) + 1)).otherwise(
        stage_expr
    )
    key = F.md5(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")).cast("binary")
    )
    out = df.withColumn(stage_col, stage_expr).withColumn(key_col, key)
    n = num_partitions or out.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(
        n, stage_col, key_col, id_col
    ).sortWithinPartitions(stage_col, key_col, id_col)


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a hostname, most-specific first:
    'a.b.co' → ['a.b.co', 'b.co', 'co']. NULL host → empty array."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    sufs = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
    )
    return F.when(host.isNull(), F.array().cast("array<string>")).otherwise(sufs)


def filter_blocklist(
    pages: DataFrame,
    blocked: DataFrame | list[str],
    *,
    url_col: str = "url",
) -> DataFrame:
    """Drop pages whose url host equals a blocklisted domain or any
    subdomain of one ('ads.evil.com' matches blocklist entry 'evil.com').
    Standard crawl-curation domain blocklist semantics.

    Scale shape: each page explodes into its host's suffix chain (≤
    #labels entries) and equi-joins the broadcast blocklist — a broadcast
    HASH join per suffix, not the BroadcastNestedLoopJoin that
    ``endswith`` disjunctions force. Pages with an unparseable host have
    no suffixes and are kept (the junk group is bounded elsewhere —
    textstats.cap_per_domain). ``blocked`` is a one-column DataFrame or a
    list of domains (lowercased on both sides; DNS names are
    case-insensitive)."""
    spark = pages.sparkSession
    if isinstance(blocked, list):
        bdf = spark.createDataFrame([(b,) for b in sorted(set(blocked))], "_blocked string")
    else:
        bdf = blocked.toDF("_blocked")
    bdf = bdf.select(F.lower(F.col("_blocked")).alias("_blocked"))
    host = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    hit = (
        pages.select(F.col(url_col).alias("_u"), F.explode(host_suffixes(host)).alias("_suf"))
        .join(F.broadcast(bdf), F.col("_suf") == F.col("_blocked"))
        .select(F.col("_u"))
        .distinct()
    )
    return pages.join(hit, pages[url_col] == hit["_u"], "left_anti")


def expected_mixture_size(docs: DataFrame, weights: dict[str, float], source_col: str = "source") -> float:
    """Exact expected row count of mix_sources(docs, weights) — one agg."""
    counts = {
        r[0]: r[1]
        for r in docs.groupBy(source_col).agg(F.count("*").alias("n")).collect()
    }
    return float(sum(counts.get(s, 0) * w for s, w in weights.items()))


def _check_weight(w: float) -> None:
    if not (w >= 0 and math.isfinite(w)):
        raise ValueError(f"mixture weight must be finite and >= 0, got {w}")


def write_training_shards(
    df: DataFrame,
    outdir: str,
    *,
    rows_per_shard: int = 1_000_000,
    id_col: str = "doc_id",
    seed: str = "order",
    epoch_col: str | None = None,
    key_col: str = "order_key",
) -> list[dict]:
    """Write the corpus as pre-shuffled, trainer-ready shards: globally
    ordered by the :func:`training_order` key, one ``shard=N`` parquet
    directory per range partition, plus a ``manifest.json`` (per-shard
    rows and key range) — the layout a data loader streams sequentially
    with zero shuffling at training time.

    Scale shape: one count (shard sizing), one range shuffle (sampled
    boundaries → balanced shards, no single-partition funnel), and a
    write where every task owns exactly one shard directory — the
    partitionBy adds no shuffle because shard == the task's partition id.
    Shard row counts are approximately ``rows_per_shard`` (range
    boundaries come from Spark's reservoir sample; trainers only need
    determinism and contiguity, both exact: same input → same
    boundaries → same shards, and shard key-ranges are disjoint and
    ordered). The manifest is #shards rows — driver-sized by
    construction. Returns the manifest (also landed next to the data)."""
    import json as _json
    import math as _math

    n = df.count()
    n_shards = max(1, _math.ceil(n / rows_per_shard))
    ordered = training_order(
        df,
        id_col=id_col,
        seed=seed,
        epoch_col=epoch_col,
        key_col=key_col,
        num_partitions=n_shards,
    )
    tagged = ordered.withColumn("shard", F.spark_partition_id())
    tagged.write.mode("overwrite").partitionBy("shard").parquet(outdir)
    spark = df.sparkSession
    stats = (
        spark.read.parquet(outdir)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(key_col).alias("key_min"),
            F.max(key_col).alias("key_max"),
        )
        .orderBy("shard")
        .collect()
    )
    manifest = [
        {
            "shard": int(r["shard"]),
            "n_rows": r["n_rows"],
            "key_min": r["key_min"],
            "key_max": r["key_max"],
        }
        for r in stats
    ]
    with open(f"{outdir}/manifest.json".replace("file:", ""), "w") as fh:
        _json.dump(manifest, fh, indent=1)
    return manifest
