"""Per-sink aggregates — Catalyst hash aggregation, plus an explicitly
salted two-phase variant for skewed host keys.

The reference's aggregate semantics are count-shaped invariants (severity /
source histograms, per-batch row counts — SURVEY.md §2.4); the north-star
promotes them to `groupBy(host, lang, time-bucket) → count/sum`. All sums
here are over int64 (char lengths, counts) so salting / partial-final
recombination is exactly associative — no float-order hazards.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# above this share of rows a host is "hot" and worth salting when the
# downstream agg key is the host alone (Zipf head in web corpora)
DEFAULT_SALT_BUCKETS = 16


def severity_counts(parsed: DataFrame) -> DataFrame:
    """A2 analog: count by severity (partial+final hash agg — no custom work)."""
    return parsed.groupBy("severity").agg(F.count("*").alias("n"))


def source_counts(parsed: DataFrame) -> DataFrame:
    """A3 analog: count by source (null source = shifted/absent field)."""
    return parsed.groupBy("source").agg(F.count("*").alias("n"))


def sink_agg_hourly(parsed: DataFrame) -> DataFrame:
    """Per-sink aggregate: groupBy(host, lang, hour-bucket of warc_ts) →
    row count + total message chars (int64-exact)."""
    return (
        parsed.groupBy(
            "host", "lang", F.date_trunc("hour", F.col("warc_ts")).alias("bucket")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.length("message")).alias("total_msg_chars"),
        )
    )


def daily_user_sketches(events: DataFrame) -> DataFrame:
    """Partial HLL sketches (DataSketches) of distinct users per
    (event_type, day). This is the MATERIALIZED-PARTIAL pattern that makes
    distinct-count rollups tractable at 100 TB: the daily job stores a few
    KB of sketch per group instead of the member set, and any coarser
    grain (week / month / all-time) comes from ``merge_user_sketches``
    without touching the raw data again."""
    return events.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("user_sketch"))


def merge_user_sketches(sketches: DataFrame) -> DataFrame:
    """Roll partial sketches up to per-type distinct-user estimates via
    ``hll_union_agg`` — exactly equal (same registers, associative merge)
    to sketching the raw data in one pass; proven in pytest."""
    return sketches.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("user_sketch")).alias("approx_users")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    buckets: int = DEFAULT_SALT_BUCKETS,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Explicit skew-safe equi-join: replicate the dim side ``buckets``×
    with a salt column, salt the fact side deterministically, join on
    (key, salt). Each hot fact key spreads over ``buckets`` reducers
    instead of landing on one. Inner-join semantics equal the unsalted
    join exactly (dim assumed unique per key). AQE's skew-join split is
    the automatic variant; this is the hand-rolled one for engines/plans
    where AQE can't see the skew (e.g. pre-partitioned bucketed tables).

    The salt MUST be a deterministic function of row content: a
    recompute-unstable salt (ordinal / monotonically_increasing_id) used as
    a shuffle-join key silently duplicates or drops rows when a task is
    recomputed after a shuffle-fetch failure at cluster scale. That forces
    ``salt_cols`` to be explicit and REQUIRED: the caller must name narrow
    columns that distinguish rows WITHIN a hot key (e.g. url + record_idx).
    There is no safe default — hashing every column is wasted per-row CPU
    on wide payloads AND still collapses exact-duplicate rows (the common
    log-data skew shape) onto one reducer, silently defeating the salt.
    """
    from pyspark.sql import functions as F

    if not salt_cols:
        raise ValueError(
            "salted_join requires salt_cols: narrow columns that vary within "
            "a hot key (a content hash of identical rows cannot spread them)"
        )
    salt_values = F.array(*[F.lit(i) for i in range(buckets)])
    dim_rep = dim.withColumn("_salt", F.explode(salt_values))
    fact_salted = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(buckets)).cast("int")
    )
    return fact_salted.join(dim_rep, [key, "_salt"], "inner").drop("_salt")


def host_agg_salted(parsed: DataFrame, buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Two-phase salted aggregate over the skewed ``host`` key.

    Phase 1 groups by (host, salt) — the hot host's rows spread over
    ``buckets`` reducers; phase 2 recombines per host. count/sum over int64
    are associative, so the result equals the unsalted plan exactly.
    """
    salted = parsed.withColumn(
        "_salt", F.pmod(F.xxhash64("url", "record_idx"), F.lit(buckets))
    )
    partial = salted.groupBy("host", "_salt").agg(
        F.count("*").alias("_n"), F.sum(F.length("message")).alias("_chars")
    )
    return partial.groupBy("host").agg(
        F.sum("_n").alias("n_rows"), F.sum("_chars").alias("total_msg_chars")
    )


def mg_summary(df: DataFrame, key_col: str, capacity: int) -> DataFrame:
    """Merged Misra-Gries lower-bound counters for a key column:
    one map-only Arrow pass builds an MG(capacity) summary per partition
    (≤ capacity rows each), a keywise sum merges them (valid MG merge —
    total underestimate ≤ N/(capacity+1)). Result is (key, cnt) with at
    most capacity × numPartitions rows. Shared by :func:`heavy_hitters`
    and the streaming accumulator."""

    def _mg_batches(batches):
        from logagg.refsketch import misra_gries_update_py

        summary: dict = {}
        for pdf in batches:
            vc = pdf["key"].value_counts()
            summary = misra_gries_update_py(
                summary, {str(kk): int(v) for kk, v in vc.items()}, capacity
            )
        if summary:
            yield pd.DataFrame(
                {"key": list(summary.keys()), "cnt": list(summary.values())}
            )

    keyed = df.select(F.col(key_col).cast("string").alias("key")).filter(
        F.col("key").isNotNull()
    )
    summaries = keyed.mapInPandas(_mg_batches, "key string, cnt long")
    return summaries.groupBy("key").agg(F.sum("cnt").alias("cnt"))


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    *,
    k: int = 10,
    capacity: int = 256,
    exact_counts: bool = True,
) -> DataFrame:
    """Top-k heavy hitters over a huge key space (urls, hosts) WITHOUT
    shuffling every distinct key — the Misra-Gries candidate pass + exact
    recount pattern (Misra & Gries 1982; merge rule from Agarwal et al.
    2013 "Mergeable Summaries").

    Plan shape: (1) one map-only Arrow pass builds an MG(capacity) summary
    PER PARTITION (≤ capacity rows emitted each — the shuffle carries at
    most capacity × numPartitions rows, independent of key cardinality);
    (2) keywise sum merges the summaries (a valid MG merge — each counter
    underestimates by ≤ N/(capacity+1) in total); (3) with
    ``exact_counts``, a second scan recounts ONLY the candidate keys via a
    broadcast semi-join and returns the true top-k of those. Pigeonhole
    guarantees every key with true frequency > N/(capacity+1) survives
    into the candidate set (it must exceed the per-partition threshold
    somewhere), so the result IS the exact top-k whenever the k-th true
    frequency clears that bound — at web scale, host/url heads clear it by
    orders of magnitude. A plain ``groupBy(key).count().orderBy(...)``
    shuffles one row per DISTINCT key (billions of urls); this shuffles
    ≤ capacity × partitions + the candidate recount.

    With ``exact_counts=False`` the merged lower bounds themselves are
    returned (one pass, counts may under-report by ≤ N/(capacity+1)).

    Columns: ``key string, cnt long`` ordered (cnt desc, key asc).
    Reference scope note: the reference's per-source/severity histograms
    (aggregator/logs.py, SURVEY §2.4 A2/A3) are tiny-domain counts; this is
    the same "count by key, read the head" semantics for keys too numerous
    to aggregate exactly everywhere."""
    if capacity < 1 or k < 1:
        raise ValueError("k and capacity must be >= 1")
    keyed = df.select(F.col(key_col).cast("string").alias("key")).filter(
        F.col("key").isNotNull()
    )
    merged = mg_summary(df, key_col, capacity)
    if not exact_counts:
        return merged.orderBy(F.desc("cnt"), F.asc("key")).limit(k)
    candidates = merged.select("key")
    return (
        keyed.join(F.broadcast(candidates), "key")
        .groupBy("key")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(k)
    )


def count_min_build(
    df: DataFrame, key_col: str, *, depth: int = 4, width: int = 2048
) -> "np.ndarray":
    """Distributed Count-Min sketch of a key column (Cormode &
    Muthukrishnan 2005): every partition folds its keys into a local
    ``int64[depth, width]`` register block in one map-only Arrow pass,
    blocks merge by cellwise integer sum (exactly associative — the
    shuffle carries ≤ depth × width rows total, independent of both
    corpus size and key cardinality), and the driver assembles the final
    ``depth × width`` matrix (bounded by construction, like the LM /
    DSIR model collects).

    The sketch answers point frequency queries with one-sided error:
    estimate ≥ true count always, ≤ true + 2N/width per row in
    expectation. The dual of :func:`heavy_hitters` (MG underestimates,
    CM overestimates) — together they bracket a key's true frequency
    from a sketch many orders smaller than the key space. Kernels are
    single-sourced in ``logagg.refsketch`` (``countmin_*_py``), so the
    Python twin is bit-identical."""
    import numpy as np

    from logagg.refsketch import countmin_build_py

    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")

    def _batches(batches):
        acc = np.zeros((depth, width), dtype=np.int64)
        for pdf in batches:
            vc = pdf["key"].value_counts()
            acc += countmin_build_py(
                {str(k): int(v) for k, v in vc.items()}, depth, width
            )
        nz = np.nonzero(acc)
        if len(nz[0]):
            yield pd.DataFrame(
                {"row": nz[0], "col": nz[1], "cnt": acc[nz]}
            )

    cells = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .filter(F.col("key").isNotNull())
        .mapInPandas(_batches, "row int, col int, cnt long")
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()  # bounded: <= depth * width rows by construction
    )
    mat = np.zeros((depth, width), dtype=np.int64)
    for r in cells:
        mat[r["row"], r["col"]] = r["cnt"]
    return mat


def bottomk_sample(df: DataFrame, id_col: str, k: int) -> DataFrame:
    """Coordinated bottom-k sample (Cohen & Kaplan 2007 family): the k rows
    whose ids rank smallest under (md5(str(id)), id) — the same
    content-independent rule as ``similarity.hash_sample_ids``, kept as a
    DataFrame so arbitrary payload columns ride along.

    The sketch property that matters at 100 TB: bottom-k is EXACTLY
    mergeable — bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B)) — so
    per-partition / per-day / per-corpus samples compose without resampling
    and two corpora sampled with the same rule are COORDINATED (shared ids
    are sampled together, enabling sketch-space joins/overlap estimates).
    Plans as TakeOrdered (per-partition heads + tiny driver merge), never a
    global sort."""
    if k < 1:
        raise ValueError("k must be >= 1")
    return (
        df.withColumn("_hr", F.md5(F.col(id_col).cast("string").cast("binary")))
        .orderBy("_hr", F.col(id_col))
        .limit(k)
        .drop("_hr")
    )


def sampled_quantiles(
    df: DataFrame,
    value_col: str,
    id_col: str,
    *,
    k: int,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> list:
    """Quantile estimates from the bottom-k coordinated sample: type-1
    (no interpolation — value at rank ceil(p·n), the repo's bit-portable
    quantile rule) over the sampled values, NULLs excluded. Rank error is
    O(1/sqrt(k)) with high probability since the hash-sample is uniform
    over ids. Returns [(p, value)]. The sample collect is bounded by k."""
    rows = [
        r["_v"]
        for r in bottomk_sample(df, id_col, k)
        .select(F.col(value_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .collect()
    ]
    rows.sort()
    if not rows:
        return [(p, None) for p in probs]
    import math

    return [(p, rows[max(0, math.ceil(p * len(rows)) - 1)]) for p in probs]


# ---------------------------------------------------------------------------
# Bloom filter — mergeable set-membership sketch
# ---------------------------------------------------------------------------

def _bloom_hash(j, key, n_bits: int):
    """Hash j of a key → bit index in [0, n_bits): the first 15 hex chars
    (60 bits — exact in a BIGINT) of md5("<j>:<key>") mod n_bits. md5 over
    xxhash64 deliberately: the identical bytes are computable in the Python
    twin (and DuckDB), so registers are bit-exact across engines. Same
    portability rule as :func:`logagg.mix.mix_uniform`."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(j.cast("string"), F.lit(":"), key).cast("binary")), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(n_bits))


def _bloom_mask(h):
    # shiftleft by a COLUMN amount — the pyspark wrapper only takes a
    # literal int, so call the SQL function directly
    return F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), h.bitwiseAND(F.lit(63)).cast("int")
    )


def bloom_build(
    df: DataFrame, key_col: str, *, n_bits: int = 1 << 20, n_hashes: int = 7
) -> DataFrame:
    """Distributed Bloom filter build (Bloom 1970): each key sets
    ``n_hashes`` bits in an ``n_bits``-wide bitmap, kept SPARSE as
    ``(word int, bits bigint)`` — word ``w`` holds bit indices
    ``[64w, 64w+64)``. One explode (×n_hashes, values stay in their input
    partition) and one partial+final ``bit_or`` hash agg over ≤ n_bits/64
    groups — shuffle volume is bounded by the bitmap size, independent of
    both corpus size and key cardinality, exactly like
    :func:`count_min_build`. No ``distinct`` on the keys: OR is
    idempotent, so duplicate keys cost nothing and save a shuffle.

    Registers are mergeable (:func:`bloom_merge` — cellwise OR), so
    per-day / per-increment filters compose without rebuilding; that is
    what makes the sketch a persistent crawl-frontier accelerator
    (:func:`logagg.frontier.filter_unseen_bloom`). No false negatives
    ever; false-positive rate ≈ :func:`bloom_fpr`.

    All-JVM: the hash is Catalyst md5/conv/pmod inside whole-stage
    codegen (see ``_bloom_hash`` for why md5, not xxhash64). Python twin:
    :func:`logagg.refsketch.bloom_build_py` (bit-identical, signed-64
    register convention)."""
    if n_bits < 64 or n_bits & (n_bits - 1):
        raise ValueError("n_bits must be a power of two >= 64")
    if n_hashes < 1:
        raise ValueError("n_hashes must be >= 1")
    key = F.col(key_col).cast("string")
    h = F.col("_h")
    return (
        df.select(key.alias("_key"))
        .filter(F.col("_key").isNotNull())
        .select(
            "_key",
            F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("_j"),
        )
        .select(_bloom_hash(F.col("_j"), F.col("_key"), n_bits).alias("_h"))
        .select(
            F.shiftright(h, 6).cast("int").alias("word"),
            _bloom_mask(h).alias("_mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def bloom_merge(*regs: DataFrame) -> DataFrame:
    """OR-merge sparse register tables built with the same (n_bits,
    n_hashes): union + one ``bit_or`` agg. bloom(A ∪ B) == merge(bloom(A),
    bloom(B)) exactly — the property that lets increments compose."""
    if not regs:
        raise ValueError("need at least one register table")
    out = regs[0]
    for r in regs[1:]:
        out = out.unionByName(r)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_collect(regs: DataFrame, *, n_bits: int) -> list[int]:
    """Sparse registers → the dense driver-side word list (length
    n_bits/64, signed-64 to match Spark longs). Bounded by construction:
    ≤ n_bits/64 rows, like the :func:`count_min_build` collect."""
    dense = [0] * (n_bits // 64)
    for r in regs.select("word", "bits").collect():
        dense[r["word"]] |= r["bits"]
    return dense


def bloom_probe(
    df: DataFrame,
    key_col: str,
    regs: list[int],
    *,
    n_bits: int,
    n_hashes: int,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Membership probe against driver-held dense registers: the bitmap
    rides as ONE array LITERAL in the plan (n_bits/64 longs — 1 MiB of
    plan payload at n_bits=2^26, shipped once per stage with the task
    binary), and the test is a Catalyst ``forall`` over the n_hashes bit
    positions — whole-stage codegen, no Python, no join, no shuffle,
    map-only above the scan. (A 1-row broadcast crossJoin carries the
    same bytes but trips an AQE attribute-binding bug when the probe
    feeds a downstream join — lambda capture across
    BroadcastNestedLoopJoin; the literal form has no join to rebind
    across.) ``out_col`` is false ⇒ the key was NEVER inserted (no false
    negatives); true ⇒ probably inserted (verify exactly if it matters —
    that asymmetry is the whole trick of
    :func:`logagg.frontier.filter_unseen_bloom`). Null keys probe
    false."""
    if len(regs) * 64 != n_bits:
        raise ValueError("regs length does not match n_bits")
    regs_lit = F.lit([int(v) for v in regs])
    key = F.col(key_col).cast("string")

    def _test(j):
        h = _bloom_hash(j, key, n_bits)
        word = F.shiftright(h, 6).cast("int") + F.lit(1)  # element_at is 1-based
        return (
            F.element_at(regs_lit, word).bitwiseAND(_bloom_mask(h)) != F.lit(0)
        )

    hit = F.forall(F.sequence(F.lit(0), F.lit(n_hashes - 1)), _test)
    return df.withColumn(out_col, F.coalesce(hit, F.lit(False)))


def bloom_fpr(n_bits: int, n_hashes: int, n_keys: int) -> float:
    """Expected false-positive rate after n_keys inserts:
    (1 - e^(-kn/m))^k. ~0.8% at the default m=2^20, k=7 with 10^5 keys."""
    import math

    if n_keys <= 0:
        return 0.0
    return (1.0 - math.exp(-n_hashes * n_keys / n_bits)) ** n_hashes


def bottomk_overlap(
    a: DataFrame, b: DataFrame, id_col: str, k: int, *, assume_unique: bool = False
) -> dict:
    """Set-overlap estimation between two corpora from their coordinated
    bottom-k samples (Cohen & Kaplan 2007) — "how much does crawl B
    re-cover crawl A" / "how big is the union" WITHOUT shuffling either
    corpus against the other: two TakeOrdered sample jobs + two counts,
    then k-row driver math.

    Because both sides sample by the SAME content-independent rank
    (md5(str(id)), id), bottom-k(A ∪ B) is computable from the two
    samples alone (mergeability), and for any id in that union sample,
    membership in A is decidable from A's sample alone — if x ∈ A ranks
    among the union's k smallest, it ranks among A's k smallest. So the
    fraction of the union sample present in BOTH samples is the standard
    bottom-k Jaccard estimator (±O(1/√k)); union and intersection sizes
    follow from the exact per-side counts by inclusion-exclusion.

    Returns ``{jaccard, union, intersection, n_a, n_b, k_used}``;
    ``k_used < k`` means the union was smaller than k and every estimate
    is EXACT. Twin: :func:`logagg.refsketch.bottomk_overlap_py`
    (identical driver math over identically-sampled ids).

    Duplicate ids within a side would bias the merge (a side's bottom-k
    ROWS may hold dup ids, so its distinct bottom-k is under-filled) —
    each side is ``distinct()``-ed first (one per-side dedup shuffle,
    still never a cross-side shuffle); pass ``assume_unique=True`` to
    skip it when the id column is known unique (the usual case for doc
    ids / canonical urls)."""
    import hashlib

    da, db = a.select(id_col), b.select(id_col)
    if not assume_unique:
        da, db = da.distinct(), db.distinct()
    sa = [r[id_col] for r in bottomk_sample(da, id_col, k).collect()]
    sb = [r[id_col] for r in bottomk_sample(db, id_col, k).collect()]
    n_a, n_b = da.count(), db.count()

    def rank(i):
        return (hashlib.md5(str(i).encode("utf-8")).hexdigest(), i)

    union_sample = sorted(set(sa) | set(sb), key=rank)[:k]
    k_used = len(union_sample)
    in_a, in_b = set(sa), set(sb)
    shared = sum(1 for i in union_sample if i in in_a and i in in_b)
    j = shared / k_used if k_used else 0.0
    union_est = (n_a + n_b) / (1.0 + j) if (n_a + n_b) else 0.0
    return {
        "jaccard": j,
        "union": union_est,
        "intersection": union_est * j,
        "n_a": n_a,
        "n_b": n_b,
        "k_used": k_used,
    }
