"""Similarity search over an embedding column (array<float>).

* ``ann_bruteforce`` — exact top-k by cosine, pure Catalyst: broadcast the
  (small) query set, higher-order-function dot product in float64, window
  top-k. This is also the correctness oracle for approximate variants.
* ``ann_bruteforce_numpy`` — same semantics, Arrow-batched numpy matmul per
  partition (the kernel that wins at scale: one BLAS GEMM per batch against
  a broadcast query matrix, then a global top-k — no NxM row explosion).
* ``ann_lsh`` — random-hyperplane LSH bucketing, exact re-rank within
  buckets; recall < 1, bounded work per bucket.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ANN_K = 5
# few planes → coarse buckets with enough co-bucketed vectors to re-rank;
# recall/bucket-size trades off via this knob (multi-table probing is the
# production extension)
LSH_PLANES = 5


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def hash_sample_ids(df: DataFrame, id_col: str, n: int) -> list:
    """Deterministic, content-independent sample: the ``n`` ids with the
    smallest ``(md5(str(id)), id)`` rank.

    This replaces id-range cuts (``vec_id < n``), which silently assume
    dense integer ids — a url-keyed 100 TB corpus has none. The md5 rank is
    uniform over any id type, independent of the row's payload (so
    re-embedding a corpus never changes the sample), and expressible
    identically in every engine (Spark ``md5(cast(id as string))``, DuckDB
    ``md5(CAST(id AS VARCHAR))``, Python ``hashlib.md5(str(id))``; twin in
    logagg.refsketch.hash_sample_ids_py). orderBy+limit plans as
    TakeOrdered — O(n·log k) per partition plus a tiny driver merge, no
    full sort at scale."""
    rows = (
        df.select(F.col(id_col).alias("_id"))
        .withColumn("_hr", F.md5(F.col("_id").cast("string").cast("binary")))
        .orderBy("_hr", "_id")
        .limit(n)
        .collect()
    )
    return [r["_id"] for r in rows]


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def ann_bruteforce(embeddings: DataFrame, n_queries: int = 8, k: int = ANN_K) -> DataFrame:
    """Exact cosine top-k of every corpus vector for the ``n_queries``
    hash-sampled query ids. Output (qid, nid, rank) — rank 1..k by
    (sim desc, nid asc)."""
    base = embeddings.select(
        F.col("vec_id"), _as_double(F.col("embedding")).alias("emb")
    )
    qids = hash_sample_ids(embeddings, "vec_id", n_queries)
    queries = (
        base.filter(F.col("vec_id").isin(qids))
        .select(F.col("vec_id").alias("qid"), F.col("emb").alias("qemb"))
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            _cosine(F.col("qemb"), F.col("emb")).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank")
    )


def _numpy_topk(queries_np: np.ndarray, qids: np.ndarray, k: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qn = queries_np / np.linalg.norm(queries_np, axis=1, keepdims=True)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            ids = pdf["vec_id"].to_numpy()
            mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = qn @ mn.T  # (n_queries, batch)
            out_q, out_n, out_s = [], [], []
            top = min(k + 1, sims.shape[1])
            for qi in range(sims.shape[0]):
                # exact per-partition top-(k+1) under the (sim desc, nid asc)
                # order: argpartition alone keeps an arbitrary subset among
                # exactly-tied sims, which can drop the tie the global window
                # (and the oracle) would pick. Expand by every row tied with
                # the boundary sim, then lexsort and truncate.
                part = np.argpartition(-sims[qi], top - 1)[:top]
                boundary = sims[qi, part].min()
                cand = np.flatnonzero(sims[qi] >= boundary)
                order = np.lexsort((ids[cand], -sims[qi, cand]))
                for j in cand[order[:top]]:
                    if ids[j] == qids[qi]:
                        continue
                    out_q.append(qids[qi])
                    out_n.append(ids[j])
                    out_s.append(sims[qi, j])
            yield pd.DataFrame(
                {
                    "qid": pd.Series(out_q, dtype="int64"),
                    "nid": pd.Series(out_n, dtype="int64"),
                    "sim": pd.Series(out_s, dtype="float64"),
                }
            )

    return run


def ann_bruteforce_numpy(embeddings: DataFrame, n_queries: int = 8, k: int = ANN_K) -> DataFrame:
    """Same result as ann_bruteforce, computed as partition-local GEMM +
    per-partition top-k, then a global window top-k over the tiny residue."""
    qrows = (
        embeddings.filter(
            F.col("vec_id").isin(hash_sample_ids(embeddings, "vec_id", n_queries))
        )
        .select("vec_id", "embedding")
        .collect()
    )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qnp = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    local = embeddings.select("vec_id", "embedding").mapInPandas(
        _numpy_topk(qnp, qids, k), schema="qid long, nid long, sim double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank")
    )


IVF_CENTROIDS = 16
IVF_NPROBE = 4
IVF_TRAIN_SAMPLE = 4096


def _kmeans_lite(sample: np.ndarray, k: int, iters: int = 10, seed: int = 0xC3) -> np.ndarray:
    """Deterministic small k-means on the driver (Lloyd, seeded init) —
    builds the IVF coarse quantizer from a corpus sample."""
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ann_ivf(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = ANN_K,
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into ``n_centroids`` cells
    (k-means trained on a driver-side sample), probe the query's ``nprobe``
    nearest cells, exact cosine re-rank within them.

    Scale shape: assignment is one numpy GEMM per Arrow batch; the search
    touches ~nprobe/n_centroids of the corpus. Recall < 1 by construction
    (cell-boundary misses), measured in tests.
    """
    # deterministic training sample: the IVF_TRAIN_SAMPLE vectors whose ids
    # rank smallest under the content-independent (md5(str(id)), id) rule —
    # a uniform sample that works for url-keyed corpora too (an id-range
    # cut assumes dense ints). Row ORDER is part of the quantizer spec
    # (k-means seeding indexes into the sample), so the sample keeps its
    # hash-rank order; limit() without a sort would be partition-order-
    # dependent and make the whole result non-reproducible.
    sample_rows = (
        embeddings.withColumn(
            "_hr", F.md5(F.col("vec_id").cast("string").cast("binary"))
        )
        .orderBy("_hr", "vec_id")
        .limit(IVF_TRAIN_SAMPLE)
        .select("embedding")
        .collect()
    )
    sample = np.array([r["embedding"] for r in sample_rows], dtype=np.float64)
    cents = _kmeans_lite(sample, n_centroids)
    centsn = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            cell = (matn @ centsn.T).argmax(axis=1)
            out = pdf[["vec_id", "embedding"]].copy()
            out["cell"] = cell.astype("int32")
            yield out

    emb_field = embeddings.schema["embedding"].dataType.simpleString()
    cells = embeddings.select("vec_id", "embedding").mapInPandas(
        assign, schema=f"vec_id long, embedding {emb_field}, cell int"
    )

    qrows = (
        embeddings.filter(
            F.col("vec_id").isin(hash_sample_ids(embeddings, "vec_id", n_queries))
        )
        .select("vec_id", "embedding")
        .collect()
    )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qnp = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qn = qnp / np.linalg.norm(qnp, axis=1, keepdims=True)
    probe_cells = np.argsort(-(qn @ centsn.T), axis=1)[:, :nprobe]
    probes = [
        (int(qids[i]), [float(x) for x in qnp[i]], [int(c) for c in probe_cells[i]])
        for i in range(len(qids))
    ]
    probe_df = F.broadcast(
        embeddings.sparkSession.createDataFrame(
            probes, "qid long, qemb array<double>, cells array<int>"
        ).select("qid", "qemb", F.explode("cells").alias("cell"))
    )
    scored = (
        cells.join(probe_df, "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            _cosine(F.col("qemb"), _as_double(F.col("embedding"))).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank")
    )


def ann_lsh(embeddings: DataFrame, n_queries: int = 8, k: int = ANN_K) -> DataFrame:
    """Random-hyperplane LSH: bucket by sign pattern, exact re-rank within
    the query's bucket. Approximate (recall < 1), bucket-bounded work."""
    rng = np.random.default_rng(0xA11CE)
    first = embeddings.select("embedding").first()
    dim = len(first["embedding"])
    planes = rng.standard_normal((LSH_PLANES, dim))

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            bits = (mat @ planes.T) > 0
            codes = bits @ (1 << np.arange(LSH_PLANES))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "bucket": pd.Series(codes, dtype="int64"),
                    "embedding": pdf["embedding"],
                }
            )

    emb_field = embeddings.schema["embedding"].dataType.simpleString()
    bucketed = embeddings.select("vec_id", "embedding").mapInPandas(
        bucketize, schema=f"vec_id long, bucket long, embedding {emb_field}"
    )
    queries = bucketed.filter(
        F.col("vec_id").isin(hash_sample_ids(embeddings, "vec_id", n_queries))
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("bucket"),
        F.col("embedding").alias("qemb"),
    )
    scored = (
        bucketed.join(queries, "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            _cosine(_as_double(F.col("qemb")), _as_double(F.col("embedding"))).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank")
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup: cluster, then dedup within clusters)
# ---------------------------------------------------------------------------

def _semdedup_greedy(
    ids: list, mat: np.ndarray, cent: np.ndarray, threshold: float
) -> list[tuple[object, bool, float]]:
    """THE per-cluster dedup kernel, shared by the Spark group pass and
    the twin: L2-normalize the members, order by (cosine-to-centroid
    asc, id asc) — the SemDeDup keeper rule: the point FARTHEST from the
    centroid is the most informative representative of its duplicate
    neighborhood and is kept first — then greedily keep a point iff its
    max cosine to every already-kept point is ≤ ``threshold``. Returns
    ``[(id, keep, max_cos_kept)]`` (max_cos_kept = -1.0 for the first
    kept point of a cluster)."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    matn = mat / norms
    centn = cent / (np.linalg.norm(cent) or 1.0)
    cos_c = matn @ centn
    order = sorted(range(len(ids)), key=lambda i: (cos_c[i], ids[i]))
    kept_rows: list[int] = []
    out = []
    for i in order:
        if kept_rows:
            mc = float((matn[kept_rows] @ matn[i]).max())
        else:
            mc = -1.0
        keep = mc <= threshold
        if keep:
            kept_rows.append(i)
        out.append((ids[i], keep, mc))
    return out


def semantic_dedup(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 64,
    threshold: float = 0.97,
    train_sample: int = 2048,
    iters: int = 10,
    seed: int = 0xC3,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): embedding-level semantic
    dedup at corpus scale — coarse k-means clustering, then exact
    pairwise cosine ONLY within clusters → ``(id, cluster, keep,
    max_cos_kept)``. This is the scale path between exact
    ``embedding_dupes`` (O(n²), oracle-scale only) and LSH (recall<1 on
    a global criterion): the quadratic work drops to Σ|cluster|², and
    semantically-near duplicates land in the same cluster by
    construction.

    Determinism: the quantizer trains on the hash-ranked
    ``train_sample`` (content-independent id order, the IVF recipe),
    assignment is an argmax GEMM per Arrow batch, and the per-cluster
    greedy (:func:`_semdedup_greedy`) is totally ordered — same corpus
    in, same keep set out, any partitioning.

    Scale shape: driver trains on a bounded sample; one map-only GEMM
    pass assigns; one ``applyInPandas`` group pass per cluster runs the
    greedy (a cluster must fit a task — pick ``n_clusters`` ≈ corpus /
    desired cluster size, exactly the published recipe's knob)."""
    sample_rows = (
        embeddings.withColumn(
            "_hr", F.md5(F.col(id_col).cast("string").cast("binary"))
        )
        .orderBy("_hr", id_col)
        .limit(train_sample)
        .select(vec_col)
        .collect()
    )
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    sn = np.linalg.norm(sample, axis=1, keepdims=True)
    sn[sn == 0.0] = 1.0
    cents = _kmeans_lite(sample / sn, min(n_clusters, len(sample)), iters, seed)
    cn = np.linalg.norm(cents, axis=1, keepdims=True)
    cn[cn == 0.0] = 1.0
    centsn = cents / cn

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            nr = np.linalg.norm(mat, axis=1, keepdims=True)
            nr[nr == 0.0] = 1.0
            pdf = pdf[[id_col, vec_col]].copy()
            pdf["cluster"] = ((mat / nr) @ centsn.T).argmax(axis=1).astype("int32")
            yield pdf

    id_field = embeddings.schema[id_col].dataType.simpleString()
    emb_field = embeddings.schema[vec_col].dataType.simpleString()
    assigned = embeddings.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} {id_field}, {vec_col} {emb_field}, cluster int"
    )

    def dedup_group(pdf: pd.DataFrame) -> pd.DataFrame:
        c = int(pdf["cluster"].iloc[0])
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        rows = _semdedup_greedy(
            list(pdf[id_col]), mat, centsn[c], threshold
        )
        return pd.DataFrame(
            {
                id_col: [r[0] for r in rows],
                "cluster": c,
                "keep": [r[1] for r in rows],
                "max_cos_kept": [r[2] for r in rows],
            }
        )

    return assigned.groupBy("cluster").applyInPandas(
        dedup_group,
        schema=f"{id_col} {id_field}, cluster int, keep boolean, "
        "max_cos_kept double",
    )


def _kmeans_init(
    embeddings: DataFrame, k: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Deterministic seeds: the vectors of the k hash-rank-smallest ids,
    IN hash-rank order (order is part of the quantizer spec)."""
    ids = hash_sample_ids(embeddings, id_col, k)
    if len(ids) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(ids)}")
    rows = {
        r["_id"]: r["_v"]
        for r in embeddings.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
        )
        .filter(F.col(id_col).isin(ids))
        .collect()
    }
    return np.array([rows[i] for i in ids], dtype=np.float64)


def kmeans_fit(
    embeddings: DataFrame,
    k: int,
    *,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd's k-means over an embedding column.

    Per iteration: broadcast the (k × dim) centroid block, one map-only
    Arrow pass assigns every vector by GEMM and pre-aggregates PER-BATCH
    partial sums (cluster, dim, s) plus counts — the shuffle then carries
    at most k × (dim + 1) rows per batch (map-side combine), never one row
    per vector — and the driver assembles the bounded k × dim mean matrix.
    Empty clusters keep their previous centroid (standard Lloyd).

    Determinism: init is the content-independent hash-rank sample (exact);
    iteration means are float sums whose addition ORDER depends on
    partitioning, so centroids are reproducible to ~1e-9 (tests pin
    assignment equality exactly and centroids by tolerance — same contract
    as every distributed float mean). Promotes the driver-local
    ``_kmeans_lite`` (IVF/SemDeDup quantizer training on a sample) to the
    full corpus: this is the op a user runs when the quantizer must see
    every vector, e.g. clustering an embedded corpus for inspection or
    cluster-balanced sampling."""
    cents = _kmeans_init(embeddings, k, id_col, vec_col)
    src = embeddings.select(F.col(vec_col).alias("_v")).persist()
    try:
        dim = cents.shape[1]
        for _ in range(iters):
            bc = embeddings.sparkSession.sparkContext.broadcast(cents)

            def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                C = bc.value
                cn = (C * C).sum(axis=1)
                for pdf in batches:
                    if not len(pdf):
                        continue
                    X = np.array(list(pdf["_v"]), dtype=np.float64)
                    a = (cn[None, :] - 2.0 * (X @ C.T)).argmin(axis=1)
                    clusters, inv = np.unique(a, return_inverse=True)
                    sums = np.zeros((len(clusters), X.shape[1]))
                    np.add.at(sums, inv, X)
                    counts = np.bincount(inv, minlength=len(clusters))
                    out = {
                        "cluster": np.repeat(clusters, X.shape[1]),
                        "dim": np.tile(np.arange(X.shape[1]), len(clusters)),
                        "s": sums.ravel(),
                        "n": np.zeros(len(clusters) * X.shape[1], dtype=np.int64),
                    }
                    cnt_rows = {
                        "cluster": clusters,
                        "dim": np.full(len(clusters), -1),
                        "s": np.zeros(len(clusters)),
                        "n": counts,
                    }
                    yield pd.concat(
                        [pd.DataFrame(out), pd.DataFrame(cnt_rows)], ignore_index=True
                    )

            rows = (
                src.mapInPandas(_partials, "cluster int, dim int, s double, n long")
                .groupBy("cluster", "dim")
                .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
                .collect()  # bounded: <= k * (dim + 1) rows by construction
            )
            new = cents.copy()
            counts = np.zeros(k)
            sums = np.zeros((k, dim))
            for r in rows:
                if r["dim"] == -1:
                    counts[r["cluster"]] = r["n"]
                else:
                    sums[r["cluster"], r["dim"]] = r["s"]
            nonempty = counts > 0
            new[nonempty] = sums[nonempty] / counts[nonempty, None]
            bc.unpersist()
            cents = new
        return cents
    finally:
        src.unpersist()


def kmeans_assign(
    embeddings: DataFrame,
    cents: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (squared-Euclidean,
    ties to the lowest cluster index — np.argmin semantics, same as the
    twin): broadcast + one map-only Arrow GEMM pass, zero shuffles.
    Returns (id_col, cluster)."""
    bc = embeddings.sparkSession.sparkContext.broadcast(
        np.asarray(cents, dtype=np.float64)
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        cn = (C * C).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["_v"]), dtype=np.float64)
            a = (cn[None, :] - 2.0 * (X @ C.T)).argmin(axis=1)
            yield pd.DataFrame({"id": pdf["_id"].astype(str), "cluster": a.astype("int32")})

    return embeddings.select(
        F.col(id_col).cast("string").alias("_id"), F.col(vec_col).alias("_v")
    ).mapInPandas(_batches, "id string, cluster int").withColumnRenamed("id", id_col)


def cluster_balanced_sample(
    embeddings: DataFrame,
    k_clusters: int,
    per_cluster: int,
    *,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversity-preserving corpus downsampling: cluster the embedding
    space with :func:`kmeans_fit`, then keep at most ``per_cluster`` docs
    from each cluster, chosen by the content-independent (md5(id), id)
    rank — the cluster-balanced sampling step of embedding-curation
    pipelines (cf. SemDeDup's cluster framing; uniform sampling
    oversamples the head of the density, cluster caps flatten it).

    Returns (id_col, cluster). Scale shape: k-means as documented on
    :func:`kmeans_fit`; the cap is one row_number window PARTITIONED BY
    cluster — k partitions, each bounded by the cluster population, never
    a corpus-wide or single-partition sort."""
    cents = kmeans_fit(
        embeddings, k_clusters, iters=iters, id_col=id_col, vec_col=vec_col
    )
    assigned = kmeans_assign(embeddings, cents, id_col=id_col, vec_col=vec_col)
    w = Window.partitionBy("cluster").orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)
    )
    return (
        assigned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_cluster)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# PCA — dimensionality reduction / whitening for embedding columns
# ---------------------------------------------------------------------------

def pca_fit(
    embeddings: DataFrame,
    k: int,
    *,
    vec_col: str = "embedding",
) -> dict:
    """Distributed PCA fit over an embedding column — the dimensionality
    reduction a 100 TB embedding pipeline runs before ANN indexing or
    clustering (smaller vectors → cheaper GEMMs, and whitening equalizes
    per-axis variance so cosine/L2 neighborhoods stop being dominated by
    a few high-variance directions).

    ONE map-only Arrow pass emits per-batch moment partials — the d×d
    second-moment block X^T X, the column-sum vector, and the row count,
    flattened to ``(i, j, s)`` rows — and one partial+final sum agg
    merges them: the shuffle carries ≤ d² + d + 1 rows per batch
    (map-side combined), independent of corpus size, the same
    bounded-register shape as :func:`logagg.aggregate.count_min_build`
    and :func:`kmeans_fit`. The driver assembles the covariance
    cov = E[xxᵀ] − μμᵀ (population form) and eigendecomposes it —
    a d×d ``eigh``, trivial at embedding dims.

    Determinism: the moment sums are float adds whose order depends on
    partitioning, so the covariance (hence components) is reproducible
    to ~1e-9 — the repo's distributed-float-mean contract, pinned by
    tolerance against :func:`logagg.refsketch.pca_fit_py`. Component
    SIGN is fixed by convention (largest-|loading| coordinate made
    positive) so two fits of the same data can be compared directly.

    Returns ``{"mean": (d,), "components": (k, d) rows = top
    eigenvectors by descending eigenvalue, "explained_variance": (k,),
    "n": rows}``."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        S = None
        m = None
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["_v"]), dtype=np.float64)
            if S is None:
                d = X.shape[1]
                S = np.zeros((d, d))
                m = np.zeros(d)
            S += X.T @ X
            m += X.sum(axis=0)
            n += len(X)
        if S is None:
            return
        d = S.shape[0]
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        yield pd.DataFrame(
            {
                "i": np.concatenate([ii.ravel(), np.arange(d), [-1]]),
                "j": np.concatenate([jj.ravel(), np.full(d, -1), [-1]]),
                "s": np.concatenate([S.ravel(), m, [float(n)]]),
            }
        )

    rows = (
        embeddings.select(F.col(vec_col).alias("_v"))
        .mapInPandas(_partials, "i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()  # bounded: <= d*d + d + 1 rows by construction
    )
    d = max(r["i"] for r in rows) + 1
    S = np.zeros((d, d))
    m = np.zeros(d)
    n = 0.0
    for r in rows:
        if r["i"] == -1:
            n = r["s"]
        elif r["j"] == -1:
            m[r["i"]] = r["s"]
        else:
            S[r["i"], r["j"]] = r["s"]
    if n == 0:
        raise ValueError("cannot fit PCA on an empty frame")
    if k > d:
        raise ValueError(f"k={k} exceeds embedding dim {d}")
    mean = m / n
    cov = S / n - np.outer(mean, mean)
    return _pca_from_cov(mean, cov, k, int(n))


def _pca_from_cov(mean: np.ndarray, cov: np.ndarray, k: int, n: int) -> dict:
    """Shared eigendecomposition + sign convention (kernel for the Spark
    fit AND the Python twin — the distributed part is only the moment
    sums, so everything after them is single-sourced)."""
    vals, vecs = np.linalg.eigh(cov)  # ascending
    comps = vecs[:, ::-1][:, :k].T.copy()  # (k, d), descending eigenvalue
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": vals[::-1][:k].copy(),
        "n": n,
    }


def pca_project(
    embeddings: DataFrame,
    model: dict,
    *,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project an embedding column onto a fitted PCA basis: one broadcast
    of the (k × d) component block and one map-only Arrow GEMM pass —
    zero shuffle, schema preserved plus ``out_col array<double>``. With
    ``whiten=True`` each output axis is scaled to unit variance
    (1/√(λ+eps)) — the isotropic space where plain L2/cosine ANN
    behaves. The input schema is carried through the kernel (no
    join-back), same pattern as :func:`logagg.dsir.with_importance`."""
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)
    scale = (
        1.0 / np.sqrt(np.asarray(model["explained_variance"]) + eps)
        if whiten
        else None
    )
    bc = embeddings.sparkSession.sparkContext.broadcast((mean, comps, scale))
    # build a NEW StructType — .add() would mutate the input's cached schema
    schema = StructType(
        list(embeddings.schema.fields)
        + [StructField(out_col, ArrayType(DoubleType()))]
    )
    cols = [f.name for f in embeddings.schema.fields]

    def _proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mu, W, sc = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            P = (X - mu) @ W.T
            if sc is not None:
                P = P * sc
            out = pdf[cols].copy()
            out[out_col] = list(P)
            yield out

    return embeddings.mapInPandas(_proj, schema)


def ann_pca_rerank(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = ANN_K,
    *,
    dim_k: int = 16,
    candidates: int = 64,
) -> DataFrame:
    """Coarse-to-fine ANN through the PCA bottleneck: L2-normalize,
    project every vector to ``dim_k`` principal dimensions
    (:func:`pca_fit` / one GEMM pass), pick ``candidates`` nearest
    neighbors per query by L2 in the REDUCED space (partition-local GEMM
    top-c + a tiny global window over n_queries × c rows), then re-rank
    ONLY those candidates by exact full-space cosine. Same output
    contract as :func:`ann_bruteforce` — (qid, nid, rank), rank 1..k by
    (sim desc, nid asc).

    Why this shape at 100 TB: the expensive scan runs GEMMs at d=dim_k
    instead of d (a 4× dim cut ≈ 4× less candidate-gen FLOPs and
    memory traffic), and the exact re-rank touches n_queries ×
    candidates rows, not the corpus. On NORMALIZED vectors cosine order
    == L2 order, and an orthogonal projection only shrinks L2
    distances, so the reduced space ranks by a contraction of the true
    metric: at dim_k = d it IS the true ranking (identity pinned by
    test against :func:`ann_bruteforce`), and recall degrades
    gracefully as dim_k drops (the variance the dropped axes carried
    bounds the distortion — `explained_variance` tells you before you
    search)."""
    if candidates < k:
        raise ValueError("candidates must be >= k")
    v = _as_double(F.col("embedding"))
    norm = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    normed = embeddings.select(
        "vec_id", F.transform(v, lambda x: x / norm).alias("embedding")
    )
    model = pca_fit(normed, dim_k)
    reduced = pca_project(normed, model, out_col="red")

    qids_l = hash_sample_ids(embeddings, "vec_id", n_queries)
    qrows = reduced.filter(F.col("vec_id").isin(qids_l)).collect()
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qred = np.array([r["red"] for r in qrows], dtype=np.float64)

    def _cand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qn2 = (qred * qred).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["red"]), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            d2 = qn2[:, None] - 2.0 * (qred @ X.T) + (X * X).sum(axis=1)[None, :]
            top = min(candidates + 1, d2.shape[1])
            out_q, out_n, out_d = [], [], []
            for qi in range(d2.shape[0]):
                part = np.argpartition(d2[qi], top - 1)[:top]
                boundary = d2[qi, part].max()
                cand = np.flatnonzero(d2[qi] <= boundary)
                order = np.lexsort((ids[cand], d2[qi, cand]))
                for j in cand[order[:top]]:
                    if ids[j] == qids[qi]:
                        continue
                    out_q.append(qids[qi])
                    out_n.append(ids[j])
                    out_d.append(d2[qi, j])
            yield pd.DataFrame(
                {
                    "qid": pd.Series(out_q, dtype="int64"),
                    "nid": pd.Series(out_n, dtype="int64"),
                    "d2": pd.Series(out_d, dtype="float64"),
                }
            )

    wq = Window.partitionBy("qid").orderBy(F.col("d2"), F.col("nid"))
    cand = (
        reduced.select("vec_id", "red")
        .mapInPandas(_cand, "qid long, nid long, d2 double")
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= candidates)
        .select("qid", "nid")
    )
    queries = normed.filter(F.col("vec_id").isin(qids_l)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb")
    )
    rescored = (
        normed.join(F.broadcast(cand), normed["vec_id"] == cand["nid"])
        .join(F.broadcast(queries), "qid")
        .select(
            "qid",
            "nid",
            _cosine(F.col("qemb"), F.col("embedding")).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank")
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization — 4x smaller vectors for the candidate scan
# ---------------------------------------------------------------------------

def quantize_fit(embeddings: DataFrame, *, vec_col: str = "embedding") -> dict:
    """Per-dimension scalar-quantization bounds for an embedding column:
    one map-only Arrow pass emits each batch's per-dim min/max vectors as
    ``(dim, mn, mx)`` rows, and a bounded min/max agg merges them —
    shuffle ≤ d rows per batch, the same corpus-size-independent register
    shape as :func:`pca_fit`. Returns ``{"mn": (d,), "scale": (d,)}``
    with scale = (max−min)/255 (zero-width dims get scale 0 and always
    decode to their constant). Twin-free by construction: min/max are
    exact, order-independent reductions."""

    def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mn = mx = None
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["_v"]), dtype=np.float64)
            bmn, bmx = X.min(axis=0), X.max(axis=0)
            mn = bmn if mn is None else np.minimum(mn, bmn)
            mx = bmx if mx is None else np.maximum(mx, bmx)
        if mn is None:
            return
        yield pd.DataFrame(
            {"dim": np.arange(len(mn)), "mn": mn, "mx": mx}
        )

    rows = (
        embeddings.select(F.col(vec_col).alias("_v"))
        .mapInPandas(_partials, "dim int, mn double, mx double")
        .groupBy("dim")
        .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"))
        .collect()  # bounded: d rows
    )
    if not rows:
        raise ValueError("cannot fit quantization on an empty frame")
    d = max(r["dim"] for r in rows) + 1
    mn = np.zeros(d)
    mx = np.zeros(d)
    for r in rows:
        mn[r["dim"]], mx[r["dim"]] = r["mn"], r["mx"]
    return {"mn": mn, "scale": (mx - mn) / 255.0}


def quantize_embeddings(
    embeddings: DataFrame,
    model: dict,
    *,
    vec_col: str = "embedding",
    out_col: str = "qvec",
) -> DataFrame:
    """Quantize each vector to d bytes (uint8 codes packed into a BINARY
    column — 4–8× smaller than the float array, which is the point: the
    ANN candidate scan's memory traffic and cache shrink by the same
    factor). code = round((x − mn)/scale), clamped to [0, 255]; decode is
    code·scale + mn (max error scale/2 per dim). One zero-shuffle Arrow
    pass, input schema carried through. Twin:
    :func:`logagg.refsketch.quantize_py` (bit-identical codes — numpy
    round-half-to-even on both sides)."""
    from pyspark.sql.types import BinaryType, StructField, StructType

    from logagg.refsketch import quantize_py

    mn = np.asarray(model["mn"], dtype=np.float64)
    scale = np.asarray(model["scale"], dtype=np.float64)
    bc = embeddings.sparkSession.sparkContext.broadcast((mn, scale))
    schema = StructType(
        list(embeddings.schema.fields) + [StructField(out_col, BinaryType())]
    )
    cols = [f.name for f in embeddings.schema.fields]

    def _quant(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m, s = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            Q = quantize_py(X, m, s)
            out = pdf[cols].copy()
            out[out_col] = [q.tobytes() for q in Q]
            yield out

    return embeddings.mapInPandas(_quant, schema)


def ann_int8_rerank(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = ANN_K,
    *,
    candidates: int = 64,
) -> DataFrame:
    """Coarse-to-fine ANN over int8-quantized vectors: normalize, fit
    per-dim bounds, quantize the corpus to d-byte codes, pick each
    query's ``candidates`` nearest by L2 over the DEQUANTIZED codes
    (partition-local GEMM on the 4×-smaller representation + a tiny
    global window), then exact full-precision cosine re-rank of only
    those candidates. Same output contract as :func:`ann_bruteforce` —
    (qid, nid, rank) by (sim desc, nid asc).

    The quantizer is a uniform grid, so dequantized distances are within
    d·(scale/2)² of the true ones — with a corpus-wide candidate pool
    the re-rank makes the result EXACTLY :func:`ann_bruteforce` (pinned
    by test), and recall at small pools degrades with quantization
    noise, not corpus size."""
    if candidates < k:
        raise ValueError("candidates must be >= k")
    v = _as_double(F.col("embedding"))
    norm = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    normed = embeddings.select(
        "vec_id", F.transform(v, lambda x: x / norm).alias("embedding")
    )
    model = quantize_fit(normed)
    quantized = quantize_embeddings(normed, model)
    mn = np.asarray(model["mn"])
    scale = np.asarray(model["scale"])

    qids_l = hash_sample_ids(embeddings, "vec_id", n_queries)
    qrows = normed.filter(F.col("vec_id").isin(qids_l)).collect()
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qvec = np.array([r["embedding"] for r in qrows], dtype=np.float64)

    def _cand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qn2 = (qvec * qvec).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.frombuffer(
                b"".join(pdf["qvec"]), dtype=np.uint8
            ).reshape(len(pdf), -1)
            X = codes * scale + mn  # dequantize per batch
            ids = pdf["vec_id"].to_numpy()
            d2 = qn2[:, None] - 2.0 * (qvec @ X.T) + (X * X).sum(axis=1)[None, :]
            top = min(candidates + 1, d2.shape[1])
            out_q, out_n, out_d = [], [], []
            for qi in range(d2.shape[0]):
                part = np.argpartition(d2[qi], top - 1)[:top]
                boundary = d2[qi, part].max()
                cand = np.flatnonzero(d2[qi] <= boundary)
                order = np.lexsort((ids[cand], d2[qi, cand]))
                for j in cand[order[:top]]:
                    if ids[j] == qids[qi]:
                        continue
                    out_q.append(qids[qi])
                    out_n.append(ids[j])
                    out_d.append(d2[qi, j])
            yield pd.DataFrame(
                {
                    "qid": pd.Series(out_q, dtype="int64"),
                    "nid": pd.Series(out_n, dtype="int64"),
                    "d2": pd.Series(out_d, dtype="float64"),
                }
            )

    wq = Window.partitionBy("qid").orderBy(F.col("d2"), F.col("nid"))
    cand = (
        quantized.select("vec_id", "qvec")
        .mapInPandas(_cand, "qid long, nid long, d2 double")
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= candidates)
        .select("qid", "nid")
    )
    queries = normed.filter(F.col("vec_id").isin(qids_l)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb")
    )
    rescored = (
        normed.join(F.broadcast(cand), normed["vec_id"] == cand["nid"])
        .join(F.broadcast(queries), "qid")
        .select(
            "qid",
            "nid",
            _cosine(F.col("qemb"), F.col("embedding")).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank")
    )
