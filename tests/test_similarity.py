"""ANN operators: the two exact formulations must agree; LSH is a subset
with decent recall on its own buckets."""

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_hash_sample_content_independent_and_twin_equal(spark):
    """The query/training sample rule must depend only on the id column
    (re-embedding a corpus cannot change the sample), match the pure-Python
    twin exactly, and work for url-style string keys — the round-3 gap:
    id-range cuts (vec_id < n) assume dense integer ids."""
    from pyspark.sql import functions as F

    from logagg import refsketch, similarity

    emb = _emb(spark)
    base = similarity.hash_sample_ids(emb, "vec_id", 8)
    perturbed = emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x * 2 + 1)
    )
    assert similarity.hash_sample_ids(perturbed, "vec_id", 8) == base
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    assert refsketch.hash_sample_ids_py(ids, 8) == base
    urls = spark.createDataFrame(
        [(f"https://h{i % 7}.example.com/p/{i:08d}",) for i in range(500)],
        "url string",
    )
    got = similarity.hash_sample_ids(urls, "url", 8)
    assert got == refsketch.hash_sample_ids_py([r["url"] for r in urls.collect()], 8)


def test_bruteforce_formulations_agree(spark):
    from logagg import similarity

    a = {(r["qid"], r["rank"]): r["nid"] for r in similarity.ann_bruteforce(_emb(spark)).collect()}
    b = {(r["qid"], r["rank"]): r["nid"] for r in similarity.ann_bruteforce_numpy(_emb(spark)).collect()}
    assert a == b and len(a) == 8 * similarity.ANN_K


def test_lsh_returns_valid_ranked_neighbors(spark):
    from logagg import similarity

    rows = similarity.ann_lsh(_emb(spark)).collect()
    assert rows, "lsh produced no neighbors"
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    assert all(r["qid"] != r["nid"] for r in rows)


def test_ivf_recall_against_exact(spark):
    from logagg import similarity

    exact = {
        (r["qid"], r["nid"])
        for r in similarity.ann_bruteforce_numpy(_emb(spark)).collect()
    }
    ivf = {(r["qid"], r["nid"]) for r in similarity.ann_ivf(_emb(spark)).collect()}
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.5, recall  # nprobe=4/16 cells on random vectors
    # ranks must still be valid dense sequences per query
    by_q = {}
    for r in similarity.ann_ivf(_emb(spark)).collect():
        by_q.setdefault(r["qid"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


# ------------------------------------------------- semantic dedup (SemDeDup)


def test_semantic_dedup_crafted_matches_twin(spark):
    import numpy as np

    import pytest

    from logagg import refsketch, similarity

    rng = np.random.default_rng(7)
    base = {
        0: np.array([1.0, 0.0, 0.0, 0.0]),
        1: np.array([0.0, 1.0, 0.0, 0.0]),
        2: np.array([0.0, 0.0, 1.0, 0.0]),
    }
    vectors = {}
    vid = 0
    for b in base.values():
        for _ in range(6):  # six near-copies per direction
            vectors[vid] = (b + rng.normal(0, 0.01, 4)).tolist()
            vid += 1
        # one genuinely distinct member in the same cluster
        vectors[vid] = (b + rng.normal(0, 0.6, 4)).tolist()
        vid += 1
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vectors.items()],
        "vec_id long, embedding array<float>",
    )
    # float32 storage: the twin must see the SAME values the engine sees
    stored = {r["vec_id"]: list(r["embedding"]) for r in df.collect()}
    kw = dict(n_clusters=3, threshold=0.98, train_sample=50, iters=5)
    got = {
        r["vec_id"]: (r["cluster"], r["keep"], r["max_cos_kept"])
        for r in similarity.semantic_dedup(df, **kw).collect()
    }
    want = refsketch.semantic_dedup_py(stored, **kw)
    assert set(got) == set(want)
    for i, (wc, wk, wm) in want.items():
        gc, gk, gm = got[i]
        assert (gc, gk) == (wc, wk), i
        assert gm == pytest.approx(wm, abs=1e-9), i
    # each direction keeps ≥ 2 (one representative of the dup pile +
    # the distinct member) and drops most of the six near-copies
    kept = [i for i, (_, k, _) in got.items() if k]
    dropped = [i for i, (_, k, _) in got.items() if not k]
    assert len(dropped) >= 12 and len(kept) >= 6 - 3 + 3
    # determinism under repartitioning: identical keep set
    again = {
        r["vec_id"]: r["keep"]
        for r in similarity.semantic_dedup(df.repartition(7), **kw).collect()
    }
    assert again == {i: k for i, (_, k, _) in got.items()}


def test_semantic_dedup_corpus_kernel_consistency(spark):
    import numpy as np

    import pytest

    from logagg import refsketch, similarity

    from pyspark.sql import functions as F

    base = _emb(spark).select("vec_id", "embedding")
    # plant exact duplicates of five existing vectors under fresh ids —
    # the corpus itself is noisy enough that no natural pair clears the
    # threshold, and the drop path must be exercised corpus-scale too
    dupes = (
        base.orderBy("vec_id")
        .limit(5)
        .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    emb = base.unionByName(dupes)

    kw = dict(n_clusters=8, threshold=0.9, train_sample=256, iters=5)
    res = similarity.semantic_dedup(emb, **kw).collect()
    got = {r["vec_id"]: (r["cluster"], r["keep"], r["max_cos_kept"]) for r in res}
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    assert set(got) == set(vecs)
    # within every cluster, the keep flags are EXACTLY the greedy kernel's
    # output given the engine's own assignments (kernel single-sourcing)
    from collections import defaultdict

    by_cluster = defaultdict(list)
    for i, (c, _, _) in got.items():
        by_cluster[c].append(i)
    # reconstruct centroids the same way the engine did
    want_twin = refsketch.semantic_dedup_py(
        {i: list(v) for i, v in vecs.items()}, **kw
    )
    for i, w in want_twin.items():
        assert got[i][0] == w[0], i
        assert got[i][1] == w[1], i
    # the planted duplicates were deduped (one of each identical pair
    # dropped), and the corpus wasn't wiped out
    keeps = [k for _, k, _ in got.values()]
    assert sum(1 for k in keeps if not k) >= 5
    assert sum(keeps) >= len(vecs) - 10


# ------------------------------------------------- distributed k-means


def test_kmeans_fit_matches_twin(spark):
    import numpy as np

    from logagg import refsketch, similarity

    emb = _emb(spark)
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = [r["embedding"] for r in rows]
    got = similarity.kmeans_fit(emb, 8, iters=3)
    want = refsketch.kmeans_fit_py(ids, vecs, 8, iters=3)
    assert np.allclose(got, want, atol=1e-9)
    # assignments must agree EXACTLY (argmin over near-identical centroids)
    spark_assign = {
        r["vec_id"]: r["cluster"]
        for r in similarity.kmeans_assign(emb, got).collect()
    }
    twin_assign = dict(
        zip((str(i) for i in ids), refsketch.kmeans_assign_py(vecs, want))
    )
    assert spark_assign == twin_assign
    assert len(set(spark_assign.values())) > 1  # actually clusters


def test_kmeans_fit_partition_invariant(spark):
    import numpy as np

    from logagg import similarity

    emb = _emb(spark)
    a = similarity.kmeans_fit(emb.repartition(1), 5, iters=2)
    b = similarity.kmeans_fit(emb.repartition(13), 5, iters=2)
    assert np.allclose(a, b, atol=1e-9)


def test_kmeans_assign_tie_goes_to_lowest_index(spark):
    import numpy as np

    from logagg import similarity

    df = spark.createDataFrame(
        [("p", [0.0, 0.0])], "vec_id string, embedding array<double>"
    )
    cents = np.array([[1.0, 0.0], [-1.0, 0.0], [1.0, 0.0]])  # 0 and 2 tie with 1
    got = similarity.kmeans_assign(df, cents).collect()
    assert got[0]["cluster"] == 0


def test_kmeans_k_exceeds_corpus_raises(spark):
    import pytest

    from logagg import similarity

    emb = _emb(spark).limit(4)
    with pytest.raises(ValueError, match="exceeds"):
        similarity.kmeans_fit(emb, 10, iters=1)


def test_cluster_balanced_sample(spark):
    from logagg import refsketch, similarity

    emb = _emb(spark)
    out = similarity.cluster_balanced_sample(emb, 6, 3, iters=2).collect()
    per = {}
    for r in out:
        per.setdefault(r["cluster"], []).append(r["vec_id"])
    assert all(len(v) <= 3 for v in per.values())
    assert len(per) > 1
    # keeper rule: within a cluster, the hash-rank-smallest ids win
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = [r["embedding"] for r in rows]
    cents = refsketch.kmeans_fit_py(ids, vecs, 6, iters=2)
    assign = dict(zip((str(i) for i in ids), refsketch.kmeans_assign_py(vecs, cents)))
    by_cluster = {}
    for i in ids:
        by_cluster.setdefault(assign[str(i)], []).append(i)
    want = {
        c: set(str(x) for x in refsketch.hash_sample_ids_py(members, 3))
        for c, members in by_cluster.items()
    }
    got = {c: set(v) for c, v in per.items()}
    assert got == want


# ---------------------------------------------------------------------------
# PCA
# ---------------------------------------------------------------------------


def test_pca_fit_matches_twin(spark):
    """Distributed moment sums == the in-memory twin to float-sum-order
    tolerance; components agree as a SUBSPACE (projector comparison —
    robust to near-degenerate eigenvalue wobble) and obey the sign
    convention."""
    import numpy as np

    from logagg import refsketch, similarity

    emb = _emb(spark)
    k = 8
    model = similarity.pca_fit(emb, k)
    vecs = [r["embedding"] for r in emb.select("embedding").collect()]
    twin = refsketch.pca_fit_py(vecs, k)
    assert model["n"] == twin["n"] == len(vecs)
    np.testing.assert_allclose(model["mean"], twin["mean"], atol=1e-9)
    np.testing.assert_allclose(
        model["explained_variance"], twin["explained_variance"], rtol=1e-6
    )
    Ws, Wt = model["components"], twin["components"]
    np.testing.assert_allclose(Ws.T @ Ws, Wt.T @ Wt, atol=1e-6)  # same subspace
    # orthonormal rows + sign convention
    np.testing.assert_allclose(Ws @ Ws.T, np.eye(k), atol=1e-9)
    for c in Ws:
        assert c[np.argmax(np.abs(c))] > 0
    # eigenvalues descending
    assert all(a >= b for a, b in zip(model["explained_variance"], model["explained_variance"][1:]))


def test_pca_project_variance_and_whitening(spark):
    """Projected axes carry the eigenvalue variances; whitening flattens
    them to 1; the Spark projection equals the twin GEMM on the same
    model."""
    import numpy as np

    from logagg import refsketch, similarity

    emb = _emb(spark)
    k = 6
    model = similarity.pca_fit(emb, k)
    out = (
        similarity.pca_project(emb, model, out_col="pca")
        .select("vec_id", "pca")
        .collect()
    )
    ids = [r["vec_id"] for r in out]
    P = np.array([r["pca"] for r in out])
    rows = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    Pt = refsketch.pca_project_py([rows[i] for i in ids], model)
    np.testing.assert_allclose(P, Pt, atol=1e-9)
    np.testing.assert_allclose(P.var(axis=0), model["explained_variance"], rtol=1e-6)
    white = (
        similarity.pca_project(emb, model, out_col="pca", whiten=True)
        .select("pca")
        .collect()
    )
    W = np.array([r["pca"] for r in white])
    np.testing.assert_allclose(W.var(axis=0), np.ones(k), rtol=1e-3)


def test_pca_project_schema_and_plan(spark):
    """Projection preserves the input schema (no mutation of the source
    frame's cached StructType) and stays map-only — no Exchange."""
    from logagg import similarity

    emb = _emb(spark)
    before = [f.name for f in emb.schema.fields]
    model = similarity.pca_fit(emb, 4)
    out = similarity.pca_project(emb, model)
    assert [f.name for f in out.schema.fields] == before + ["pca"]
    assert [f.name for f in emb.schema.fields] == before  # source untouched
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    import pytest

    with pytest.raises(ValueError):
        similarity.pca_fit(emb, 0)
    with pytest.raises(ValueError):
        similarity.pca_fit(emb, 10_000)


def test_ann_pca_rerank_exact_at_full_rank_and_recall_reduced(spark):
    """dim_k = d with a candidate pool spanning the corpus is exactly
    ann_bruteforce (orthogonal projection of normalized vectors preserves
    the cosine ranking); at dim_k=16 the reduced-space filter still finds
    most true neighbors."""
    from logagg import similarity

    emb = _emb(spark)
    n = emb.count()
    dim = len(emb.select("embedding").first()["embedding"])
    exact = {
        (r["qid"], r["nid"], r["rank"])
        for r in similarity.ann_bruteforce(emb, 4, 5).collect()
    }
    full = {
        (r["qid"], r["nid"], r["rank"])
        for r in similarity.ann_pca_rerank(
            emb, 4, 5, dim_k=dim, candidates=n
        ).collect()
    }
    assert full == exact

    reduced = {
        (r["qid"], r["nid"])
        for r in similarity.ann_pca_rerank(
            emb, 4, 5, dim_k=16, candidates=64
        ).collect()
    }
    truth = {(q, nid) for q, nid, _ in exact}
    recall = len(reduced & truth) / len(truth)
    assert recall >= 0.8

    import pytest

    with pytest.raises(ValueError):
        similarity.ann_pca_rerank(emb, 4, 10, candidates=5)


def test_quantize_and_ann_int8_rerank(spark):
    """int8 codes round-trip within scale/2 per dim, are twin-exact, and
    the quantized ANN with a corpus-wide candidate pool reproduces
    ann_bruteforce exactly (full-precision re-rank makes quantization
    noise a recall question, never a correctness one)."""
    import numpy as np

    from logagg import refsketch, similarity

    emb = _emb(spark)
    model = similarity.quantize_fit(emb)
    assert (model["scale"] >= 0).all()
    quantized = similarity.quantize_embeddings(emb, model)
    rows = quantized.select("vec_id", "embedding", "qvec").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Q = np.array([np.frombuffer(r["qvec"], dtype=np.uint8) for r in rows])
    # twin-exact codes
    np.testing.assert_array_equal(
        Q, refsketch.quantize_py(X, model["mn"], model["scale"])
    )
    # dequantization error bounded by scale/2 per dim
    err = np.abs(Q * model["scale"] + model["mn"] - X)
    assert (err <= model["scale"] / 2 + 1e-12).all()
    # 4x memory cut: d bytes vs d doubles
    assert len(rows[0]["qvec"]) == X.shape[1]

    n = emb.count()
    exact = {
        (r["qid"], r["nid"], r["rank"])
        for r in similarity.ann_bruteforce(emb, 4, 5).collect()
    }
    full = {
        (r["qid"], r["nid"], r["rank"])
        for r in similarity.ann_int8_rerank(emb, 4, 5, candidates=n).collect()
    }
    assert full == exact

    small = {
        (r["qid"], r["nid"])
        for r in similarity.ann_int8_rerank(emb, 4, 5, candidates=32).collect()
    }
    truth = {(q, nid) for q, nid, _ in exact}
    assert len(small & truth) / len(truth) >= 0.8

    import pytest

    with pytest.raises(ValueError):
        similarity.ann_int8_rerank(emb, 4, 10, candidates=5)
    with pytest.raises(ValueError):
        similarity.quantize_fit(emb.filter("vec_id < 0"))
