"""ANN operators: the two exact formulations must agree; LSH is a subset
with decent recall on its own buckets."""

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


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
