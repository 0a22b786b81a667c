"""Pure-Python twins of the probabilistic / sketch operators — independent
reimplementations used ONLY to materialize expected tables for the DuckDB
differential oracle (logagg.synth), mirroring how logagg.refparse oracles
the parse stage.

Everything here is deterministic: seeds, permutation parameters, banding
layouts and sampling rules are part of each operator's SPEC (shared via
logagg.schemas), while the computation is written independently of the
Spark operators (no DataFrames, no Arrow batching).

Float-sensitive twins (ANN) reproduce Catalyst's evaluation order exactly:
cosine similarity is a sequential left-to-right fold in float64, which is
bit-identical to `F.aggregate(F.zip_with(...))` on the same inputs.
"""

from __future__ import annotations

import hashlib
import math
import zlib
from collections import defaultdict

import numpy as np

from logagg import textfns
from logagg.schemas import (
    JACCARD_DEN,
    JACCARD_NUM,
    MINHASH_LSH_BANDS,
    MINHASH_LSH_ROWS,
    MINHASH_MERSENNE,
    MINHASH_PERMS,
    MINHASH_SEED,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    SIMHASH_MAX_HAMMING,
    STOP_SAMPLE_MOD,
    df_max_for,
)

# ------------------------------------------------------------- SimHash


def simhash64(text: str) -> int | None:
    """64-bit SimHash (token-set sign-vote) — plain-int reimplementation of
    the Arrow kernel in logagg.dedup._simhash_batches."""
    toks = textfns.tokens(text) if isinstance(text, str) else []
    if not toks:
        return None
    votes = [0] * SIMHASH_BITS
    for t in set(toks):
        h = zlib.crc32(t.encode()) | (zlib.crc32(t[::-1].encode()) << 32)
        for b in range(SIMHASH_BITS):
            votes[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(SIMHASH_BITS):
        if votes[b] > 0:
            out |= 1 << b
    # Spark stores the uint64 as int64 (two's complement)
    return out - (1 << 64) if out >= (1 << 63) else out


def expected_simhash_pairs(urls: list[str], texts: list[str]) -> dict[str, list]:
    """All pairs with Hamming(simhash) <= 3, found via the same 4×16-bit
    pigeonhole banding the Spark operator uses (exact, not probabilistic)."""
    sims: dict[int, int] = {}
    for i, t in enumerate(texts):
        s = simhash64(t)
        if s is not None:
            sims[i] = s
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i, s in sims.items():
        u = s & ((1 << 64) - 1)
        for band in range(SIMHASH_BANDS):
            buckets[(band, (u >> (16 * band)) & 0xFFFF)].append(i)
    seen: set[tuple[str, str]] = set()
    rows: dict[str, list] = {"url_a": [], "url_b": [], "hamming": []}
    for ids in buckets.values():
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                i, j = ids[ai], ids[bi]
                ua, ub = (urls[i], urls[j]) if urls[i] < urls[j] else (urls[j], urls[i])
                if ua == ub or (ua, ub) in seen:
                    continue
                d = bin((sims[i] ^ sims[j]) & ((1 << 64) - 1)).count("1")
                if d <= SIMHASH_MAX_HAMMING:
                    seen.add((ua, ub))
                    rows["url_a"].append(ua)
                    rows["url_b"].append(ub)
                    rows["hamming"].append(d)
    return rows


# --------------------------------------------------------- MinHash-LSH


def _perms() -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(MINHASH_SEED)
    a = rng.integers(1, 1 << 30, size=MINHASH_PERMS, dtype=np.int64)
    b = rng.integers(0, 1 << 30, size=MINHASH_PERMS, dtype=np.int64)
    return a, b


def sampled_stop_set(urls: list[str], texts: list[str]) -> frozenset:
    """The deterministic 1-in-STOP_SAMPLE_MOD sample stop-set rule
    (crc32(url) keyed), identical to dedup.sampled_stop_shingles."""
    df_max = df_max_for(len(urls))
    counts: dict[str, int] = defaultdict(int)
    for u, t in zip(urls, texts):
        if zlib.crc32(u.encode()) % STOP_SAMPLE_MOD != 0:
            continue
        s = textfns.shingle_set(t) if isinstance(t, str) else set()
        s.discard("")
        for sh in s:
            counts[sh] += 1
    return frozenset(sh for sh, c in counts.items() if c * STOP_SAMPLE_MOD > df_max)


def expected_minhash_pairs(urls: list[str], texts: list[str]) -> dict[str, list]:
    """LSH candidates (64 perms, 16×4 bands) + exact Jaccard verification —
    the expected output of dedup.minhash_lsh_dupes."""
    stop = sampled_stop_set(urls, texts)
    a, b = _perms()
    eff: list[set] = []
    buckets: dict[tuple[int, tuple], list[int]] = defaultdict(list)
    for i, t in enumerate(texts):
        s = textfns.shingle_set(t) if isinstance(t, str) else set()
        s.discard("")
        s -= stop
        eff.append(s)
        if not s:
            continue
        x = np.fromiter((zlib.crc32(sh.encode("utf-8")) for sh in s), dtype=np.int64, count=len(s))
        sig = ((a[:, None] * x[None, :] + b[:, None]) % MINHASH_MERSENNE).min(axis=1)
        for band in range(MINHASH_LSH_BANDS):
            key = tuple(int(v) for v in sig[band * MINHASH_LSH_ROWS : (band + 1) * MINHASH_LSH_ROWS])
            buckets[(band, key)].append(i)
    cands: set[tuple[int, int]] = set()
    for ids in buckets.values():
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                i, j = ids[ai], ids[bi]
                if urls[i] > urls[j]:
                    i, j = j, i
                if urls[i] < urls[j]:
                    cands.add((i, j))
    rows: dict[str, list] = {"url_a": [], "url_b": [], "shared": [], "na": [], "nb": []}
    for i, j in cands:
        shared = len(eff[i] & eff[j])
        na, nb = len(eff[i]), len(eff[j])
        if JACCARD_NUM * shared >= JACCARD_DEN * (na + nb):
            rows["url_a"].append(urls[i])
            rows["url_b"].append(urls[j])
            rows["shared"].append(shared)
            rows["na"].append(na)
            rows["nb"].append(nb)
    return rows


def connected_components(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find over dup pairs → {url: cluster root (min url in the
    component)} — the twin of dedup.dup_clusters' label propagation."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {u: find(u) for u in parent}


# ------------------------------------------------------------ ANN twins


def hash_sample_ids_py(ids: list, n: int) -> list:
    """Twin of similarity.hash_sample_ids: the n ids with the smallest
    (md5(str(id)), id) rank — content-independent, id-type-agnostic.
    md5 hex compares identically as a lowercase ASCII string in Spark,
    DuckDB, and Python."""
    return sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:n]


def _cos_catalyst(a: list[float], b: list[float]) -> float:
    """Cosine exactly as Catalyst evaluates logagg.similarity._cosine:
    three sequential left-to-right float64 folds, then dot/(sqrt·sqrt)."""
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    na = 0.0
    for x in a:
        na = na + x * x
    nb = 0.0
    for y in b:
        nb = nb + y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _topk(scored: list[tuple[float, int]], k: int) -> list[tuple[int, int]]:
    """(sim desc, nid asc) row_number top-k → [(nid, rank)]."""
    scored.sort(key=lambda p: (-p[0], p[1]))
    return [(nid, r + 1) for r, (_, nid) in enumerate(scored[:k])]


def expected_ann_lsh(
    vec_ids: list[int], emb32: np.ndarray, n_queries: int = 8, k: int = 5, planes_seed: int = 0xA11CE, n_planes: int = 5
) -> dict[str, list]:
    """Expected output of similarity.ann_lsh: hyperplane bucketing (numpy,
    same ops as the Arrow kernel) + exact re-rank within the query bucket
    (Catalyst-order cosine)."""
    rng = np.random.default_rng(planes_seed)
    planes = rng.standard_normal((n_planes, emb32.shape[1]))
    mat = emb32.astype(np.float64)
    bits = (mat @ planes.T) > 0
    codes = (bits @ (1 << np.arange(n_planes))).astype(np.int64)
    ids = np.asarray(vec_ids, dtype=np.int64)
    q_set = set(hash_sample_ids_py([int(i) for i in ids], n_queries))
    rows: dict[str, list] = {"qid": [], "nid": [], "rank": []}
    emb_lists = [[float(x) for x in mat[i]] for i in range(len(ids))]
    for qi in np.flatnonzero([int(i) in q_set for i in ids]):
        scored = []
        for ci in np.flatnonzero(codes == codes[qi]):
            if ids[ci] == ids[qi]:
                continue
            scored.append((_cos_catalyst(emb_lists[qi], emb_lists[ci]), int(ids[ci])))
        for nid, rank in _topk(scored, k):
            rows["qid"].append(int(ids[qi]))
            rows["nid"].append(nid)
            rows["rank"].append(rank)
    return rows


def expected_ann_ivf(
    vec_ids: list[int],
    emb32: np.ndarray,
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> dict[str, list]:
    """Expected output of similarity.ann_ivf. The coarse quantizer (k-means
    centroids) is a MODEL PARAMETER shared with the operator — both train
    via similarity._kmeans_lite on the deterministic hash-rank sample
    (smallest IVF_TRAIN_SAMPLE ids under (md5(str(id)), id), in rank
    order — sample ORDER is part of the spec: k-means seeding indexes into
    it) — while assignment, probing and re-ranking are recomputed here
    independently (same numpy expressions ⇒ same floats on one machine)."""
    from logagg.similarity import IVF_TRAIN_SAMPLE, _kmeans_lite

    ids = np.asarray(vec_ids, dtype=np.int64)
    mat = emb32.astype(np.float64)
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    sample_ids = hash_sample_ids_py([int(i) for i in ids], IVF_TRAIN_SAMPLE)
    sample = mat[[id_to_row[i] for i in sample_ids]]
    cents = _kmeans_lite(sample, n_centroids)
    centsn = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cell = (matn @ centsn.T).argmax(axis=1)

    q_set = set(hash_sample_ids_py([int(i) for i in ids], n_queries))
    q_mask = np.array([int(i) in q_set for i in ids])
    qn = matn[q_mask]
    q_ids = ids[q_mask]
    probe = np.argsort(-(qn @ centsn.T), axis=1)[:, :nprobe]
    emb_lists = [[float(x) for x in mat[i]] for i in range(len(ids))]
    q_rows = np.flatnonzero(q_mask)
    rows: dict[str, list] = {"qid": [], "nid": [], "rank": []}
    for qi in range(len(q_ids)):
        cells = set(int(c) for c in probe[qi])
        q_emb = emb_lists[q_rows[qi]]
        scored = []
        for ci in range(len(ids)):
            if int(cell[ci]) not in cells or ids[ci] == q_ids[qi]:
                continue
            scored.append((_cos_catalyst(q_emb, emb_lists[ci]), int(ids[ci])))
        for nid, rank in _topk(scored, k):
            rows["qid"].append(int(q_ids[qi]))
            rows["nid"].append(nid)
            rows["rank"].append(rank)
    return rows


# ------------------------------------------------------------ media stub


def expected_media(urls: list[str], htmls: list[bytes]) -> dict[str, list]:
    """Expected output of multimodal.decode_media (deterministic stub
    kernel: blake2b-derived pseudo-features + magic-byte sniffing)."""
    rows: dict[str, list] = {
        k: []
        for k in ("url", "media_kind", "byte_len", "magic", "width", "height", "feature0", "feature1")
    }
    for url, payload in zip(urls, htmls):
        b = bytes(payload) if payload is not None else b""
        if b[:15] == b"<!DOCTYPE html>" or b[:5] == b"<html":
            kind = "html"
        elif b[:8] == b"\x89PNG\r\n\x1a\n":
            kind = "png"
        elif b[:3] == b"\xff\xd8\xff":
            kind = "jpeg"
        elif b[:4] == b"RIFF":
            kind = "riff"
        else:
            kind = "unknown"
        d = hashlib.blake2b(b, digest_size=16).digest()
        rows["url"].append(url)
        rows["media_kind"].append(kind)
        rows["byte_len"].append(len(b))
        rows["magic"].append(b[:6].hex())
        rows["width"].append(64 + d[0] % 192)
        rows["height"].append(64 + d[1] % 192)
        rows["feature0"].append(int.from_bytes(d[2:6], "big") / 2**32)
        rows["feature1"].append(int.from_bytes(d[6:10], "big") / 2**32)
    return rows


def semantic_dedup_py(
    vectors: dict,
    *,
    n_clusters: int = 64,
    threshold: float = 0.97,
    train_sample: int = 2048,
    iters: int = 10,
    seed: int = 0xC3,
) -> dict:
    """Twin of ``similarity.semantic_dedup`` over ``{id: vector}`` —
    same hash-ranked quantizer sample, same ``_kmeans_lite`` (shared
    code, not re-implemented), same argmax assignment, same greedy
    kernel. Returns ``{id: (cluster, keep, max_cos_kept)}``."""
    from logagg.similarity import _kmeans_lite, _semdedup_greedy

    ids = list(vectors)
    sample_ids = hash_sample_ids_py(ids, train_sample)
    sample = np.array([vectors[i] for i in sample_ids], dtype=np.float64)
    sn = np.linalg.norm(sample, axis=1, keepdims=True)
    sn[sn == 0.0] = 1.0
    cents = _kmeans_lite(sample / sn, min(n_clusters, len(sample)), iters, seed)
    cn = np.linalg.norm(cents, axis=1, keepdims=True)
    cn[cn == 0.0] = 1.0
    centsn = cents / cn
    mat = np.array([vectors[i] for i in ids], dtype=np.float64)
    nr = np.linalg.norm(mat, axis=1, keepdims=True)
    nr[nr == 0.0] = 1.0
    clusters = ((mat / nr) @ centsn.T).argmax(axis=1)
    out = {}
    for c in sorted(set(int(x) for x in clusters)):
        rows = [j for j, cj in enumerate(clusters) if cj == c]
        res = _semdedup_greedy(
            [ids[j] for j in rows], mat[rows], centsn[c], threshold
        )
        for id_, keep, mc in res:
            out[id_] = (c, keep, mc)
    return out


def misra_gries_update_py(summary: dict, counts: dict, capacity: int) -> dict:
    """One mergeable-summaries update step (Agarwal et al. 2013, §3.1 —
    merging two Misra-Gries summaries): add ``counts`` into ``summary``
    keywise, then if more than ``capacity`` keys remain, subtract the
    (capacity+1)-th largest counter from every counter and drop the
    non-positive ones. The result is a valid MG(capacity) summary of the
    combined stream: every counter underestimates its key's true count by
    at most N/(capacity+1), where N is the total items summarized.

    Single-source kernel: the Spark partition kernel in
    ``logagg.aggregate.heavy_hitters`` and the pure-Python twin both call
    this, so differential tests pin one implementation."""
    for key, cnt in counts.items():
        summary[key] = summary.get(key, 0) + int(cnt)
    if len(summary) > capacity:
        # (capacity+1)-th largest value; ties broken by magnitude only —
        # subtracting it preserves the MG error bound regardless of which
        # keys share the boundary value
        cut = sorted(summary.values(), reverse=True)[capacity]
        summary = {k: v - cut for k, v in summary.items() if v - cut > 0}
    return summary


def misra_gries_py(keys, capacity: int) -> dict:
    """MG(capacity) summary of an iterable — the twin for partition kernels.
    Batching through a Counter first matches the Arrow kernel's
    value_counts-then-merge shape exactly."""
    from collections import Counter

    return misra_gries_update_py({}, dict(Counter(keys)), capacity)


def countmin_bucket_py(key: str, row: int, width: int) -> int:
    """Row-j bucket of ``key`` in a Count-Min sketch: crc32 of "<j>:<key>"
    mod width. Single-source kernel shared by the Spark partition pass and
    the Python twin — bucket ids agree bit-for-bit."""
    return zlib.crc32(f"{row}:{key}".encode("utf-8")) % width


def countmin_build_py(counts: dict, depth: int, width: int) -> np.ndarray:
    """Dense ``int64[depth, width]`` Count-Min registers (Cormode &
    Muthukrishnan 2005) from exact key counts. Register merge is cellwise
    integer addition — exactly associative and commutative, so
    build(A) + build(B) == build(A ⊎ B) bit-for-bit (the mergeability
    test pins this)."""
    mat = np.zeros((depth, width), dtype=np.int64)
    for key, cnt in counts.items():
        for j in range(depth):
            mat[j, countmin_bucket_py(str(key), j, width)] += int(cnt)
    return mat


def countmin_query_py(mat: np.ndarray, key: str) -> int:
    """Point estimate: min over rows — always >= the true count, and
    <= true + 2N/width per row in expectation (classic CM bound)."""
    depth, width = mat.shape
    return int(
        min(mat[j, countmin_bucket_py(str(key), j, width)] for j in range(depth))
    )


def expected_fuzzy_contamination(
    doc_ids: list[str],
    doc_texts: list[str],
    bench_texts: list[str],
    threshold_num: int = 4,
    threshold_den: int = 5,
    stop: frozenset = frozenset(),
) -> set[tuple[str, str, int, int, int]]:
    """Twin of dedup.decontaminate_fuzzy: cross-corpus LSH candidates
    (same 64-perm 16x4 banding) verified with exact Jaccard >= num/den.
    Returns {(doc_id, bench_md5, shared, na, nb)}."""
    a, b = _perms()

    def bands_of(text) -> tuple[set, list[tuple[int, tuple]]]:
        s = textfns.shingle_set(text) if isinstance(text, str) else set()
        s.discard("")
        s -= stop
        if not s:
            return s, []
        x = np.fromiter(
            (zlib.crc32(sh.encode("utf-8")) for sh in s), dtype=np.int64, count=len(s)
        )
        sig = ((a[:, None] * x[None, :] + b[:, None]) % MINHASH_MERSENNE).min(axis=1)
        keys = [
            (band, tuple(int(v) for v in sig[band * MINHASH_LSH_ROWS : (band + 1) * MINHASH_LSH_ROWS]))
            for band in range(MINHASH_LSH_BANDS)
        ]
        return s, keys

    bench: dict[str, tuple[set, set]] = {}
    for t in bench_texts:
        bid = hashlib.md5((t or "").encode("utf-8")).hexdigest()
        if bid not in bench:
            s, keys = bands_of(t)
            bench[bid] = (s, set(keys))
    out: set[tuple[str, str, int, int, int]] = set()
    p, q = threshold_num, threshold_den
    for did, dt in zip(doc_ids, doc_texts):
        s, keys = bands_of(dt)
        for bid, (bs, bkeys) in bench.items():
            if not (set(keys) & bkeys):
                continue
            shared = len(s & bs)
            na, nb = len(s), len(bs)
            if (p + q) * shared >= p * (na + nb):
                out.add((str(did), bid, shared, na, nb))
    return out


def kmeans_fit_py(
    ids: list, vecs: list, k: int, iters: int = 10
) -> np.ndarray:
    """Twin of similarity.kmeans_fit: same hash-rank init, same GEMM-argmin
    assignment and sum/count update. Float sum ORDER differs from the
    distributed fold, so centroids agree to ~1e-9 (assignments exactly)."""
    ranked = hash_sample_ids_py(ids, k)
    by_id = {str(i): np.asarray(v, dtype=np.float64) for i, v in zip(ids, vecs)}
    cents = np.array([by_id[str(i)] for i in ranked], dtype=np.float64)
    X = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
    for _ in range(iters):
        cn = (cents * cents).sum(axis=1)
        a = (cn[None, :] - 2.0 * (X @ cents.T)).argmin(axis=1)
        sums = np.zeros_like(cents)
        np.add.at(sums, a, X)
        counts = np.bincount(a, minlength=k).astype(np.float64)
        nonempty = counts > 0
        new = cents.copy()
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        cents = new
    return cents


def kmeans_assign_py(vecs: list, cents: np.ndarray) -> list[int]:
    """Twin of similarity.kmeans_assign (np.argmin tie rule)."""
    X = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
    cn = (cents * cents).sum(axis=1)
    return list((cn[None, :] - 2.0 * (X @ cents.T)).argmin(axis=1))


# ---------------------------------------------------------------------------
# Bloom filter twins (aggregate.bloom_build / bloom_probe)
# ---------------------------------------------------------------------------

def bloom_hash_py(j: int, key: str, n_bits: int) -> int:
    """Twin of aggregate._bloom_hash: first 15 hex chars of
    md5("<j>:<key>") as an int, mod n_bits."""
    h = hashlib.md5(f"{j}:{key}".encode()).hexdigest()[:15]
    return int(h, 16) % n_bits


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def bloom_build_py(keys, n_bits: int, n_hashes: int) -> dict[int, int]:
    """Twin of aggregate.bloom_build: sparse {word: bits} with bits in the
    SIGNED-64 convention Spark longs use (bit 63 set → negative)."""
    acc: dict[int, int] = defaultdict(int)
    for key in keys:
        if key is None:
            continue
        for j in range(n_hashes):
            h = bloom_hash_py(j, str(key), n_bits)
            acc[h >> 6] |= 1 << (h & 63)
    return {w: _signed64(b) for w, b in acc.items()}


def bloom_contains_py(
    regs: list[int], key: str, n_bits: int, n_hashes: int
) -> bool:
    """Twin of aggregate.bloom_probe over the dense signed-64 word list."""
    for j in range(n_hashes):
        h = bloom_hash_py(j, str(key), n_bits)
        if not (regs[h >> 6] & (1 << 64) - 1) & (1 << (h & 63)):
            return False
    return True


# ---------------------------------------------------------------------------
# PCA twins (similarity.pca_fit / pca_project)
# ---------------------------------------------------------------------------

def pca_fit_py(vecs: list, k: int) -> dict:
    """Twin of similarity.pca_fit: same population-covariance formula and
    the SAME post-moment kernel (_pca_from_cov), so any disagreement is
    exactly the distributed float-sum order (~1e-9)."""
    from logagg.similarity import _pca_from_cov

    X = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
    n = len(X)
    mean = X.sum(axis=0) / n
    cov = (X.T @ X) / n - np.outer(mean, mean)
    return _pca_from_cov(mean, cov, k, n)


def pca_project_py(vecs: list, model: dict, whiten: bool = False, eps: float = 1e-9) -> np.ndarray:
    """Twin of similarity.pca_project."""
    X = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
    P = (X - np.asarray(model["mean"])) @ np.asarray(model["components"]).T
    if whiten:
        P = P / np.sqrt(np.asarray(model["explained_variance"]) + eps)
    return P


def bottomk_overlap_py(ids_a: list, ids_b: list, k: int) -> dict:
    """Twin of aggregate.bottomk_overlap: per-side distinct bottom-k via
    the shared hash rank, then the same union-sample estimator."""
    ids_a, ids_b = list(set(ids_a)), list(set(ids_b))
    sa = hash_sample_ids_py(ids_a, k)
    sb = hash_sample_ids_py(ids_b, k)

    def rank(i):
        return (hashlib.md5(str(i).encode("utf-8")).hexdigest(), i)

    union_sample = sorted(set(sa) | set(sb), key=rank)[:k]
    k_used = len(union_sample)
    in_a, in_b = set(sa), set(sb)
    shared = sum(1 for i in union_sample if i in in_a and i in in_b)
    j = shared / k_used if k_used else 0.0
    n_a, n_b = len(ids_a), len(ids_b)
    union_est = (n_a + n_b) / (1.0 + j) if (n_a + n_b) else 0.0
    return {
        "jaccard": j,
        "union": union_est,
        "intersection": union_est * j,
        "n_a": n_a,
        "n_b": n_b,
        "k_used": k_used,
    }


def quantize_py(X: np.ndarray, mn: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """Shared int8 scalar-quantization kernel (similarity.quantize_embeddings
    and its twin): code = round((x-mn)/scale) clamped to [0,255]; zero-scale
    dims code to 0."""
    safe = np.where(scale > 0, scale, 1.0)
    q = np.rint((X - mn) / safe)
    q = np.where(scale > 0, q, 0.0)
    return np.clip(q, 0, 255).astype(np.uint8)
