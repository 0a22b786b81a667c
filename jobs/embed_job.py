"""spark-submit entry point for the embedding-column operators.

    python tools/package.py                 # → dist/logagg.zip
    # reduce + whiten an embedding table:
    spark-submit --py-files dist/logagg.zip jobs/embed_job.py pca \
        --embeddings /data/embeddings.parquet --outdir /data/reduced \
        --dim 32 --whiten
    # 4-8x smaller int8 codes:
    spark-submit --py-files dist/logagg.zip jobs/embed_job.py quantize \
        --embeddings /data/embeddings.parquet --outdir /data/codes
    # cluster the corpus:
    spark-submit --py-files dist/logagg.zip jobs/embed_job.py kmeans \
        --embeddings /data/embeddings.parquet --outdir /data/clusters --k 256
    # neighbor lists for hash-sampled queries:
    spark-submit --py-files dist/logagg.zip jobs/embed_job.py ann \
        --embeddings /data/embeddings.parquet --outdir /data/neighbors \
        --method pca --queries 64 --k 10

Each subcommand reads a parquet with ``(vec_id, embedding array)``,
writes its result parquet to ``--outdir``, and prints a one-line
summary. ``ann --method`` picks the candidate-generation strategy:
``brute`` (exact), ``pca`` (reduced-space filter + exact re-rank),
``int8`` (quantized filter + exact re-rank), ``ivf``, ``lsh``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--embeddings", required=True)
        p.add_argument("--outdir", required=True)
        p.add_argument("--vec-col", default="embedding")
        p.add_argument("--master", default=None)

    p_pca = sub.add_parser("pca", help="fit + project onto principal axes")
    common(p_pca)
    p_pca.add_argument("--dim", type=int, required=True)
    p_pca.add_argument("--whiten", action="store_true")

    p_q = sub.add_parser("quantize", help="int8 scalar quantization")
    common(p_q)

    p_km = sub.add_parser("kmeans", help="cluster assignment")
    common(p_km)
    p_km.add_argument("--k", type=int, required=True)
    p_km.add_argument("--iters", type=int, default=10)

    p_ann = sub.add_parser("ann", help="top-k neighbors for sampled queries")
    common(p_ann)
    p_ann.add_argument(
        "--method", default="brute", choices=("brute", "pca", "int8", "ivf", "lsh")
    )
    p_ann.add_argument("--queries", type=int, default=8)
    p_ann.add_argument("--k", type=int, default=10)
    p_ann.add_argument("--candidates", type=int, default=64)
    p_ann.add_argument("--dim", type=int, default=16, help="pca method only")

    args = ap.parse_args()

    from logagg import similarity as sim
    from logagg.session import get_spark

    spark = get_spark(app_name=f"logagg-embed-{args.cmd}", master=args.master)
    emb = spark.read.parquet(args.embeddings)

    if args.cmd == "pca":
        model = sim.pca_fit(emb, args.dim, vec_col=args.vec_col)
        out = sim.pca_project(emb, model, vec_col=args.vec_col, whiten=args.whiten)
        out.write.mode("overwrite").parquet(args.outdir)
        ev = model["explained_variance"]
        print(
            f"pca: dim {len(model['mean'])} -> {args.dim}, "
            f"explained variance head {ev[:3].round(6).tolist()} -> {args.outdir}"
        )
    elif args.cmd == "quantize":
        model = sim.quantize_fit(emb, vec_col=args.vec_col)
        out = sim.quantize_embeddings(emb, model, vec_col=args.vec_col)
        out.write.mode("overwrite").parquet(args.outdir)
        print(f"quantize: {out.count()} rows, d={len(model['mn'])} bytes/vec -> {args.outdir}")
    elif args.cmd == "kmeans":
        cents = sim.kmeans_fit(emb, args.k, iters=args.iters, vec_col=args.vec_col)
        out = sim.kmeans_assign(emb, cents, vec_col=args.vec_col)
        out.write.mode("overwrite").parquet(args.outdir)
        print(f"kmeans: k={args.k}, {out.count()} assignments -> {args.outdir}")
    else:
        runs = {
            "brute": lambda: sim.ann_bruteforce(emb, args.queries, args.k),
            "pca": lambda: sim.ann_pca_rerank(
                emb, args.queries, args.k, dim_k=args.dim, candidates=args.candidates
            ),
            "int8": lambda: sim.ann_int8_rerank(
                emb, args.queries, args.k, candidates=args.candidates
            ),
            "ivf": lambda: sim.ann_ivf(emb, args.queries, args.k),
            "lsh": lambda: sim.ann_lsh(emb, args.queries, args.k),
        }
        out = runs[args.method]()
        out.write.mode("overwrite").parquet(args.outdir)
        print(
            f"ann[{args.method}]: {out.count()} (qid, nid, rank) rows -> {args.outdir}"
        )


if __name__ == "__main__":
    main()
