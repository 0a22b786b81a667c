"""spark-submit entry point for DSIR target-matched data selection.

    python tools/package.py                 # → dist/logagg.zip
    spark-submit --py-files dist/logagg.zip jobs/select_job.py \
        --raw /data/crawl_docs.parquet \
        --target /data/wiki_slice.parquet \
        --k 1000000 --outdir /data/selected

Fits hashed-ngram models on the target and raw corpora, scores every raw
document with its importance log-weight, Gumbel-top-k samples ``k`` docs,
and writes them (with ``logw``/``key`` columns) to ``<outdir>/docs``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw", required=True, help="raw-pool documents parquet")
    ap.add_argument("--target", required=True, help="target-corpus parquet")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--k", type=int, required=True)
    ap.add_argument("--buckets", type=int, default=10_000)
    ap.add_argument("--seed", default="dsir")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--target-text-col", default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from logagg import dsir
    from logagg.session import get_spark

    spark = get_spark(app_name="logagg-dsir-select", master=args.master)
    raw = spark.read.parquet(args.raw)
    tcol = args.target_text_col or args.text_col
    target = spark.read.parquet(args.target).select(tcol)
    if tcol != args.text_col:
        target = target.withColumnRenamed(tcol, args.text_col)

    selected = dsir.dsir_select(
        raw,
        target,
        k=args.k,
        buckets=args.buckets,
        seed=args.seed,
        id_col=args.id_col,
        text_col=args.text_col,
    )
    selected.write.mode("overwrite").parquet(f"{args.outdir}/docs")
    n = spark.read.parquet(f"{args.outdir}/docs").count()
    print(f"selected {n} docs -> {args.outdir}/docs")


if __name__ == "__main__":
    main()
