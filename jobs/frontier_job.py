"""spark-submit entry point for the crawl-frontier seen-set.

    python tools/package.py                 # → dist/logagg.zip
    # one discovered-URL batch against a persistent seen-dir:
    spark-submit --py-files dist/logagg.zip jobs/frontier_job.py \
        --urls /data/discovered.parquet --seen-dir /data/seen \
        --outdir /data/fresh
    # continuous: watch a directory of URL parquet files
    spark-submit --py-files dist/logagg.zip jobs/frontier_job.py \
        --urls /data/discovered_stream --seen-dir /data/seen \
        --outdir /data/fresh --stream --checkpoint /data/ckpt

Batch mode runs :func:`logagg.frontier.filter_unseen_bloom` once (the
bloom-accelerated exact seen-set increment) and writes the not-yet-seen
rows to ``<outdir>``. Stream mode runs
:func:`logagg.streaming.run_streaming_frontier` — micro-batches land at
``<outdir>/batch_id=N`` with exactly-once replay semantics (see the
function docstring for the crash-window decision table).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--urls", required=True,
                    help="discovered-URL parquet (file for batch, dir for --stream)")
    ap.add_argument("--seen-dir", required=True,
                    help="persistent seen store (exact index + bloom sketch)")
    ap.add_argument("--outdir", required=True, help="fresh-URL output")
    ap.add_argument("--url-col", default="url")
    ap.add_argument("--n-bits", type=int, default=1 << 20,
                    help="bloom width in bits (power of two; fixed at bootstrap)")
    ap.add_argument("--n-hashes", type=int, default=7)
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--checkpoint", default=None, help="required with --stream")
    ap.add_argument("--max-files-per-trigger", type=int, default=8)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from logagg.session import get_spark

    spark = get_spark(app_name="logagg-frontier", master=args.master)
    if args.stream:
        if not args.checkpoint:
            ap.error("--stream requires --checkpoint")
        from logagg import streaming

        counts = streaming.run_streaming_frontier(
            spark, args.urls, args.seen_dir, args.outdir, args.checkpoint,
            url_col=args.url_col, n_bits=args.n_bits, n_hashes=args.n_hashes,
            max_files_per_trigger=args.max_files_per_trigger,
        )
        total = sum(counts.values())
        print(f"fresh urls: {total} across {len(counts)} batches -> {args.outdir}")
    else:
        from logagg import frontier

        fresh = frontier.filter_unseen_bloom(
            spark.read.parquet(args.urls), args.seen_dir,
            url_col=args.url_col, n_bits=args.n_bits, n_hashes=args.n_hashes,
        )
        fresh.write.mode("overwrite").parquet(args.outdir)
        print(f"fresh urls: {spark.read.parquet(args.outdir).count()} -> {args.outdir}")


if __name__ == "__main__":
    main()
