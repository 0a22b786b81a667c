"""spark-submit entry point for the crawl-to-training-text path:
WARC files → parsed pages → main-content extraction → curation.

    python tools/package.py                 # → dist/logagg.zip
    spark-submit --py-files dist/logagg.zip jobs/crawl_job.py \
        --warc /crawl/segments --outdir /tmp/crawl_out \
        --quality-min 0.05 --near-dedup --ranks

Writes curated documents to ``<outdir>/docs``, the per-stage manifest to
``<outdir>/manifest.json``, per-file damage counts to
``<outdir>/warc_summary`` and (with ``--ranks``) host PageRank to
``<outdir>/host_ranks`` — the authority signal downstream mixing weights
by. One reading of the WARC corpus feeds both paths.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warc", required=True, help="directory of .warc.gz files")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--min-tokens", type=int, default=8)
    ap.add_argument("--max-link-density", type=float, default=0.5)
    ap.add_argument("--langs", default=None, help="comma-separated keep list")
    ap.add_argument("--quality-min", type=float, default=None)
    ap.add_argument("--repetition", action="store_true")
    ap.add_argument("--no-exact-dedup", action="store_true")
    ap.add_argument("--near-dedup", action="store_true")
    ap.add_argument("--ranks", action="store_true",
                    help="also emit host PageRank from the crawl's link graph")
    args = ap.parse_args()

    from logagg import curate, linkgraph, warc
    from logagg.session import get_spark

    os.makedirs(args.outdir, exist_ok=True)
    spark = get_spark(app_name="logagg-crawl", master=args.master)
    records = warc.read_warc(spark, args.warc, record_types=None, emit_summary=True)
    records.filter(records["warc_type"] == "__file_summary__").select(
        "warc_file", "n_bad"
    ).write.mode("overwrite").parquet(f"{args.outdir}/warc_summary")

    pages = warc.warc_to_pages(
        records.filter(records["warc_type"] == "response")
    )
    kwargs: dict = {}
    if args.langs:
        kwargs["langs"] = tuple(args.langs.split(","))
    if args.quality_min is not None:
        kwargs["quality_min"] = args.quality_min
    if args.repetition:
        kwargs["repetition_limits"] = curate.DEFAULT_REPETITION_LIMITS
    res = curate.curate_pages(
        pages,
        min_tokens=args.min_tokens,
        max_link_density=args.max_link_density,
        exact_dedup=not args.no_exact_dedup,
        near_dedup=args.near_dedup,
        **kwargs,
    )
    res.docs.write.mode("overwrite").parquet(f"{args.outdir}/docs")
    with open(f"{args.outdir}/manifest.json", "w") as f:
        json.dump(res.manifest, f, indent=2)
    res.unpersist()

    if args.ranks:
        edges = linkgraph.host_graph(linkgraph.extract_links(pages))
        linkgraph.pagerank(
            edges,
            materialize="path",
            out_path=f"{args.outdir}/host_ranks",
        )

    print(json.dumps({"stages": res.manifest}))


if __name__ == "__main__":
    main()
