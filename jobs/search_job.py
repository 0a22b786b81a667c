"""spark-submit entry point for the BM25 full-text index lifecycle.

    python tools/package.py                 # → dist/logagg.zip
    spark-submit --py-files dist/logagg.zip jobs/search_job.py \
        build  --docs /tmp/curated/docs --index /tmp/idx --buckets 64 \
        --positional
    spark-submit --py-files dist/logagg.zip jobs/search_job.py \
        update --docs /tmp/crawl_batch2/docs --index /tmp/idx
    spark-submit --py-files dist/logagg.zip jobs/search_job.py \
        replace --docs /tmp/recrawl/docs --index /tmp/idx
    spark-submit --py-files dist/logagg.zip jobs/search_job.py \
        delete --index /tmp/idx --ids url1 url2
    spark-submit --py-files dist/logagg.zip jobs/search_job.py \
        compact --index /tmp/idx
    spark-submit --py-files dist/logagg.zip jobs/search_job.py \
        query  --index /tmp/idx --q '"adaptive query" execution' -k 10 \
        --docs /tmp/curated/docs --snippets

``build`` lands the term-bucketed postings + doclens + meta under
``--index`` (``--positional`` stores per-term position lists, enabling
quoted-phrase queries); ``update`` folds a NEW document batch in;
``replace`` upserts a re-crawled batch; ``delete`` tombstones ids;
``compact`` drops dead generations and squashes small files — after any
of these, search is numerically identical to a rebuild over the live
corpus. ``query`` prints one JSON line per hit (quoted spans in ``--q``
are phrase constraints on a positional index) — with ``--snippets``
(requires ``--docs``) each hit carries its best-window highlight.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("build", "update", "replace"):
        p = sub.add_parser(name)
        p.add_argument("--docs", required=True, help="input documents parquet")
        p.add_argument("--index", required=True)
        p.add_argument("--id-col", default="doc_id")
        p.add_argument("--text-col", default="text")
        p.add_argument("--master", default=None)
        if name == "build":
            p.add_argument("--buckets", type=int, default=64)
            p.add_argument("--positional", action="store_true")
    d = sub.add_parser("delete")
    d.add_argument("--index", required=True)
    d.add_argument("--ids", nargs="+", required=True)
    d.add_argument("--master", default=None)
    c = sub.add_parser("compact")
    c.add_argument("--index", required=True)
    c.add_argument("--master", default=None)
    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--docs", default=None, help="documents parquet, for --snippets")
    q.add_argument("--id-col", default="doc_id")
    q.add_argument("--text-col", default="text")
    q.add_argument("--snippets", action="store_true")
    q.add_argument(
        "--ranks",
        default=None,
        help="(node, rank) parquet (pagerank/trustrank output) for "
        "authority-blended ranking; term search only (no phrase operators)",
    )
    q.add_argument("--boost", type=float, default=1.0)
    q.add_argument("--rank-key", choices=("host", "id"), default="host")
    q.add_argument("--master", default=None)
    args = ap.parse_args()

    from logagg import searchidx
    from logagg.session import get_spark

    spark = get_spark(app_name=f"logagg-search-{args.cmd}", master=args.master)
    if args.cmd == "build":
        docs = spark.read.parquet(args.docs)
        meta = searchidx.build_index(
            docs, args.index, id_col=args.id_col, text_col=args.text_col,
            num_buckets=args.buckets, positional=args.positional,
        )
        print(json.dumps({"built": args.index, **meta}))
    elif args.cmd == "update":
        docs = spark.read.parquet(args.docs)
        meta = searchidx.update_index(
            docs, args.index, id_col=args.id_col, text_col=args.text_col
        )
        print(json.dumps({"updated": args.index, **meta}))
    elif args.cmd == "replace":
        docs = spark.read.parquet(args.docs)
        meta = searchidx.replace_docs(
            docs, args.index, id_col=args.id_col, text_col=args.text_col
        )
        print(json.dumps({"replaced": args.index, **meta}))
    elif args.cmd == "delete":
        meta = searchidx.delete_docs(spark, args.index, args.ids)
        print(json.dumps({"deleted": args.index, **meta}))
    elif args.cmd == "compact":
        stats = searchidx.compact_index(spark, args.index)
        print(json.dumps({"compacted": args.index, **stats}))
    else:
        if args.ranks:
            ranks = spark.read.parquet(args.ranks)
            hits = searchidx.ranked_search(
                spark, args.index, args.q, ranks,
                k=args.k, boost=args.boost, rank_key=args.rank_key,
            )
        else:
            hits = searchidx.phrase_search(spark, args.index, args.q, k=args.k)
        if args.snippets:
            if not args.docs:
                ap.error("--snippets requires --docs")
            docs = spark.read.parquet(args.docs)
            rows = searchidx.snippets(
                docs, hits, args.q, id_col=args.id_col, text_col=args.text_col
            ).collect()
            for r in rows:
                print(json.dumps(
                    {"id": r["id"], "score": r["score"], "snippet": r["snippet"]}
                ))
        else:
            for r in hits.collect():
                print(json.dumps({"id": r["id"], "score": r["score"]}))


if __name__ == "__main__":
    main()
