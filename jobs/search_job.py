"""spark-submit entry point for the BM25 full-text index lifecycle.

    python tools/package.py                 # → dist/logagg.zip
    spark-submit --py-files dist/logagg.zip jobs/search_job.py \
        build  --docs /tmp/curated/docs --index /tmp/idx --buckets 64
    spark-submit --py-files dist/logagg.zip jobs/search_job.py \
        update --docs /tmp/crawl_batch2/docs --index /tmp/idx
    spark-submit --py-files dist/logagg.zip jobs/search_job.py \
        query  --index /tmp/idx --q "adaptive query execution" -k 10 \
        --docs /tmp/curated/docs --snippets

``build`` lands the term-bucketed postings + meta under ``--index``;
``update`` folds a NEW document batch in (search afterwards is
numerically identical to a rebuild over the union); ``query`` prints
one JSON line per hit — with ``--snippets`` (requires ``--docs``) each
hit carries its best-window highlight.
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
    for name in ("build", "update"):
        p = sub.add_parser(name)
        p.add_argument("--docs", required=True, help="input documents parquet")
        p.add_argument("--index", required=True)
        p.add_argument("--id-col", default="doc_id")
        p.add_argument("--text-col", default="text")
        p.add_argument("--master", default=None)
        if name == "build":
            p.add_argument("--buckets", type=int, default=64)
    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--docs", default=None, help="documents parquet, for --snippets")
    q.add_argument("--id-col", default="doc_id")
    q.add_argument("--text-col", default="text")
    q.add_argument("--snippets", action="store_true")
    q.add_argument("--master", default=None)
    args = ap.parse_args()

    from logagg import searchidx
    from logagg.session import get_spark

    spark = get_spark(app_name=f"logagg-search-{args.cmd}", master=args.master)
    if args.cmd == "build":
        docs = spark.read.parquet(args.docs)
        meta = searchidx.build_index(
            docs, args.index, id_col=args.id_col, text_col=args.text_col,
            num_buckets=args.buckets,
        )
        print(json.dumps({"built": args.index, **meta}))
    elif args.cmd == "update":
        docs = spark.read.parquet(args.docs)
        meta = searchidx.update_index(
            docs, args.index, id_col=args.id_col, text_col=args.text_col
        )
        print(json.dumps({"updated": args.index, **meta}))
    else:
        hits = searchidx.bm25_search(spark, args.index, args.q, k=args.k)
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
