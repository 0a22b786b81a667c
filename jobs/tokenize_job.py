"""spark-submit entry point for tokenizer training + corpus encoding.

    python tools/package.py                 # → dist/logagg.zip
    spark-submit --py-files dist/logagg.zip jobs/tokenize_job.py \
        --docs /tmp/curated/docs --outdir /tmp/tokenized \
        --merges 8000 --model /tmp/bpe_model.json

Trains BPE on the input corpus (or loads ``--model`` if it already
exists — train once, reuse everywhere), encodes every document in one
broadcast-model Arrow pass, and writes (id, ids array<int>,
n_bpe_tokens) parquet — the input the sequence packer
(``textstats.pack_sequences``) and the trainer consume next.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="input documents parquet")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--master", default=None)
    ap.add_argument("--merges", type=int, default=8000)
    ap.add_argument("--min-pair-count", type=int, default=2)
    ap.add_argument("--max-words", type=int, default=1_000_000)
    ap.add_argument("--model", default=None,
                    help="BPE json path: loaded if it exists, else trained and saved here")
    args = ap.parse_args()

    from logagg import bpe
    from logagg.session import get_spark

    spark = get_spark(app_name="logagg-tokenize", master=args.master)
    docs = spark.read.parquet(args.docs)

    if args.model and os.path.exists(args.model):
        with open(args.model) as fh:
            model = bpe.BPEModel.from_json(fh.read())
    else:
        model = bpe.train_bpe(
            docs,
            args.merges,
            min_pair_count=args.min_pair_count,
            max_words=args.max_words,
            text_col=args.text_col,
        )
        if args.model:
            with open(args.model, "w") as fh:
                fh.write(model.to_json())

    out = bpe.bpe_encode(docs, model, id_col=args.id_col, text_col=args.text_col)
    out.write.mode("overwrite").parquet(f"{args.outdir}/tokens")
    n = spark.read.parquet(f"{args.outdir}/tokens").count()
    print(f"vocab={len(model.vocab)} merges={len(model.merges)} docs={n}")


if __name__ == "__main__":
    main()
