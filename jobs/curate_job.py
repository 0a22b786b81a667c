"""spark-submit entry point for the training-data curation pipeline.

    python tools/package.py                 # → dist/logagg.zip
    spark-submit --py-files dist/logagg.zip jobs/curate_job.py \
        --docs /root/testdata/sf0.01/documents.parquet \
        --outdir /tmp/curated --stage-dir /tmp/curated_stages \
        --quality-min 0.05 --repetition --near-dedup \
        --benchmark /path/to/eval_docs.parquet --pack 4096

Writes the surviving (packed) documents to ``<outdir>/docs`` parquet and
the per-stage manifest to ``<outdir>/manifest.json``; with ``--stage-dir``
every stage lands in parquet and a rerun with ``--resume`` skips finished
stages (restart-safe on a real cluster).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python jobs/curate_job.py` convenience; under spark-submit the
# --py-files zip provides the package instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="input documents parquet")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--url-col", default=None)
    ap.add_argument("--master", default=None)
    ap.add_argument("--redact", action="store_true")
    ap.add_argument("--paragraph-dedup", action="store_true",
                    help="drop corpus-wide duplicate paragraphs (CCNet-style)")
    ap.add_argument("--host-boilerplate", action="store_true",
                    help="cut lines repeated across a host's pages "
                         "(requires --url-col)")
    ap.add_argument("--c4", action="store_true",
                    help="C4 line/document heuristics (Raffel et al. 2020)")
    ap.add_argument("--c4-min-sentences", type=int, default=5)
    ap.add_argument("--langs", default=None, help="comma-separated keep list")
    ap.add_argument("--quality-min", type=float, default=None)
    ap.add_argument("--blocklist", default=None,
                    help="file of blocked domains, one per line (requires --url-col)")
    ap.add_argument("--ppl-max", type=float, default=None,
                    help="keep docs with LM perplexity <= this (CCNet-style)")
    ap.add_argument("--ppl-bucket-keep", default=None,
                    help="comma-separated CCNet buckets to keep (head,middle,tail) — "
                         "relative terciles instead of an absolute --ppl-max")
    ap.add_argument("--ppl-bucket-lang-col", default=None,
                    help="group the bucket terciles by this language column")
    ap.add_argument("--lm-model", default=None,
                    help="LM json path: loaded if it exists, else trained and saved here")
    ap.add_argument("--lm-train", default=None,
                    help="clean-corpus parquet to train the LM on (default: the input docs)")
    ap.add_argument("--lm-top-k", type=int, default=50_000)
    ap.add_argument("--lm-order", type=int, default=2, choices=(2, 3),
                    help="n-gram order for a freshly trained perplexity LM")
    ap.add_argument("--lm-max-bigrams", type=int, default=500_000)
    ap.add_argument("--quality-model", default=None,
                    help="MLlib LogisticRegressionModel dir (classify.train_quality_classifier().save)")
    ap.add_argument("--quality-prob-min", type=float, default=None)
    ap.add_argument("--repetition", action="store_true", help="Gopher default limits")
    ap.add_argument("--no-exact-dedup", action="store_true")
    ap.add_argument("--near-dedup", action="store_true")
    ap.add_argument("--substring-n", type=int, default=None,
                    help="cut corpus-repeated n-token runs (exact-substring dedup)")
    ap.add_argument("--benchmark", default=None, help="eval-set parquet for decontamination")
    ap.add_argument("--ngram-n", type=int, default=13)
    ap.add_argument("--fuzzy-decontaminate", action="store_true",
                    help="also near-dup match against the benchmark (minhash)")
    ap.add_argument("--fuzzy-threshold", type=float, default=0.8)
    ap.add_argument("--passage-decontaminate", action="store_true",
                    help="winnowed-fingerprint probe for embedded benchmark passages")
    ap.add_argument("--domain-cap", type=int, default=None)
    ap.add_argument("--dsir-target", default=None,
                    help="target-corpus parquet; keep the --dsir-k docs most like it")
    ap.add_argument("--dsir-k", type=int, default=None)
    ap.add_argument("--sample-k", type=int, default=None,
                    help="exact-k quality-weighted sample (A-ES) after all filters")
    ap.add_argument("--pack", type=int, default=None, help="context-window capacity")
    ap.add_argument("--stage-dir", default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from logagg import curate
    from logagg.session import get_spark

    spark = get_spark(app_name="logagg-curate", master=args.master)
    docs = spark.read.parquet(args.docs)
    benchmark = spark.read.parquet(args.benchmark) if args.benchmark else None

    blocklist = None
    if args.blocklist:
        with open(args.blocklist) as fh:
            blocklist = [ln.strip() for ln in fh if ln.strip()]

    ppl_lm = None
    if args.ppl_max is not None or args.ppl_bucket_keep:
        from logagg import lm as lmmod

        if args.lm_model and os.path.exists(args.lm_model):
            with open(args.lm_model) as fh:
                ppl_lm = lmmod.LocalLM.from_json(fh.read())
        else:
            train_docs = spark.read.parquet(args.lm_train) if args.lm_train else docs
            ppl_lm = lmmod.train_lm(
                train_docs,
                top_k=args.lm_top_k,
                max_bigrams=args.lm_max_bigrams,
                order=args.lm_order,
                text_col=args.text_col,
            )
            if args.lm_model:
                with open(args.lm_model, "w") as fh:
                    fh.write(ppl_lm.to_json())

    quality_model = None
    if args.quality_model:
        from pyspark.ml.classification import LogisticRegressionModel

        quality_model = LogisticRegressionModel.load(args.quality_model)

    res = curate.curate(
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        url_col=args.url_col,
        blocklist=blocklist,
        ppl_lm=ppl_lm,
        ppl_max=args.ppl_max,
        ppl_bucket_keep=(
            tuple(b.strip() for b in args.ppl_bucket_keep.split(",") if b.strip())
            if args.ppl_bucket_keep
            else None
        ),
        ppl_bucket_lang_col=args.ppl_bucket_lang_col,
        quality_model=quality_model,
        quality_prob_min=args.quality_prob_min,
        redact=args.redact,
        host_boilerplate=args.host_boilerplate,
        c4=args.c4,
        c4_min_sentences=args.c4_min_sentences,
        paragraph_dedup=args.paragraph_dedup,
        langs=tuple(args.langs.split(",")) if args.langs else None,
        quality_min=args.quality_min,
        repetition_limits=curate.DEFAULT_REPETITION_LIMITS if args.repetition else None,
        exact_dedup=not args.no_exact_dedup,
        near_dedup=args.near_dedup,
        substring_n=args.substring_n,
        benchmark=benchmark,
        ngram_n=args.ngram_n,
        fuzzy_decontaminate=args.fuzzy_decontaminate,
        fuzzy_threshold=args.fuzzy_threshold,
        passage_decontaminate=args.passage_decontaminate,
        domain_cap=args.domain_cap,
        dsir_target=(spark.read.parquet(args.dsir_target) if args.dsir_target else None),
        dsir_k=args.dsir_k,
        sample_k=args.sample_k,
        pack_capacity=args.pack,
        materialize_dir=args.stage_dir,
        resume=args.resume,
    )
    res.docs.write.mode("overwrite").parquet(f"{args.outdir}/docs")
    with open(f"{args.outdir}/manifest.json".replace("file:", ""), "w") as fh:
        json.dump(res.manifest, fh, indent=1)
    for m in res.manifest:
        print(f"{m['stage']:<20} in={m['rows_in']:>10} out={m['rows_out']:>10}")


if __name__ == "__main__":
    main()
