"""spark-submit entry point for the batch pipeline.

Cluster usage (north-star packaging contract):

    python tools/package.py                 # → dist/logagg.zip
    spark-submit --py-files dist/logagg.zip \
        jobs/pipeline_job.py --sf-dir /root/testdata/sf0.001 --outdir /tmp/out

On a real cluster the same invocation takes ``--master yarn``/k8s and the
session factory's local-mode knobs are overridden with ``--conf``; nothing
in the job code changes.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from logagg.pipeline import run_pipeline
    from logagg.session import get_spark

    spark = get_spark(app_name="logagg-pipeline", master=args.master)
    results = run_pipeline(spark, args.sf_dir, args.outdir)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "sinks"} for k, v in results.items()}))


if __name__ == "__main__":
    main()
