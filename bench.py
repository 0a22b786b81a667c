#!/usr/bin/env python
"""Benchmark harness.

Default mode: time the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON
line. Also runs the two-parallelism scaling proxy (same job at local[N] and
local[4N] — the sandbox stand-in for the N→4N-executor criterion in
BASELINE.json) and appends the evidence to BENCH.md.

Internal: ``--scaling-worker`` runs the e2e pipeline once in a fresh JVM at
a given master and prints {"elapsed": s, "records": n} (timed from first
action, session/cache warm-up excluded).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "16"))


def _sf_value(sf_dir: str) -> float:
    name = Path(sf_dir.rstrip("/")).name
    try:
        return float(name.removeprefix("sf"))
    except ValueError:
        return -1.0


def _pipeline(spark, sf_dir: str, replicate: int = 1):
    """The flagship e2e: read pages → vectorized parse → broadcast enrich →
    per-sink hourly aggregate. Returns (records_parsed, result_df)."""
    from pyspark.sql import functions as F

    from logagg import aggregate, enrich, parse, synth

    cache = synth.ensure_cache(sf_dir, expected=False)
    path = str(cache / "pages.parquet")
    pages = spark.read.parquet(path)
    if replicate > 1:
        # replicate as a union of scans (not an explode): N× the input
        # splits → task granularity that divides any core count, no shuffle,
        # and per-task work stays constant as the job scales
        reps = [
            spark.read.parquet(path).withColumn(
                "url", F.concat_ws("#", "url", F.lit(str(i)))
            )
            for i in range(replicate)
        ]
        pages = reps[0]
        for r in reps[1:]:
            pages = pages.unionByName(r)
    host_geo, lang_locale = enrich.load_lookups(spark, cache)
    parsed = parse.parsed_records(pages)
    enriched = enrich.enrich(parsed, host_geo, lang_locale)
    return aggregate.sink_agg_hourly(enriched)


def scaling_worker(master: str, sf_dir: str, replicate: int) -> None:
    from logagg.session import get_spark
    from logagg import synth

    synth.ensure_cache(sf_dir, expected=False)  # warm cache before timing
    n = int(master[6:-1]) if master.startswith("local[") else CPUS
    spark = get_spark(app_name=f"bench-{master}", master=master, shuffle_partitions=n)
    from pyspark.sql import functions as F

    # warm-up: run the same plan shape once at 1× so JVM codegen, parquet
    # footer caches, and the Python worker pool are steady-state — the
    # scaling criterion is about sustained throughput, not JVM cold start
    _pipeline(spark, sf_dir, 1).agg(F.sum("n_rows")).collect()
    agg = _pipeline(spark, sf_dir, replicate)
    t0 = time.time()
    row = agg.agg(F.sum("n_rows").alias("records")).collect()[0]
    elapsed = time.time() - t0
    print(json.dumps({"elapsed": elapsed, "records": int(row["records"])}))


SCALING_RUNS = int(os.environ.get("BENCH_SCALING_RUNS", "3"))


def _one_worker(n: int, sf_dir: str) -> dict:
    proc = subprocess.run(
        [
            sys.executable,
            __file__,
            "--scaling-worker",
            f"--master=local[{n}]",
            f"--sf-dir={sf_dir}",
            f"--replicate={REPLICATE}",
        ],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def run_scaling(sf_dir: str) -> dict:
    lo = max(2, CPUS // 4)
    hi = CPUS
    # alternate configs across repeats and take the median elapsed — the
    # sandbox shares cores with other tenants, and single runs swing 2-4x
    runs: dict[int, list[dict]] = {lo: [], hi: []}
    for _ in range(SCALING_RUNS):
        for n in (hi, lo):
            runs[n].append(_one_worker(n, sf_dir))
    out = {}
    for n in (lo, hi):
        ordered = sorted(runs[n], key=lambda r: r["elapsed"])
        out[n] = ordered[len(ordered) // 2]
    r_lo = out[lo]["records"] / out[lo]["elapsed"]
    r_hi = out[hi]["records"] / out[hi]["elapsed"]
    eff = (r_hi / r_lo) / (hi / lo)
    return {
        "cores_lo": lo,
        "cores_hi": hi,
        "rows_per_sec_lo": round(r_lo),
        "rows_per_sec_hi": round(r_hi),
        "elapsed_lo": round(out[lo]["elapsed"], 2),
        "elapsed_hi": round(out[hi]["elapsed"], 2),
        "all_elapsed_lo": [round(r["elapsed"], 2) for r in runs[lo]],
        "all_elapsed_hi": [round(r["elapsed"], 2) for r in runs[hi]],
        "records": out[hi]["records"],
        "efficiency": round(eff, 3),
    }


# headline queries: name -> (callable(spark, sf_dir) -> DataFrame, action)
def _headline():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    count = lambda df: df.count()  # noqa: E731
    collect = lambda df: len(df.collect())  # noqa: E731
    return {
        "parse_records": (qs["parse_records"], count),
        "sink_agg_hourly": (qs["sink_agg_hourly"], count),
        "host_agg_salted": (qs["host_agg_salted"], collect),
        "route_counts": (qs["route_counts"], collect),
        "enrich_geo_counts": (qs["enrich_geo_counts"], collect),
        "pages_langid": (qs["pages_langid"], count),
        "dedup_shingle_pairs": (qs["dedup_shingle_pairs"], collect),
        "dedup_minhash_lsh": (qs["dedup_minhash_lsh"], collect),
        "ann_topk_numpy": (qs["ann_topk_numpy"], collect),
        "html_meta": (qs["html_meta"], count),
        "media_decode_stub": (qs["media_decode_stub"], count),
        "doc_fingerprints": (qs["doc_fingerprints"], count),
        "tpch_q1": (qs["tpch_q1"], collect),
        "orders_by_region": (qs["orders_by_region"], collect),
        "events_hourly": (qs["events_hourly"], count),
        "user_sessions": (qs["user_sessions"], count),
    }


def write_bench_md(result: dict) -> None:
    lines = [
        "# BENCH — logagg",
        "",
        f"sf_dir: `{result['sf_dir']}` (sf={result['sf']}), session `local[{CPUS}]`,",
        f"shuffle.partitions={CPUS}, AQE on, Arrow on. Generated by `bench.py`.",
        "",
        "## Headline query timings (seconds)",
        "",
        "| query | sec |",
        "|---|---|",
    ]
    for k, v in result["queries"].items():
        lines.append(f"| {k} | {v} |")
    s = result["scaling"]
    lines += [
        "",
        "## Scaling proxy (BASELINE.json two-cluster-size criterion)",
        "",
        "Same e2e job — read pages → vectorized parse → broadcast enrich →",
        f"per-sink hourly aggregate — on identical input (pages ×{REPLICATE}",
        "replicated), timed from first action in fresh JVMs:",
        "",
        "| cores | elapsed (s) | rows/sec |",
        "|---|---|---|",
        f"| local[{s['cores_lo']}] | {s['elapsed_lo']} | {s['rows_per_sec_lo']:,} |",
        f"| local[{s['cores_hi']}] | {s['elapsed_hi']} | {s['rows_per_sec_hi']:,} |",
        "",
        f"records per run: {s['records']:,} parsed rows",
        "",
        f"**Scaling efficiency ( (R_hi/R_lo) / {s['cores_hi']//s['cores_lo']} ) = "
        f"{s['efficiency']}** (target ≥ 0.8 per BASELINE.json).",
        "",
    ]
    (REPO / "BENCH.md").write_text("\n".join(lines))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling-worker", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--skip-scaling", action="store_true")
    args = ap.parse_args()

    if args.scaling_worker:
        scaling_worker(args.master, args.sf_dir, args.replicate)
        return

    from logagg import synth
    from logagg.session import get_spark

    synth.ensure_cache(args.sf_dir, expected=False)
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)

    queries = {}
    total = 0.0
    pipeline_df = _pipeline(spark, args.sf_dir)
    t0 = time.time()
    from pyspark.sql import functions as F

    records = int(pipeline_df.agg(F.sum("n_rows")).collect()[0][0])
    pipeline_sec = time.time() - t0
    queries["e2e_pipeline"] = round(pipeline_sec, 3)
    total += pipeline_sec

    for name, (fn, action) in _headline().items():
        t0 = time.time()
        try:
            action(fn(spark, args.sf_dir))
            dt = time.time() - t0
        except Exception as e:  # noqa: BLE001
            print(f"bench query {name} failed: {e}", file=sys.stderr)
            dt = -1.0
        queries[name] = round(dt, 3)
        if dt > 0:
            total += dt

    scaling = None if args.skip_scaling else run_scaling(args.sf_dir)

    result = {
        "metric": "e2e_parse_enrich_aggregate_seconds",
        "value": round(pipeline_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": _sf_value(args.sf_dir),
        "sf_dir": args.sf_dir,
        "records": records,
        "rows_per_sec": round(records / pipeline_sec) if pipeline_sec > 0 else None,
        "total_sec": round(total, 3),
        "scaling": scaling,
    }
    if scaling:
        write_bench_md(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
