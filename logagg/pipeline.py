"""End-to-end batch pipeline: parse → enrich → route → aggregate, resumable.

The Spark-first restatement of the reference's main() lifecycle
(aggregator/main.py:147-151 → extract → convert → insert → find/display,
SURVEY.md §3.1), with the directory-tree routing become a partitioned table
layout and the insert metrics become stage markers (logagg.checkpoint).

Every stage writes with mode("overwrite") to its own table path, so a retry
after a crash-before-marker is idempotent.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logagg import aggregate, enrich, parse, route, synth
from logagg.checkpoint import StageLedger


def _fingerprint(*parts: object) -> str:
    return json.dumps(parts, default=str)


def run_pipeline(spark: SparkSession, sf_dir: str, outdir: str) -> dict:
    """Run (or resume) the full pipeline. Returns the stage ledger metrics."""
    cache = synth.ensure_cache(sf_dir, expected=False)
    out = Path(outdir)
    ledger = StageLedger(out)
    pages_path = str(cache / "pages.parquet")
    fp = _fingerprint("v1", pages_path, synth.GEN_VERSION)

    results: dict[str, dict] = {}

    # stage 1: parse + enrich → staged records table
    parsed_path = str(out / "parsed")

    def _parse_stage() -> dict:
        pages = spark.read.parquet(pages_path)
        host_geo, lang_locale = enrich.load_lookups(spark, cache)
        parsed = enrich.enrich(parse.parsed_records(pages), host_geo, lang_locale)
        parsed.write.mode("overwrite").parquet(parsed_path)
        n = spark.read.parquet(parsed_path).count()
        return {"rows": n, "sink": parsed_path}

    results["parse"], _ = ledger.run_stage("parse", fp, _parse_stage)

    # stage 2: route → multiplexed fan-out write, per-sink counts as lineage
    routed_path = str(out / "routed")

    def _route_stage() -> dict:
        parsed = spark.read.parquet(parsed_path)
        counts = route.multiplex_write(parsed, routed_path)
        return {"rows": sum(counts.values()), "sinks": counts, "sink": routed_path}

    results["route"], _ = ledger.run_stage("route", fp, _route_stage)

    # stage 3: per-sink aggregates (+ severity/source invariants)
    agg_path = str(out / "aggregates")

    def _agg_stage() -> dict:
        routed = spark.read.parquet(routed_path)
        aggregate.sink_agg_hourly(routed).write.mode("overwrite").parquet(
            str(Path(agg_path) / "hourly")
        )
        aggregate.severity_counts(routed).write.mode("overwrite").parquet(
            str(Path(agg_path) / "severity")
        )
        sev = {
            r["severity"]: r["n"]
            for r in spark.read.parquet(str(Path(agg_path) / "severity")).collect()
        }
        return {"severity_counts": sev, "sink": agg_path}

    results["aggregate"], _ = ledger.run_stage("aggregate", fp, _agg_stage)
    return results
