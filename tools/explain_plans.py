"""Print formatted physical plans for the headline queries and grep them for
the properties that matter at scale:

* parquet scans show PushedFilters / pruned ReadSchema (no ``html`` unless
  the operator needs it)
* lookup joins are BroadcastHashJoin, fact-side joins have no needless
  shuffles
* relational sections run inside WholeStageCodegen

Usage: python tools/explain_plans.py [query ...]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"

CHECKS = {
    "parse_records": {
        "must_not": [r"ReadSchema:.*html"],  # column pruning through mapInPandas
        "want": [r"ArrowEvalPython|MapInPandas"],
    },
    "enrich_geo_counts": {"want": [r"BroadcastHashJoin"], "must_not": [r"SortMergeJoin"]},
    "orders_by_region": {"want": [r"BroadcastHashJoin"]},
    # NOTE: AQE formatted plans (isFinalPlan=false) don't render
    # WholeStageCodegen nodes pre-execution; partial+final HashAggregate and
    # pushdown lines are the reliable static signals.
    "tpch_q1": {
        "want": [r"PushedFilters: \[.*LessThanOrEqual", r"partial_sum"],
    },
    "point_lookup_url": {
        "want": [r"MapInPandas|ArrowEvalPython"],
        "must_not": [r"extracted_text"],  # hand-pruned through the parse UDF
    },
    "sink_agg_hourly": {
        "want": [r"HashAggregate", r"partial_count|partial_sum"],
        "must_not": [r"extracted_text", r"ReadSchema:.*html"],
    },
    "find_node_sorted": {"must_not": [r"extracted_text", r"ReadSchema:.*html"]},
    "host_agg_salted": {"must_not": [r"extracted_text", r"ReadSchema:.*html"]},
    "route_counts": {"must_not": [r"extracted_text", r"ReadSchema:.*html"]},
    "enrich_geo_salted_join": {
        "want": [r"xxhash64"],  # deterministic salt, never an ordinal
        "must_not": [r"monotonically_increasing_id", r"extracted_text"],
    },
    # deepest join tree: all three dims must broadcast; only the
    # lineitem⋈orders fact join may shuffle
    "tpch_q9_profit": {
        "want": [r"BroadcastHashJoin", r"partial_sum"],
        "must_not": [r"CartesianProduct"],
    },
    # vectorized grok: column pruning must reach the scan (html must not be
    # read), and the pattern-derived literal pre-filter must sit ON the
    # pages scan — below the parse UDF — as a pushed parquet filter
    "grok_error_codes": {
        "want": [
            r"MapInPandas|ArrowEvalPython",
            r"PushedFilters: \[.*StringContains\(text,ErrorCode\)",
        ],
        "must_not": [r"ReadSchema:.*html", r"extracted_text"],
    },
    # the stack pattern's literal comes from a token BODY (JAVAFILE →
    # ".java") — it must still land on the pages scan
    "grok_stack_frames": {
        "want": [r"PushedFilters: \[.*StringContains\(text,\.java\)"],
        "must_not": [r"ReadSchema:.*html", r"extracted_text"],
    },
    # native sessionization: one shuffle on the grouping key, no joins
    "user_session_windows": {
        "want": [r"session_window", r"HashAggregate|SortAggregate"],
        "must_not": [r"CartesianProduct", r"MapInPandas"],
    },
    # frame-sampling schedule is pure Catalyst: explode, zero Python
    "media_frame_sample": {
        "want": [r"Generate", r"explode\(sequence"],
        "must_not": [r"MapInPandas|ArrowEvalPython", r"ReadSchema:.*text"],
    },
    "signup_cohorts": {"must_not": [r"CartesianProduct"]},
    # the dominant regex is projected ONCE and both aggregates consume the
    # column — an inlined form would evaluate it per-aggregate (2× cost)
    "doc_bpe_token_stats": {
        "want": [r"regexp_extract_all"],
        "count_max": {r"regexp_extract_all": 1},
    },
}


def main(only: list[str]) -> int:
    import __spark_entry__ as entrymod
    from logagg.session import get_spark

    spark = get_spark(app_name="plans", master="local[4]", shuffle_partitions=4)
    qs = entrymod.queries()
    names = only or list(CHECKS)
    rc = 0
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        print(f"{'='*70}\n{name}\n{'='*70}\n{plan}")
        for pat in CHECKS.get(name, {}).get("want", []):
            ok = bool(re.search(pat, plan))
            print(f"  [{'ok' if ok else 'MISSING'}] want: {pat}")
            rc |= 0 if ok else 1
        for pat in CHECKS.get(name, {}).get("must_not", []):
            bad = bool(re.search(pat, plan))
            print(f"  [{'VIOLATION' if bad else 'ok'}] must_not: {pat}")
            rc |= 1 if bad else 0
        for pat, mx in CHECKS.get(name, {}).get("count_max", {}).items():
            n = len(re.findall(pat, plan))
            ok = n <= mx
            print(f"  [{'ok' if ok else 'VIOLATION'}] count_max {mx}: {pat} (found {n})")
            rc |= 0 if ok else 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
