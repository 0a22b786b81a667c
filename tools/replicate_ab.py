"""Replicate-mechanism A/B (round-4 verdict #3).

The r4 ladder showed marginal cpu µs/record rising 9.5 → 14.5 up the rungs,
but every higher rung ALSO carried a wider union-of-scans replicate (×32 at
2 cores vs ×128 at 16), so the artifact could not attribute the inflation:
genuine per-record cost growth under parallelism, or the union plan's
breadth itself?

This tool separates the two at FIXED core counts: for each mechanism
(``union`` = N-branch union of scans, ``disk`` = N× hardlinked input files,
one scan branch) it runs the identical steady-state pipeline at several
work sizes and reports absolute and pairwise-marginal cpu µs/record. If
the union's marginal grows with breadth at fixed cores while disk's stays
flat, the union mechanism inflates; if both grow with cores at fixed
breadth, the inflation is concurrency (memory bandwidth / cache sharing)
and no replicate mechanism can remove it.

Usage: python tools/replicate_ab.py [--sf-dir DIR] [--out FILE]
Writes one JSON object; run on an otherwise-idle box.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

# (cores, [replicates]) — breadth sweep at 16 cores is the verdict's ask;
# the 2-core row anchors the low-concurrency marginal at the SAME breadths
GRID = ((2, (8, 32)), (16, (8, 32, 128)))


def run(sf_dir: str) -> dict:
    out: dict = {"sf_dir": sf_dir, "grid": {}}
    for mode in ("union", "disk"):
        for cores, reps in GRID:
            rows = {}
            for rep in reps:
                r = bench._one_worker(cores, sf_dir, replicate=rep, rep_mode=mode)
                r["cpu_us_per_record_abs"] = round(
                    1e6 * r["cpu_seconds"] / r["records"], 2
                )
                rows[rep] = r
                print(
                    f"{mode} cores={cores} rep={rep}: elapsed={r['elapsed']:.2f}s "
                    f"abs={r['cpu_us_per_record_abs']}µs/rec "
                    f"cotenant={r.get('cotenant_cores')}",
                    file=sys.stderr,
                )
            marginals = {}
            rlist = sorted(rows)
            for lo, hi in zip(rlist, rlist[1:]):
                a, b = rows[lo], rows[hi]
                if b["records"] > a["records"]:
                    marginals[f"{lo}->{hi}"] = round(
                        1e6
                        * (b["cpu_seconds"] - a["cpu_seconds"])
                        / (b["records"] - a["records"]),
                        2,
                    )
            out["grid"][f"{mode}/{cores}c"] = {
                "abs_us_per_record": {
                    str(rep): rows[rep]["cpu_us_per_record_abs"] for rep in rlist
                },
                "marginal_us_per_record": marginals,
                "elapsed": {str(rep): round(rows[rep]["elapsed"], 2) for rep in rlist},
                "cotenant_cores": {
                    str(rep): rows[rep].get("cotenant_cores") for rep in rlist
                },
            }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=bench.SF_DIR)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    result = run(args.sf_dir)
    text = json.dumps(result, indent=1)
    if args.out:
        Path(args.out).write_text(text)
    print(text)


if __name__ == "__main__":
    main()
