"""Controlled experiment: does per-unit CPU time inflate with parallelism
on this box, independent of Spark?

Each worker process pins itself to its own core and runs the SAME fixed
work — the pure-Python parse kernel (logagg.refparse) over the sf0.001 page
texts, R repetitions — and reports its own utime+stime. If cpu-seconds per
unit of work grows with the number of concurrently busy cores here, the
inflation is hardware-level (all-core frequency scaling / memory-bandwidth
or cache contention / tenant sharing), not Spark coordination overhead.

Usage: python tools/cpu_inflation_probe.py [reps_per_worker]
Prints one JSON line: {procs: {1: cpu_per_rep, ...}, mhz: {...}}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _load_texts() -> list[str]:
    import pyarrow.parquet as pq

    from logagg import synth

    cache = synth.ensure_cache("/root/testdata/sf0.001", expected=False)
    tbl = pq.read_table(cache / "pages.parquet", columns=["text"])
    return tbl.column("text").to_pylist()


def _worker(args) -> tuple[float, float, int]:
    core, reps, texts = args
    os.sched_setaffinity(0, {core})
    from logagg import refparse

    t0 = os.times()
    w0 = time.time()
    n = 0
    for _ in range(reps):
        for t in texts:
            n += len(refparse.parse_text(t))
    t1 = os.times()
    return (t1.user + t1.system) - (t0.user + t0.system), time.time() - w0, n


def _avg_mhz() -> float:
    vals = []
    with open("/proc/cpuinfo") as f:
        for line in f:
            if line.startswith("cpu MHz"):
                vals.append(float(line.split(":")[1]))
    return sum(vals) / len(vals) if vals else 0.0


def run(reps: int) -> dict:
    texts = _load_texts()
    out: dict = {"cpu_per_rep": {}, "wall": {}, "mhz_under_load": {}}
    # interleave ladder twice, keep best (tenant-shared box)
    for _round in range(2):
        for procs in (1, 4, 16):
            with mp.Pool(procs) as pool:
                async_res = pool.map_async(_worker, [(i, reps, texts) for i in range(procs)])
                time.sleep(0.6)
                mhz = _avg_mhz()
                res = async_res.get()
            cpu = sum(r[0] for r in res) / (procs * reps)  # cpu-sec per rep
            prev = out["cpu_per_rep"].get(procs)
            if prev is None or cpu < prev:
                out["cpu_per_rep"][procs] = round(cpu, 4)
                out["wall"][procs] = round(max(r[1] for r in res), 2)
                out["mhz_under_load"][procs] = round(mhz)
    base = out["cpu_per_rep"][1]
    out["inflation_vs_1core"] = {p: round(v / base, 3) for p, v in out["cpu_per_rep"].items()}
    return out


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    print(json.dumps(run(reps)))
