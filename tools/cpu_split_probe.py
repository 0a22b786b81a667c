"""Attribute the Spark e2e job's CPU to process classes (JVM vs pyspark
daemon/workers) at two core counts, by polling /proc during a
bench.py --scaling-worker run. Dead processes keep their last observed
cpu (0.2 s polling → small tail error).

Usage: python tools/cpu_split_probe.py [cores ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _class_of(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmd = f.read().replace(b"\x00", b" ").decode(errors="replace")
    except OSError:
        return "gone"
    if "java" in cmd.split(" ")[0]:
        return "jvm"
    if "pyspark.daemon" in cmd or "pyspark.worker" in cmd:
        return "pyworker"
    if "cpu_split_probe" in cmd or "bench.py" in cmd:
        return "driver_py"
    return "other:" + cmd[:40]


def _sample(root_pid: int, seen: dict) -> None:
    hz = os.sysconf("SC_CLK_TCK")
    procs: dict[int, tuple[int, float]] = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat") as f:
                stat = f.read()
        except OSError:
            continue
        rp = stat.rindex(")")
        fields = stat[rp + 2 :].split()
        procs[int(entry)] = (int(fields[1]), (int(fields[11]) + int(fields[12])) / hz)
    mine = {root_pid}
    changed = True
    while changed:
        changed = False
        for pid, (ppid, _) in procs.items():
            if ppid in mine and pid not in mine:
                mine.add(pid)
                changed = True
    for pid in mine:
        if pid not in procs:
            continue
        cls = seen.get(pid, (None, 0.0))[0] or _class_of(pid)
        seen[pid] = (cls, procs[pid][1])


def run_one(cores: int) -> dict:
    cmd = [
        "taskset", "-c", f"0-{cores - 1}" if cores > 1 else "0",
        sys.executable, str(REPO / "bench.py"),
        "--scaling-worker", f"--master=local[{cores}]",
        "--sf-dir=/root/testdata/sf0.1", "--replicate=8",
    ]
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    seen: dict = {}
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            _sample(proc.pid, seen)
            time.sleep(0.2)

    th = threading.Thread(target=poll, daemon=True)
    th.start()
    out, _ = proc.communicate(timeout=1800)
    stop.set()
    th.join()
    worker = json.loads(out.strip().splitlines()[-1])
    by_class: dict[str, float] = {}
    n_by_class: dict[str, int] = {}
    for _pid, (cls, cpu) in seen.items():
        by_class[cls] = by_class.get(cls, 0.0) + cpu
        n_by_class[cls] = n_by_class.get(cls, 0) + 1
    return {
        "cores": cores,
        "elapsed": round(worker["elapsed"], 2),
        "records": worker["records"],
        "tree_cpu_reported": worker.get("cpu_seconds"),
        "cpu_by_class": {k: round(v, 1) for k, v in sorted(by_class.items())},
        "procs_by_class": n_by_class,
    }


if __name__ == "__main__":
    cores_list = [int(c) for c in sys.argv[1:]] or [1, 4]
    for c in cores_list:
        print(json.dumps(run_one(c)), flush=True)
