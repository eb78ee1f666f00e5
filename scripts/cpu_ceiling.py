"""Hardware parallel-scaling ceiling probe.

Measures raw CPU throughput of an embarrassingly-parallel,
Spark-independent workload at 1..32 processes and writes
CPU_CEILING.json. Motivates the scaling-bench core-count choice: the
north-rule criterion is throughput scaling ≥ 0.8 from N to 4N
EXECUTORS; in this sandbox the stand-in is local[N] → local[4N], which
is only meaningful where the host can physically deliver 4× CPU. On a
host whose upper core range is hyperthreaded/quota-capped, 8→32 is
bounded by silicon (not by the pipeline) — the probe documents exactly
where the ceiling sits so the N→4N pair is chosen inside the linear
region.
"""

from __future__ import annotations

import json
import math
import os
import time
from concurrent.futures import ProcessPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = 40_000_000


def burn(n: int) -> float:
    s = 0.0
    for i in range(n):
        s += math.sqrt((i % 1000) + 1.5)
    return s


def main() -> None:
    out = {}
    for procs in (1, 2, 4, 8, 16, 32):
        per = WORK // procs
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            with ProcessPoolExecutor(max_workers=procs) as ex:
                list(ex.map(burn, [per] * procs))
            best = min(best, time.time() - t0)
        out[str(procs)] = {
            "wall_s": round(best, 3),
            "throughput_mops": round(WORK / best / 1e6, 1),
        }
    t = {k: v["throughput_mops"] for k, v in out.items()}
    report = {
        "workload": "pure-python sqrt loop, one process per worker",
        "levels": out,
        "eff_2_to_8": round(t["8"] / t["2"] / 4.0, 3),
        "eff_8_to_32": round(t["32"] / t["8"] / 4.0, 3),
        "note": (
            "hardware ceiling for ANY 4x core-scaling demo on this host; "
            "the dedup scaling bench must pick (N, 4N) inside the linear "
            "region to measure the pipeline rather than the silicon"
        ),
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(REPO, "CPU_CEILING.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
