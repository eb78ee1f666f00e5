"""Hardware parallel-scaling ceiling probe (ALU + memory bandwidth).

Measures two embarrassingly-parallel, Spark-independent workloads at
1..32 processes and writes CPU_CEILING.json:

  * alu — pure-python sqrt loop (register/ALU bound, negligible memory
    traffic): the ceiling for compute-bound pipeline phases.
  * membw — 64 MB streaming memcpy per process (working set >> LLC):
    the ceiling for shuffle/cache/Arrow-transfer phases, which share
    ONE memory bus on a single host. On a real cluster each executor
    host brings its own memory bus, so N→4N executors scales bandwidth
    4×; the single-host stand-in cannot, and bandwidth-bound phases are
    capped at the membw efficiency measured here no matter how the
    pipeline is written.

Motivates the scaling-bench core-count choice: the north-rule criterion
is throughput scaling ≥ 0.8 from N to 4N EXECUTORS; the sandbox
stand-in local[N] → local[4N] is only meaningful where the host can
physically deliver 4× of the binding resource. The probe documents
where each ceiling sits so the (N, 4N) pair is chosen inside the linear
region and the pipeline number is read against the right ceiling.
"""

from __future__ import annotations

import json
import math
import multiprocessing as mp
import os
import time
from concurrent.futures import ProcessPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = 40_000_000
MEM_MB = 64
MEM_ITERS = 40


def burn(n: int) -> float:
    s = 0.0
    for i in range(n):
        s += math.sqrt((i % 1000) + 1.5)
    return s


def _mem_worker(iters: int, conn) -> None:
    import numpy as np

    rng = np.random.default_rng(0)
    buf = rng.integers(0, 255, MEM_MB * 1024 * 1024, dtype=np.uint8)
    out = np.empty_like(buf)
    t0 = time.time()
    for _ in range(iters):
        np.copyto(out, buf)
        buf[0] ^= 1  # defeat any page-level copy elision
    conn.send(time.time() - t0)


def mem_bandwidth(procs: int) -> float:
    """Aggregate streaming GB/s (read+write) across `procs` processes."""
    conns, ps = [], []
    for _ in range(procs):
        pc, cc = mp.Pipe()
        p = mp.Process(target=_mem_worker, args=(MEM_ITERS, cc))
        p.start()
        ps.append(p)
        conns.append(pc)
    walls = [c.recv() for c in conns]
    for p in ps:
        p.join()
    return procs * MEM_ITERS * MEM_MB / 1024 * 2 / max(walls)


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
    mem = {}
    for procs in (1, 2, 4, 8, 16, 32):
        best = 0.0
        for _ in range(3):
            best = max(best, mem_bandwidth(procs))
        mem[str(procs)] = {"agg_gbps": round(best, 1)}

    t = {k: v["throughput_mops"] for k, v in out.items()}
    m = {k: v["agg_gbps"] for k, v in mem.items()}
    report = {
        "alu": {
            "workload": "pure-python sqrt loop, one process per worker",
            "levels": out,
            "eff_2_to_8": round(t["8"] / t["2"] / 4.0, 3),
            "eff_8_to_32": round(t["32"] / t["8"] / 4.0, 3),
        },
        "membw": {
            "workload": f"{MEM_MB} MB streaming memcpy per process "
                        "(best of 3, read+write GB/s aggregated)",
            "levels": mem,
            "eff_2_to_8": round(m["8"] / m["2"] / 4.0, 3),
            "eff_8_to_32": round(m["32"] / m["8"] / 4.0, 3),
        },
        # kept at top level for backward compat with scaling_bench.py
        "eff_2_to_8": round(t["8"] / t["2"] / 4.0, 3),
        "eff_8_to_32": round(t["32"] / t["8"] / 4.0, 3),
        "note": (
            "hardware ceilings for ANY 4x core-scaling demo on this "
            "host: compute-bound phases are capped by `alu`, "
            "shuffle/cache/Arrow phases by `membw` (one shared memory "
            "bus; a real N->4N executor scale-up multiplies buses). "
            "The dedup scaling bench must pick (N, 4N) inside the "
            "linear region to measure the pipeline, not the silicon."
        ),
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(REPO, "CPU_CEILING.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
