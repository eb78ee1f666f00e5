"""Fixed-cost (driver/planning/orchestration) microbench.

Runs the full run_dedup + survivors.count() on a TINY corpus where
executor work is negligible, so wall ≈ the pipeline's fixed cost:
Catalyst analysis/optimization/physical planning, job scheduling,
python-worker round-trips. This is the dominant term of bench.py's q1
(5000 docs) and roughly half of q2 (30k docs) — see OPTIMIZATION_r06.md.

Usage:
  python scripts/fixed_cost_bench.py [--docs 500] [--n 6] [--conf k=v ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500)
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    from dedup.config import DedupConfig
    from dedup.corpus import corpus_dataframes
    from dedup.pipeline import run_dedup
    from dedup.session import get_spark

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark(
        "fixed-cost", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus, extra_conf=extra or None,
    )
    cfg = DedupConfig()
    pages, _t, sources = corpus_dataframes(spark, args.docs, seed=7)
    pages = pages.cache()
    pages.count()

    walls, splits, jobs = [], [], []
    st = spark.sparkContext.statusTracker()
    for i in range(args.n):
        spark.sparkContext.setJobGroup(f"fc{i}", f"fixed-cost rep {i}")
        timings: dict = {}
        t0 = time.time()
        res = run_dedup(pages, cfg, sources=sources, timings=timings)
        res.survivors.count()
        walls.append(round(time.time() - t0, 3))
        jobs.append(len(st.getJobIdsForGroup(f"fc{i}")))
        res.release()
        splits.append(timings)
    print(json.dumps({
        "docs": args.docs, "n": args.n, "walls": walls,
        "min": min(walls), "jobs": jobs, "splits": splits, "conf": extra,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
