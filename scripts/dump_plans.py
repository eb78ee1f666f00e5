"""Dump `.explain("formatted")` for declared driver queries (and the
bench dataflows) to plans/<tag>/<name>_<suffix>.txt — the judge-facing
plan evidence for optimization rounds.

Usage:
  python scripts/dump_plans.py --tag r06 --suffix before [--queries a,b]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r06")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--queries", default=None,
                    help="comma list; default: all declared queries")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from dedup.driver_queries import QUERIES
    from dedup.session import get_spark

    spark = get_spark("dump-plans", master="local[8]", shuffle_partitions=8)
    names = (
        args.queries.split(",") if args.queries else list(QUERIES)
    )
    out_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = QUERIES[name]
        try:
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record, keep dumping
            plan = f"PLAN DUMP FAILED: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
