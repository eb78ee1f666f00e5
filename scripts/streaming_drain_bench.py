"""Per-drain cost of the streaming verify tail: incremental vs full.

Evidence for the round-5 incremental-tail work (VERDICT r4 #1): with K
successive file drops into the landing directory, the FULL tail
re-verifies and re-clusters the whole accumulated store on every drain
— O(corpus) per trigger — while the INCREMENTAL tail restricts
Jaccard + reason gates to candidate pairs not yet gated and folds new
edges into the prior assignments — O(delta) per trigger. At the
100-TB design point the store is the whole crawl and a drain is one
ingest tick, so the per-drain slope is the number that decides whether
streaming ingest is viable at all.

Protocol: one seeded corpus, split round-robin into K parquet drops
(round-robin so near-dup partners usually land in DIFFERENT drops and
late drains keep discovering cross-drop pairs — the expensive shape).
For each mode the same drops land one at a time; every landing is one
`run_streaming_dedup` invocation (streams resume from their
checkpoints in both modes — the difference between modes is purely the
tail). Reports per-drain wall + candidate counters and asserts the
final assignments are fingerprint-identical across modes.

Usage: python scripts/streaming_drain_bench.py --docs 40000 --drops 4
Writes one JSON line to stdout; --record-as KEY appends it under KEY
in BENCH_SCALING.json style into the file given by --record-file.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dedup.config import DedupConfig  # noqa: E402
from dedup.corpus import corpus_dataframes  # noqa: E402
from dedup.session import get_spark  # noqa: E402
from dedup.streaming import run_streaming_dedup  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=40_000)
    ap.add_argument("--drops", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--workdir", default="/tmp/drain_bench")
    ap.add_argument("--record-file")
    ap.add_argument("--record-as")
    args = ap.parse_args()

    spark = get_spark(
        "drain-bench", master=f"local[{args.cores}]",
        shuffle_partitions=max(8, args.cores),
    )
    shutil.rmtree(args.workdir, ignore_errors=True)
    stage = f"{args.workdir}/drops"
    pages, _truth, sources = corpus_dataframes(spark, args.docs, args.seed)
    # deterministic round-robin split on a url hash, one parquet file
    # per drop so maxFilesPerTrigger=1 drains exactly one drop per tick
    pages = pages.withColumn(
        "_drop", F.pmod(F.xxhash64("url"), F.lit(args.drops))
    )
    for k in range(args.drops):
        pages.filter(F.col("_drop") == k).drop("_drop").coalesce(1) \
            .write.mode("overwrite").parquet(f"{stage}/{k}")

    cfg = DedupConfig()
    # throwaway warmup: the FIRST streaming invocation in a session pays
    # stream-machinery + codegen init that would be charged to whichever
    # mode runs first; drain a 2-row drop on a scratch workdir
    warm = f"{args.workdir}/warmup"
    os.makedirs(f"{warm}/src", exist_ok=True)
    pages.drop("_drop").limit(2).coalesce(1).write.mode("overwrite") \
        .parquet(f"{warm}/stage")
    for f in os.listdir(f"{warm}/stage"):
        if f.endswith(".parquet"):
            shutil.copy(f"{warm}/stage/{f}", f"{warm}/src/drop-0.parquet")
    run_streaming_dedup(
        spark, f"{warm}/src", f"{warm}/work", cfg, sources=sources,
        max_files_per_trigger=1, timeout_s=1800,
    ).release()

    result: dict = {
        "docs": args.docs, "drops": args.drops, "cores": args.cores,
    }
    fingerprints = {}
    for mode in ("incremental", "full"):
        src = f"{args.workdir}/{mode}/src"
        work = f"{args.workdir}/{mode}/work"
        os.makedirs(src, exist_ok=True)
        walls, cand_total, cand_new = [], [], []
        splits: dict[str, list] = {
            "t_streams_s": [], "t_tail_build_s": [], "t_save_s": []
        }
        res = None
        for k in range(args.drops):
            for f in os.listdir(f"{stage}/{k}"):
                if f.endswith(".parquet"):
                    shutil.copy(f"{stage}/{k}/{f}", f"{src}/drop-{k}.parquet")
            t: dict = {}
            t0 = time.time()
            if res is not None:
                res.release()
            res = run_streaming_dedup(
                spark, src, work, cfg, sources=sources,
                max_files_per_trigger=1,
                incremental=(mode == "incremental"), timings=t,
                timeout_s=1800,
            )
            # one action drives the whole tail DAG
            n_assign = res.assignments.count()
            walls.append(round(time.time() - t0, 2))
            cand_total.append(t.get("n_cand_total"))
            cand_new.append(t.get("n_cand_new"))
            for name in splits:
                splits[name].append(t.get(name))
            print(
                f"[{mode}] drain {k}: wall={walls[-1]}s "
                f"cand={cand_total[-1]} new={cand_new[-1]} "
                f"assign={n_assign}",
                file=sys.stderr,
            )
        row = res.assignments.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("url", "cluster_id")).alias("h"),
        ).collect()[0]
        fingerprints[mode] = (row["n"], row["h"])
        res.release()
        result[mode] = {
            "drain_walls_s": walls,
            "n_cand_total": cand_total,
            "n_cand_new": cand_new,
            "t_streams_s": splits["t_streams_s"],
            "t_tail_build_s": splits["t_tail_build_s"],
            "t_save_s": splits["t_save_s"],
        }
    result["outputs_identical"] = (
        fingerprints["incremental"] == fingerprints["full"]
    )
    result["assign_rows"] = fingerprints["full"][0]
    inc, full = result["incremental"], result["full"]
    # slope evidence: last-drain wall relative to the first
    result["last_over_first"] = {
        "incremental": round(
            inc["drain_walls_s"][-1] / inc["drain_walls_s"][0], 3
        ),
        "full": round(
            full["drain_walls_s"][-1] / full["drain_walls_s"][0], 3
        ),
    }
    print(json.dumps(result))
    if args.record_file and args.record_as:
        data = {}
        if os.path.exists(args.record_file):
            with open(args.record_file) as f:
                data = json.load(f)
        data[args.record_as] = result
        with open(args.record_file, "w") as f:
            json.dump(data, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
