"""Round-6 profiling harness — NOT the frozen driver bench (bench.py).

Per the optimization guide §1: isolate each expensive query with the
noop sink, capture phase splits (run_dedup's timings hook), and label
jobs so any UI/event-log inspection maps back to operators. Numbers
from this file are cited in OPTIMIZATION_r06.md; the driver's protocol
numbers still come from bench.py, which stays untouched.

Usage:
  python bench_extra.py [--docs 30000] [--cpus 32] [--what q2,q3,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=30000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--what", type=str, default="q1,q2,q3,q4,q7,q8,q9")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--conf", action="append", default=[],
                    help="extra spark conf k=v (repeatable)")
    args = ap.parse_args()
    what = set(args.what.split(","))

    from dedup.config import DedupConfig
    from dedup.corpus import corpus_dataframes
    from dedup.pages import load_pages, pages_sources
    from dedup.pipeline import run_dedup
    from dedup.session import auto_shuffle_partitions, get_spark

    parts = auto_shuffle_partitions(args.docs, min_partitions=args.cpus)
    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark(
        "bench-extra", master=f"local[{args.cpus}]", shuffle_partitions=parts,
        extra_conf=extra or None,
    )
    sc = spark.sparkContext
    cfg = DedupConfig()
    out: dict = {"docs": args.docs, "cpus": args.cpus}

    # warmup (same rationale as bench.py)
    t0 = time.time()
    wp, _wt, ws = corpus_dataframes(spark, 2000, seed=1)
    wres = run_dedup(wp, cfg, sources=ws)
    wres.survivors.count()
    wres.release()
    out["warmup_s"] = round(time.time() - t0, 2)

    if "q1" in what:
        walls = []
        for i in range(args.repeats):
            sc.setJobDescription(f"q1 rep{i}")
            timings: dict = {}
            t0 = time.time()
            pages = load_pages(spark, SF_DIR)
            res = run_dedup(pages, cfg, sources=pages_sources(pages),
                            timings=timings)
            res.survivors.count()
            timings["wall"] = round(time.time() - t0, 3)
            res.release()
            walls.append(timings)
        out["q1"] = walls

    spages, _t, ssources = corpus_dataframes(spark, args.docs, seed=42)
    spages = spages.repartition(args.cpus).cache()
    spages.count()

    sres = None
    if "q2" in what:
        walls = []
        for i in range(args.repeats):
            if sres is not None:
                sres.release()
            sc.setJobDescription(f"q2 rep{i}")
            timings = {}
            t0 = time.time()
            sres = run_dedup(spages, cfg, sources=ssources, timings=timings)
            sres.survivors.count()
            timings["wall"] = round(time.time() - t0, 3)
            walls.append(timings)
        out["q2"] = walls
    else:
        sres = run_dedup(spages, cfg, sources=ssources)
        sres.survivors.count()
    clean = sres.clean

    def timed_channel(name, fn):
        walls = []
        for i in range(args.repeats):
            reg: list = []
            sc.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            fn(reg)
            walls.append(round(time.time() - t0, 3))
            for df in reg:
                df.unpersist()
        out[name] = walls

    if "q3" in what:
        from dedup.simhash import simhash_channel
        timed_channel("q3", lambda reg: simhash_channel(
            clean, cfg, cache_registry=reg)[0].count())
    if "q4" in what:
        from dedup.suffix import substring_edges
        timed_channel("q4", lambda reg: substring_edges(
            clean, cfg, cache_registry=reg)[0].count())
    if "q7" in what:
        from dedup.suffix import lcp_pairs_distributed
        timed_channel("q7", lambda reg: lcp_pairs_distributed(
            clean, cfg, cache_registry=reg).count())

    sres.release()
    spages.unpersist()

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    if "q6" in what:
        qpdf = emb.filter(F.col("vec_id") < 64).toPandas()
        qm = np.vstack(qpdf["embedding"].to_numpy())
        from dedup.embeddings import matmul_topk
        timed_channel("q6", lambda reg: matmul_topk(
            emb, qm, qpdf["vec_id"].to_numpy(), k=10).count())
    if "q8" in what:
        from dedup.embeddings import lsh_bucketed_topk
        timed_channel("q8", lambda reg: lsh_bucketed_topk(
            emb, k=10, cache_registry=reg).count())
    if "q9" in what:
        from dedup.embeddings import ivf_topk
        timed_channel("q9", lambda reg: ivf_topk(
            emb, k=10, n_centroids=32, nprobe=6, cache_registry=reg).count())

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
