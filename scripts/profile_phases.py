"""Per-phase scaling profiler (dev tool behind the scaling gate).

Times each pipeline phase with a forced action at a given core count so
the non-scaling phase is identifiable:

    python scripts/profile_phases.py --docs 200000 --cores 8
    python scripts/profile_phases.py --docs 200000 --cores 32

Forced materialization changes caching vs the production single-DAG run,
so absolute walls differ from scaling_bench; the per-phase RATIO between
core counts is the signal.
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
    ap.add_argument("--docs", type=int, default=200000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--shuffle-partitions", type=int, default=None,
                    help="fix across core counts to match scaling_bench")
    args = ap.parse_args()

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from dedup.session import get_spark
    from dedup.config import DedupConfig
    from dedup.corpus import corpus_dataframes
    from dedup.candidates import (
        exact_edges, exact_groups, lsh_candidates, representatives,
    )
    from dedup.minhash import explode_bands, signatures
    from dedup.normalize import quarantine_filter, with_normalized
    from dedup.pipeline import _estimate_filter, _jaccard_incl_exact
    from dedup.cluster import assignments_with_singletons, connected_components
    from dedup.verify import attach_features, pair_reasons, url_features, verified_edges

    parts = args.shuffle_partitions or args.cores
    spark = get_spark(
        f"profile-{args.cores}", master=f"local[{args.cores}]",
        shuffle_partitions=parts,
    )
    cfg = DedupConfig()
    pages, _t, sources = corpus_dataframes(spark, args.docs, seed=42)
    pages = pages.repartition(parts).persist()
    pages.count()

    phases: dict[str, float] = {}

    def mark(name: str, fn):
        t0 = time.time()
        out = fn()
        phases[name] = round(time.time() - t0, 2)
        print(f"[phase] {name}: {phases[name]:.2f}s", flush=True)
        return out

    clean = quarantine_filter(with_normalized(pages))
    clean = clean.withColumn("text_len", F.length("text")).drop("html", "text")
    clean = clean.persist(StorageLevel.MEMORY_AND_DISK)
    mark("normalize+persist", lambda: clean.count())

    keyed = clean.withColumn("uid", F.xxhash64("url"))
    kpages = keyed.select(
        F.col("uid").alias("url"), F.col("url").alias("real_url"),
        *[c for c in keyed.columns if c not in ("url", "uid")],
    )
    ids = keyed.select(F.col("url").alias("real_url"), F.col("uid"))

    groups = exact_groups(kpages, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    mark("exact_groups", lambda: groups.count())
    reps = representatives(groups)
    rep_pages = kpages.join(reps, "url")

    sigs = signatures(rep_pages, cfg).select("url", "sig").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    mark("signatures", lambda: sigs.count())

    bands = explode_bands(sigs, cfg)
    raw_candidates, hot = lsh_candidates(bands, cfg)
    raw_candidates = raw_candidates.persist(StorageLevel.MEMORY_AND_DISK)
    mark("bands+candidates", lambda: raw_candidates.count())

    exact_pairs = exact_edges(groups).select("url_a", "url_b")
    all_candidates = raw_candidates.unionByName(exact_pairs).distinct()
    if cfg.estimate_prefilter and cfg.hash_mode == "fast":
        all_candidates = _estimate_filter(all_candidates, sigs, groups, cfg)
    all_candidates = all_candidates.persist(StorageLevel.MEMORY_AND_DISK)
    mark("estimate_filter", lambda: all_candidates.count())

    feats = url_features(kpages, None).drop("sources")
    srcjoin = (
        sources.join(ids, sources.url == ids.real_url)
        .groupBy("uid")
        .agg(F.sort_array(F.collect_set("source")).alias("sources"))
        .withColumnRenamed("uid", "url")
    )
    feats = feats.join(srcjoin, "url", "left").withColumn(
        "sources", F.coalesce("sources", F.array().cast("array<string>"))
    )
    with_j = _jaccard_incl_exact(all_candidates, rep_pages, groups, cfg)
    rule_columns = {
        t: (f"a_{t}", f"b_{t}")
        for t in sorted(cfg.field_rules)
        if t in kpages.columns
    }
    count_columns = {
        t: (f"a_{t}", f"b_{t}") for t in cfg.count_fields if t in kpages.columns
    }
    pairs = pair_reasons(
        attach_features(with_j, feats), cfg, None,
        rule_columns=rule_columns or None,
        count_columns=count_columns or None,
    )
    edges = (
        verified_edges(pairs, cfg, "lsh")
        .select("url_a", "url_b").distinct()
    )
    edges = mark("verify+edges", lambda: edges.localCheckpoint(eager=True))

    assign = mark("cc", lambda: connected_components(edges, verbose=True))
    assign = assignments_with_singletons(assign, kpages.select("url"))
    members_uid = assign.join(feats, "url")
    labels = members_uid.groupBy("cluster_id").agg(
        F.min("real_url").alias("cluster_label")
    )
    members = (
        members_uid.join(labels, "cluster_id")
        .drop("cluster_id", "url")
        .withColumnRenamed("real_url", "url")
        .withColumnRenamed("cluster_label", "cluster_id")
    )
    row = mark(
        "assign_agg",
        lambda: members.select("url", "cluster_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("url", "cluster_id")).alias("h"),
        ).collect()[0],
    )
    total = sum(phases.values())
    print(json.dumps({
        "cores": args.cores, "docs": args.docs, "phases": phases,
        "total": round(total, 2),
        "assign_rows": int(row["n"]), "assign_hash": int(row["h"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
