"""Benchmark harness — prints ONE JSON line for the driver.

Runs the production (fast hash mode) pipeline + headline operators at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. The throughput metric (docs/sec) is measured
on the deterministic synthetic corpus (seeded; no external data) at a
size scaled to the sf tier, per BASELINE.md's bench protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.corpus import corpus_dataframes
from dedup.embeddings import matmul_topk
from dedup.normalize import quarantine_filter, with_normalized
from dedup.pages import load_pages, pages_sources
from dedup.pipeline import run_dedup
from dedup.session import get_spark
from dedup.simhash import simhash_candidates, with_simhash
from dedup.suffix import substring_edges
from dedup.textstats import with_textstats

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# synthetic corpus size per sf tier (sf0.1 → 30k docs)
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
N_SYNTH = int(os.environ.get("DEDUP_BENCH_DOCS", str(max(int(300_000 * SF), 2000))))


def main() -> None:
    spark = get_spark("dedup-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    cfg = DedupConfig()
    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t = time.time()
        out = fn()
        timings[name] = round(time.time() - t, 3)
        return out

    # q1: full fast-mode dedup of the driver documents table
    def _q1():
        pages = load_pages(spark, SF_DIR)
        sources = pages_sources(pages)
        res = run_dedup(pages, cfg, sources=sources)
        return res.survivors.count()

    timed("q1_dedup_documents", _q1)

    # q2: synthetic-corpus dedup at bench scale → docs/sec metric
    spages, _truth, ssources = corpus_dataframes(spark, N_SYNTH, seed=42)
    spages = spages.repartition(int(CPUS)).cache()
    n_docs = spages.count()
    t0 = time.time()
    sres = run_dedup(spages, cfg, sources=ssources)
    n_clusters = sres.survivors.count()
    dedup_wall = time.time() - t0
    timings["q2_dedup_synth"] = round(dedup_wall, 3)

    # q3: SimHash channel on the synthetic corpus
    clean = quarantine_filter(with_normalized(spages))
    def _simhash():
        sim = with_simhash(clean, cfg).select("url", "simhash")
        pairs, _hot = simhash_candidates(sim, cfg)
        return pairs.count()
    timed("q3_simhash_channel", _simhash)

    # q4: substring (winnowing) channel on the synthetic corpus
    timed("q4_substring_channel",
          lambda: substring_edges(clean, cfg)[0].count())

    # q7: distributed suffix-array shared-passage pass (synthetic corpus)
    from dedup.suffix import lcp_pairs_distributed
    timed("q7_lcp_distributed",
          lambda: lcp_pairs_distributed(clean, cfg).count())

    # q5: text stats over the documents table
    timed("q5_textstats",
          lambda: with_textstats(load_pages(spark, SF_DIR))
          .agg(F.sum("n_tokens"), F.sum("quality_micro")).collect())

    # q6: ANN top-k over embeddings (BLAS matmul path)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qpdf = emb.filter(F.col("vec_id") < 64).toPandas()
    qm = np.vstack(qpdf["embedding"].to_numpy())
    timed("q6_ann_matmul_topk",
          lambda: matmul_topk(emb, qm, qpdf["vec_id"].to_numpy(), k=10).count())

    # q8: LSH-bucketed all-pairs ANN (multi-table, multi-probe)
    from dedup.embeddings import lsh_bucketed_topk
    timed("q8_ann_lsh_topk",
          lambda: lsh_bucketed_topk(emb, k=10).count())

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "dedup_bench_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF,
        "synthetic_docs": n_docs,
        "synthetic_clusters": n_clusters,
        "dedup_docs_per_sec": round(n_docs / dedup_wall, 1),
        "cpus": int(CPUS),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
