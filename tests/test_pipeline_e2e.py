"""End-to-end dedup on the planted synthetic corpus (SURVEY.md §5 item 3).

Asserts:
  * dup-pair recall ≥ 0.99 over planted exact/near/simhash_near kinds
    (BASELINE.json metric) — measured as: dup doc lands in the same
    cluster as its base.
  * false-merge control: boilerplate and unique docs stay unmerged.
  * source-overlap guard blocks the direct pair for source_blocked docs
    with the reference's exact message.
  * quarantined docs never reach pairing.
  * survivor selection is deterministic and follows the preference order.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.corpus import corpus_dataframes
from dedup.pipeline import run_dedup


@pytest.fixture(scope="module")
def result(spark):
    # low bucket cap so the boilerplate template demonstrably engages the
    # hot-bucket star fallback at this corpus size
    cfg = DedupConfig(max_bucket_size=8)
    pages, truth, sources = corpus_dataframes(spark, n_docs=800, seed=42)
    res = run_dedup(pages, cfg, sources=sources)
    assign = res.assignments.cache()
    truth = truth.cache()
    return res, assign, truth


def test_recall_on_planted_dups(result):
    res, assign, truth = result
    # map each dup url + its base cluster's base url to assigned clusters
    t = truth.alias("t")
    base_urls = (
        truth.filter(F.col("dup_kind") == "unique")
        .select(F.col("true_cluster_id").alias("cid"), F.col("url").alias("base_url"))
    )
    dups = (
        truth.filter(F.col("dup_kind").isin("exact", "near", "simhash_near"))
        .select(F.col("true_cluster_id").alias("cid"), F.col("url").alias("dup_url"))
        .join(base_urls, "cid")
    )
    a1 = assign.select(F.col("url").alias("dup_url"), F.col("cluster_id").alias("c1"))
    a2 = assign.select(F.col("url").alias("base_url"), F.col("cluster_id").alias("c2"))
    joined = dups.join(a1, "dup_url").join(a2, "base_url")
    total = joined.count()
    hit = joined.filter(F.col("c1") == F.col("c2")).count()
    assert total > 50
    recall = hit / total
    assert recall >= 0.99, f"dup-pair recall {recall:.4f} ({hit}/{total})"


def test_no_false_merges_for_boilerplate_and_unique(result):
    res, assign, truth = result
    labeled = assign.join(truth, "url")
    # cluster composition: no cluster may contain two different
    # true_cluster_ids among boilerplate/unique docs
    bad = (
        labeled.filter(F.col("dup_kind").isin("unique", "boilerplate"))
        .groupBy("cluster_id")
        .agg(F.countDistinct("true_cluster_id").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert bad == 0


def test_source_blocked_pairs_emit_reference_reason(result):
    res, assign, truth = result
    blocked = truth.filter(F.col("dup_kind") == "source_blocked").select("url")
    n_blocked = blocked.count()
    assert n_blocked > 0
    # the direct pair (dup, base) must carry a source-overlap reason
    pairs = res.pairs.join(
        blocked.withColumnRenamed("url", "url_b"), "url_b"
    ).union(
        res.pairs.join(blocked.withColumnRenamed("url", "url_a"), "url_a")
        .select(res.pairs.columns)
    )
    with_reason = pairs.filter(
        F.exists("reasons", lambda r: r.startswith("Both records have have LOW tag: "))
    )
    assert with_reason.count() > 0
    assert with_reason.filter(F.col("can_merge")).count() == 0


def test_quarantine_prefilter(result):
    res, assign, truth = result
    q = truth.filter(F.col("dup_kind") == "quarantine")
    assert q.count() > 0
    assert res.quarantined.join(q, "url").count() == q.count()
    assert res.clean.join(q, "url").count() == 0
    assert assign.join(q, "url").count() == 0


def test_hot_buckets_engaged(result):
    res, assign, truth = result
    # the boilerplate template must have produced at least one capped bucket
    assert res.hot_buckets.count() > 0


def test_survivor_determinism_and_preference(result, spark):
    res, assign, truth = result
    surv = res.survivors
    # one survivor per cluster, survivor belongs to merged_from
    assert surv.filter(~F.array_contains("merged_from", F.col("survivor_url"))).count() == 0
    # survivor has the max warc_ts among members with max flags ordering:
    # spot check — rerun selection and compare (determinism)
    surv2 = res.survivors
    a = surv.select("cluster_id", "survivor_url")
    b = surv2.select(
        F.col("cluster_id").alias("cluster_id2"), F.col("survivor_url").alias("s2")
    )
    j = a.join(b, a.cluster_id == b.cluster_id2)
    assert j.filter(F.col("survivor_url") != F.col("s2")).count() == 0
