"""End-to-end dedup on the planted synthetic corpus (SURVEY.md §5 item 3),
run with the PRODUCTION channel set (LSH + exact + SimHash bypass +
substring bypass — cli.py's default).

Asserts:
  * dup-pair recall ≥ 0.99 over planted exact/near/simhash_near/substring
    kinds (BASELINE.json metric) — measured as: dup doc lands in the same
    cluster as its base. simhash_near (word-order shuffles) and substring
    (containment) dups sit BELOW the 0.8 char-shingle Jaccard threshold,
    so their channels are load-bearing here.
  * false-merge control: boilerplate and unique docs stay unmerged.
  * source-overlap guard blocks the direct pair for source_blocked docs
    with the reference's exact message.
  * rule/count/extent gates block their planted ≥0.8-Jaccard kinds with
    the reference's exact messages.
  * quarantined docs never reach pairing.
  * survivor selection is deterministic and follows the preference order.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.corpus import corpus_dataframes
from dedup.pipeline import prepare_clean, run_dedup
from dedup.simhash import simhash_channel
from dedup.suffix import substring_edges


@pytest.fixture(scope="module")
def result(spark):
    # low bucket cap so the boilerplate template demonstrably engages the
    # hot-bucket star fallback at this corpus size
    cfg = DedupConfig(max_bucket_size=8)
    pages, truth, sources = corpus_dataframes(spark, n_docs=800, seed=42)
    # production wiring (cli.py): one persisted narrow clean shared by
    # the channels and the pipeline
    clean = prepare_clean(pages).persist()
    sim_pairs, _ = simhash_channel(clean, cfg)
    sub_edges, _ = substring_edges(clean, cfg)
    res = run_dedup(
        pages, cfg, sources=sources,
        bypass_jaccard_channels=[
            sim_pairs.select("url_a", "url_b"),
            sub_edges.select("url_a", "url_b"),
        ],
        clean=clean,
    )
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
        truth.filter(
            F.col("dup_kind").isin("exact", "near", "simhash_near", "substring")
        )
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


def _blocked_kind_pairs(res, truth, kind):
    blocked = truth.filter(F.col("dup_kind") == kind).select("url")
    n_blocked = blocked.count()
    assert n_blocked > 0, f"no planted {kind} docs"
    pairs = (
        res.pairs.join(blocked.withColumnRenamed("url", "url_b"), "url_b")
        .select(res.pairs.columns)
        .unionByName(
            res.pairs.join(
                blocked.withColumnRenamed("url", "url_a"), "url_a"
            ).select(res.pairs.columns)
        )
    )
    return pairs


def test_rule_blocked_pairs_emit_stop_field_reason(result):
    # neitherHas on tracking_ids (checkFieldRequirements analogue,
    # validate-fields.js:74-82) must block ≥0.8-Jaccard pairs
    res, assign, truth = result
    pairs = _blocked_kind_pairs(res, truth, "rule_blocked")
    with_reason = pairs.filter(
        F.exists(
            "reasons",
            lambda r: r.contains("record has stop fields")
            & r.endswith("tracking_ids"),
        )
    )
    assert with_reason.count() > 0
    assert with_reason.filter(F.col("can_merge")).count() == 0


def test_count_blocked_pairs_emit_count_mismatch(result):
    # sameAuthorType analogue (mergeability-validators.js:123-131)
    res, assign, truth = result
    pairs = _blocked_kind_pairs(res, truth, "count_blocked")
    with_reason = pairs.filter(
        F.array_contains("reasons", "Field count mismatch for field headings")
    )
    assert with_reason.count() > 0
    assert with_reason.filter(F.col("can_merge")).count() == 0


def test_extent_blocked_pairs_emit_300a_reason(result):
    # same300TypeAndCount analogue (mergeability-validators.js:152-178):
    # both the count-differ and could-not-infer paths are planted
    res, assign, truth = result
    pairs = _blocked_kind_pairs(res, truth, "extent_blocked")
    count_differ = pairs.filter(
        F.exists(
            "reasons",
            lambda r: r.startswith(
                "Records have different inferred count of types"
            ),
        )
    )
    could_not = pairs.filter(
        F.array_contains("reasons", "Could not infer the meaning of 300a.")
    )
    assert count_differ.count() > 0
    assert could_not.count() > 0
    assert count_differ.filter(F.col("can_merge")).count() == 0
    assert could_not.filter(F.col("can_merge")).count() == 0


def test_blocked_kinds_never_join_base_cluster(result):
    # the planted gate-violating docs must not land in their base's
    # cluster (their truth id IS the base cluster id)
    res, assign, truth = result
    blocked = truth.filter(
        F.col("dup_kind").isin("rule_blocked", "count_blocked", "extent_blocked")
    )
    base_urls = (
        truth.filter(F.col("dup_kind") == "unique")
        .select(F.col("true_cluster_id").alias("cid"), F.col("url").alias("base_url"))
    )
    joined = (
        blocked.select(F.col("true_cluster_id").alias("cid"),
                       F.col("url").alias("dup_url"))
        .join(base_urls, "cid")
        .join(assign.select(F.col("url").alias("dup_url"),
                            F.col("cluster_id").alias("c1")), "dup_url")
        .join(assign.select(F.col("url").alias("base_url"),
                            F.col("cluster_id").alias("c2")), "base_url")
    )
    assert joined.count() > 0
    assert joined.filter(F.col("c1") == F.col("c2")).count() == 0


def test_stat_parity_columns_present(result):
    # the reference's non-fatal STAT 245] / STAT DIAC] logging analogue
    # rides on every pair row and never affects can_merge
    res, assign, truth = result
    row = res.pairs.agg(
        F.sum(F.size("stat_245_msgs")).alias("n245"),
        F.sum(F.size("stat_diacritics_msgs")).alias("ndiac"),
    ).collect()[0]
    assert row["ndiac"] is not None  # columns exist and aggregate


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


def test_release_unpersists_all_pinned_caches(spark):
    """DedupResult.release() must drop every cache the run pinned —
    long-lived sessions (resume loops, notebooks) otherwise accumulate
    blocks until eviction degrades the caches that matter."""
    pages, _truth, sources = corpus_dataframes(spark, n_docs=200, seed=7)
    res = run_dedup(pages, DedupConfig(), sources=sources,
                    persist_pairs=True)
    res.survivors.count()  # materialize the caches
    assert len(res.cached) >= 6  # clean/groups/sigs/hot/feats/pairs/rep_sh
    # every registered frame must BE the persisted object (unpersisting a
    # derived projection would not release its parent's cache) — a
    # vacuous registration would show storageLevel NONE here
    assert all(
        df.storageLevel.useMemory or df.storageLevel.useDisk
        for df in res.cached
    )
    res.release()
    assert all(
        not (df.storageLevel.useMemory or df.storageLevel.useDisk)
        for df in res.cached
    )
    res.release()  # idempotent


def test_no_registry_pins_no_channel_caches(spark):
    """Channel helpers called WITHOUT a cache_registry must not persist
    anything: with nobody to release them, those caches would pin for
    the session lifetime (the round-3 driver_queries leak)."""
    from dedup.candidates import pairs_from_buckets
    from dedup.minhash import explode_bands, signatures
    from dedup.normalize import quarantine_filter, with_normalized
    from dedup.simhash import simhash_channel
    from dedup.suffix import lcp_pairs_distributed, substring_candidates

    jvm_sc = spark.sparkContext._jsc.sc()

    def cached_ids() -> set[int]:
        # compare RDD-id SETS, not counts: earlier tests' non-blocking
        # unpersist / ContextCleaner may remove entries concurrently,
        # which only ever SHRINKS the set — new ids are what a leak adds
        it = jvm_sc.getPersistentRDDs().keys().iterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    # snapshot AFTER corpus creation: corpus_dataframes re-roots its
    # frames on an eager localCheckpoint (plan-size fix, r6), whose RDD
    # blocks are caller-owned — they unpin via ContextCleaner when the
    # caller drops the frames, unlike an ownerless channel persist
    pages, _truth, _sources = corpus_dataframes(spark, n_docs=120, seed=11)
    clean = quarantine_filter(with_normalized(pages))
    cfg = DedupConfig()

    base = cached_ids()

    def leaked() -> set[int]:
        return cached_ids() - base

    pairs, _hot = pairs_from_buckets(
        explode_bands(signatures(clean, cfg), cfg),
        ["band_idx", "band_key"], cfg,
    )
    pairs.count()
    assert not leaked(), "pairs_from_buckets leaked a cache"

    sim_pairs, _ = simhash_channel(clean, cfg)
    sim_pairs.count()
    assert not leaked(), "simhash_channel leaked a cache"

    sub_pairs, _ = substring_candidates(clean, cfg)
    sub_pairs.count()
    assert not leaked(), "substring_candidates leaked a cache"

    lcp_pairs_distributed(clean, cfg).count()
    assert not leaked(), "lcp_pairs_distributed leaked a cache"

    # the registry path still persists (and the caller releases)
    reg: list = []
    sim_pairs2, _ = simhash_channel(clean, cfg, cache_registry=reg)
    sim_pairs2.count()
    assert len(reg) >= 1 and leaked()
    for df in reg:
        df.unpersist(blocking=True)
    assert not leaked()
