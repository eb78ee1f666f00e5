"""Production wiring of the survivor-preference + surrogate-key options:

* authority_sources (preferredRecordInFENNI analogue,
  mergeability-validators.js:69-81) must be reachable from run_dedup —
  an authority-source member beats a fresher, longer non-authority
  member, per the §2.3.3 preference order.
* uid_bits=128 (md5 surrogate) must produce cluster assignments and
  survivors identical to the 64-bit xxhash64 path — every operator
  treats the uid as an opaque orderable key.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.corpus import corpus_dataframes
from dedup.pipeline import run_dedup


def _two_member_cluster(spark):
    text = (
        "the fast key order sort table scan merge part window small hash "
        "join batch stream spark dup group query row data slow filter"
    )
    ts = datetime.datetime(2024, 1, 1)
    pages = spark.createDataFrame(
        [
            # A: fresher AND longer raw text (trailing spaces normalize
            # away) — wins on every non-authority criterion
            ("https://a.example/p/1", ts + datetime.timedelta(days=9),
             text + "   ", "fi"),
            ("https://b.example/p/2", ts, text, "fi"),
        ],
        "url string, warc_ts timestamp, text string, lang string",
    )
    sources = spark.createDataFrame(
        [
            ("https://a.example/p/1", "crawl-x", "x:1"),
            ("https://b.example/p/2", "auth-src", "s:2"),
        ],
        "url string, source string, source_local_id string",
    )
    return pages, sources


def test_authority_source_flips_survivor(spark):
    pages, sources = _two_member_cluster(spark)
    base = run_dedup(pages, DedupConfig(), sources=sources, persist=False)
    r = base.survivors.collect()
    assert len(r) == 1 and r[0]["survivor_url"] == "https://a.example/p/1"

    cfg = DedupConfig(authority_sources=("auth-src",))
    auth = run_dedup(pages, cfg, sources=sources, persist=False)
    r = auth.survivors.collect()
    assert len(r) == 1 and r[0]["survivor_url"] == "https://b.example/p/2"


def test_uid_128_identical_assignments_and_survivors(spark):
    pages, truth, sources = corpus_dataframes(spark, n_docs=300, seed=11)
    res64 = run_dedup(pages, DedupConfig(), sources=sources)
    res128 = run_dedup(pages, DedupConfig(uid_bits=128), sources=sources)
    a64 = {(r["url"], r["cluster_id"]) for r in res64.assignments.collect()}
    a128 = {(r["url"], r["cluster_id"]) for r in res128.assignments.collect()}
    assert a64 == a128
    s64 = {
        (r["cluster_id"], r["survivor_url"], tuple(r["merged_from"]))
        for r in res64.survivors.collect()
    }
    s128 = {
        (r["cluster_id"], r["survivor_url"], tuple(r["merged_from"]))
        for r in res128.survivors.collect()
    }
    assert s64 == s128
    res64.release()
    res128.release()


def test_warm_thread_off_identical_results(spark):
    # warm_caches_async=False (cluster-debugging mode: every job on the
    # foreground call stack) must not change any output
    pages, truth, sources = corpus_dataframes(spark, n_docs=200, seed=5)
    on = run_dedup(pages, DedupConfig(), sources=sources)
    off = run_dedup(
        pages, DedupConfig(warm_caches_async=False), sources=sources
    )
    a_on = {(r["url"], r["cluster_id"]) for r in on.assignments.collect()}
    a_off = {(r["url"], r["cluster_id"]) for r in off.assignments.collect()}
    assert a_on == a_off
    on.release()
    off.release()
