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


def test_pair_orientation_is_real_url_order(spark):
    """pair_reasons' contract (verify.py: a = lexicographically-smaller
    url) must hold in PRODUCTION, where channels order pairs by the
    opaque uid: the asymmetric gates (diacritics, preferred-superset)
    must not flip with the hash width. Every verified pair row is
    checked at both uid widths."""
    pages, _truth, sources = corpus_dataframes(spark, n_docs=300, seed=11)
    for bits in (64, 128):
        res = run_dedup(
            pages, DedupConfig(uid_bits=bits), sources=sources,
            persist_pairs=True,
        )
        rows = res.pairs.select("a_real_url", "b_real_url").collect()
        assert rows, "corpus must produce candidate pairs"
        assert all(r["a_real_url"] < r["b_real_url"] for r in rows), bits
        res.release()


def test_custom_rule_column_participates(spark):
    """A field_rules entry on a column OUTSIDE the built-in optional
    set must ride the feature table and gate the pair (it used to
    raise an unresolved-column error at plan time)."""
    text = (
        "the fast key order sort table scan merge part window small hash "
        "join batch stream spark dup group query row data slow filter"
    )
    ts = datetime.datetime(2024, 1, 1)

    def pages_with_subjects(subj_b):
        return spark.createDataFrame(
            [
                ("https://a.example/p/1", ts, text, "fi", ["history"]),
                ("https://b.example/p/2", ts, text + " x", "fi", subj_b),
            ],
            "url string, warc_ts timestamp, text string, lang string,"
            " subjects array<string>",
        )

    rules = {"subjects": ["identical"]}
    cfg = DedupConfig(field_rules=rules)
    # identical subjects → pair merges (1 survivor)
    same = run_dedup(pages_with_subjects(["history"]), cfg, persist=False)
    assert same.survivors.count() == 1
    # mismatching subjects → the custom rule blocks the merge
    diff = run_dedup(pages_with_subjects(["cooking"]), cfg, persist=False)
    assert diff.survivors.count() == 2


def test_empty_norm_text_does_not_fuse(spark):
    """Docs whose NORMALIZED text is empty (every char outside the
    normalizer alphabet) must not collapse into one exact family;
    byte-identical raw texts still dedup via the raw fallback key."""
    ts = datetime.datetime(2024, 1, 1)
    pages = spark.createDataFrame(
        [
            ("https://zh.example/1", ts, "你好世界", "zh"),
            ("https://zh.example/2", ts, "完全不同的内容", "zh"),
            ("https://zh.example/3", ts, "你好世界", "zh"),  # raw dup of /1
        ],
        "url string, warc_ts timestamp, text string, lang string",
    )
    res = run_dedup(pages, DedupConfig(), persist=False)
    assign = {r["url"]: r["cluster_id"] for r in res.assignments.collect()}
    assert assign["https://zh.example/1"] == assign["https://zh.example/3"]
    assert assign["https://zh.example/1"] != assign["https://zh.example/2"]


def test_exact_groups_raw_fallback_length_factor(spark):
    """On the production narrow path (prepare_clean: text dropped,
    raw_hash + text_len kept) the exact-group second factor must be the
    RAW text length, not the length of the hash string — and identical
    raw texts must still group while different-length CJK docs cannot
    share a group even under a hypothetical hash collision."""
    import datetime

    from dedup.candidates import exact_groups
    from dedup.config import DedupConfig
    from dedup.pipeline import prepare_clean
    from dedup.schema import PAGES_SCHEMA

    ts = datetime.datetime(2024, 1, 1)

    def row(url, text):
        return (url, ts, b"<html>", text, "zh", [], [], [], ["h"], None)

    pages = spark.createDataFrame(
        [row("https://c/1", "你好世界"), row("https://c/2", "你好世界"),
         row("https://c/3", "天地玄黄宇宙")],
        PAGES_SCHEMA,
    )
    for bits in (64, 128):
        cfg = DedupConfig(uid_bits=bits)
        clean = prepare_clean(pages, uid_bits=bits)
        assert "text" not in clean.columns
        groups = exact_groups(clean, cfg).collect()
        rep = {r["url"]: r["rep_url"] for r in groups}
        assert rep["https://c/1"] == rep["https://c/2"] == "https://c/1"
        assert rep["https://c/3"] == "https://c/3"
    # uid_bits=128 narrow path carries a full md5, not a rehashed 64-bit
    c128 = prepare_clean(pages, uid_bits=128)
    val = c128.select("raw_hash").first()[0]
    assert isinstance(val, str) and len(val) == 32


def test_auto_shuffle_partitions_rule():
    """Constant-partition-SIZE sizing: reproduces the recorded scaling
    protocol at every probe size and floors at the core count."""
    from dedup.session import auto_shuffle_partitions

    assert auto_shuffle_partitions(2_000_000, min_partitions=8) == 16
    assert auto_shuffle_partitions(4_000_000, min_partitions=8) == 32
    # small corpora keep every core fed instead of starving parallelism
    assert auto_shuffle_partitions(2_000, min_partitions=8) == 8
    assert auto_shuffle_partitions(2_000, min_partitions=32) == 32
    # overridable target (docs much larger than the synthetic ~1 KB)
    assert auto_shuffle_partitions(
        1_000_000, min_partitions=4, target_docs_per_partition=50_000
    ) == 20
    assert auto_shuffle_partitions(0, min_partitions=4) == 4
