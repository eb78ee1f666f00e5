"""The static-expression memo (dedup/exprcache.py): the r6 driver
fixed-cost cut. Expressions (never results) are cached per JVM gateway;
these tests pin (a) cache-hit behavior, (b) key sensitivity to the
structural signature, and (c) output equality across memoized calls —
the equivalence contract that let the optimization ship."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedup import exprcache
from dedup.config import DedupConfig
from dedup.survivor import select_survivors
from dedup.verify import pair_reasons, with_stat_parity


def test_memo_same_key_same_object():
    calls = []
    k = ("test-memo-basic-key",)
    exprcache._CACHE.pop(
        next((key for key in exprcache._CACHE if key[1:] == k), ("nope",)), None
    )
    v1 = exprcache.memo(k, lambda: calls.append(1) or object())
    v2 = exprcache.memo(k, lambda: calls.append(1) or object())
    assert v1 is v2
    assert len(calls) == 1


def test_memo_different_key_rebuilds():
    v1 = exprcache.memo(("test-memo-a",), object)
    v2 = exprcache.memo(("test-memo-b",), object)
    assert v1 is not v2


@pytest.fixture()
def pairs_df(spark):
    rows = [
        # url_a < url_b; b has diacritics but a doesn't → reason fires
        ("http://a/1", "http://b/1", ["FENNI"], ["FENNI", "X"],
         "fi", "fi", False, True),
        # clean pair → no reasons
        ("http://a/2", "http://b/2", ["A"], ["B"], "fi", "fi", False, False),
        # lang mismatch → sameType reason
        ("http://a/3", "http://b/3", [], [], "fi", "sv", False, False),
    ]
    df = spark.createDataFrame(
        rows,
        "url_a string, url_b string, a_sources array<string>, "
        "b_sources array<string>, a_lang string, b_lang string, "
        "a_has_diacritics boolean, b_has_diacritics boolean",
    )
    return df


def _reasons_rows(df):
    return sorted(
        (r["url_a"], tuple(r["reasons"]), r["can_merge"])
        for r in df.select("url_a", "reasons", "can_merge").collect()
    )


def test_pair_reasons_memoized_calls_equal(spark, pairs_df, monkeypatch):
    import dedup.verify as verify_mod

    cfg = DedupConfig()
    first = pair_reasons(pairs_df, cfg)
    expected = _reasons_rows(first)
    assert any(r[1] for r in expected)  # some pair has reasons

    # second call must not rebuild the tree...
    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("reasons tree rebuilt despite warm memo")

    monkeypatch.setattr(verify_mod, "_build_reasons_expr", boom)
    second = pair_reasons(pairs_df, cfg)
    # ...and must produce identical rows
    assert _reasons_rows(second) == expected


def test_pair_reasons_key_sensitive_to_count_columns(spark, pairs_df):
    cfg = DedupConfig()
    with_counts = pairs_df.withColumn(
        "a_headings", F.array(F.lit("x"), F.lit("y"))
    ).withColumn("b_headings", F.array(F.lit("x")))
    base = pair_reasons(pairs_df, cfg)
    counted = pair_reasons(
        with_counts, cfg, count_columns={"headings": ("a_headings", "b_headings")}
    )
    # the count gate exists only in the second tree: row 1 (equal-lang,
    # no diacritics asymmetry... sizes 2 vs 1) gains a count reason
    r = {
        row["url_a"]: list(row["reasons"])
        for row in counted.select("url_a", "reasons").collect()
    }
    assert any("Field count mismatch" in m for m in r["http://a/2"])
    rb = {
        row["url_a"]: list(row["reasons"])
        for row in base.select("url_a", "reasons").collect()
    }
    assert not any("Field count mismatch" in m for m in rb["http://a/2"])


def test_stat_parity_memoized_equal(spark, pairs_df):
    one = with_stat_parity(pairs_df)
    two = with_stat_parity(pairs_df)
    rows1 = sorted(
        (r["url_a"], tuple(r["stat_diacritics_msgs"]))
        for r in one.select("url_a", "stat_diacritics_msgs").collect()
    )
    rows2 = sorted(
        (r["url_a"], tuple(r["stat_diacritics_msgs"]))
        for r in two.select("url_a", "stat_diacritics_msgs").collect()
    )
    assert rows1 == rows2
    assert any(msgs for _, msgs in rows1)


def test_select_survivors_memoized_across_calls(spark):
    cfg = DedupConfig()
    members = spark.createDataFrame(
        [
            ("http://s/1", "c1", "2024-01-02T00:00:00", 100, "fi", ["FENNI"]),
            ("http://s/2", "c1", "2024-01-01T00:00:00", 200, "fi", ["X"]),
            ("http://s/3", "c2", "2024-01-01T00:00:00", 50, "sv", []),
        ],
        "url string, cluster_id string, warc_ts string, text_len int, "
        "lang string, sources array<string>",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    a = select_survivors(members, cfg, authority_sources=("FENNI",))
    b = select_survivors(members, cfg, authority_sources=("FENNI",))
    ra = sorted(map(tuple, a.select(
        "cluster_id", "survivor_url", "cluster_key", "lineage_json"
    ).collect()))
    rb = sorted(map(tuple, b.select(
        "cluster_id", "survivor_url", "cluster_key", "lineage_json"
    ).collect()))
    assert ra == rb
    # authority term live through the memoized tree: FENNI member wins
    # despite older ts/shorter text
    surv = {r["cluster_id"]: r["survivor_url"] for r in a.collect()}
    assert surv["c1"] == "http://s/1"
    # a different run identity must rebuild (different lineage)
    c = select_survivors(
        members, cfg, authority_sources=("FENNI",), run_id="run-9"
    )
    assert all('"run_id":"run-9"' in r["lineage_json"] for r in c.collect())
