"""Authorized-format override (post/asteri analogues), count gate,
formatDate."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.survivor import (
    apply_authorized_override,
    format_date_iso,
    normalize_authority_name,
)
from dedup.verify import attach_features, pair_reasons


def _surv(spark, url="https://some-site.example/p/1"):
    return spark.createDataFrame(
        [("c1", url)], "cluster_id string, survivor_url string"
    )


def _members(spark, urls):
    return spark.createDataFrame(
        [("c1", u) for u in urls], "cluster_id string, url string"
    )


def _auth(spark, rows):
    return spark.createDataFrame(
        rows, "name_normalized string, canonical string"
    )


def test_no_side_table_passthrough(spark):
    out = apply_authorized_override(_surv(spark), _members(spark, []), None)
    r = out.collect()[0]
    assert r["canonical_host"] == "some-site.example"
    assert r["reject_reason"] is None


def test_other_member_authorized_overrides(spark):
    # asteri/test1 analogue: the other record carries the authorized form
    members = _members(
        spark, ["https://some-site.example/p/1", "https://authzd-site.example/p/2"]
    )
    auth = _auth(spark, [("authzd site example", "authzd-site.example")])
    r = apply_authorized_override(_surv(spark), members, auth).collect()[0]
    assert r["canonical_host"] == "authzd-site.example"
    assert r["reject_reason"] is None


def test_survivor_already_authorized_keeps_own(spark):
    members = _members(spark, ["https://some-site.example/p/1"])
    auth = _auth(spark, [("some site example", "some-site.example")])
    r = apply_authorized_override(_surv(spark), members, auth).collect()[0]
    assert r["canonical_host"] == "some-site.example"
    assert r["reject_reason"] is None


def test_both_authorized_rejects(spark):
    # asteri/test3 analogue: two distinct authorized forms in one cluster
    members = _members(
        spark, ["https://some-site.example/p/1", "https://authzd-site.example/p/2"]
    )
    auth = _auth(
        spark,
        [
            ("some site example", "some-site.example"),
            ("authzd site example", "authzd-site.example"),
        ],
    )
    r = apply_authorized_override(_surv(spark), members, auth).collect()[0]
    assert r["reject_reason"] == "Both records are in authorized format."
    assert r["canonical_host"] == "some-site.example"  # unchanged


def test_normalize_authority_name(spark):
    df = spark.createDataFrame([("Aho, Juhani.-II:",)], "n string")
    got = df.select(normalize_authority_name(F.col("n")).alias("v")).collect()[0]["v"]
    assert got == "Aho Juhani II"


def test_format_date_iso(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 3, 5, 7, 8, 9),)], "ts timestamp"
    )
    got = df.select(format_date_iso(F.col("ts")).alias("v")).collect()[0]["v"]
    assert got == "2024-03-05T07:08:09+00:00"


def test_field_count_mismatch_gate(spark):
    cfg = DedupConfig()
    pairs = spark.createDataFrame([("a", "b")], "url_a string, url_b string")
    feats = spark.createDataFrame(
        [
            ("a", "fi", False, datetime.datetime(2024, 1, 1), 10, [], ["h1"]),
            ("b", "fi", False, datetime.datetime(2024, 1, 2), 10, [], ["h1", "h2"]),
        ],
        "url string, lang string, has_diacritics boolean, warc_ts timestamp,"
        " text_len int, sources array<string>, headings array<string>",
    )
    out = pair_reasons(
        attach_features(pairs, feats),
        cfg,
        count_columns={"100": ("a_headings", "b_headings")},
    ).collect()[0]
    # count mismatch fires first (identicalCount, mergeability-
    # validators.js:115-131); the per-record multiplicity guard
    # (toAuthorityQueryObject, record-utils.js:60-63) follows with the
    # reference's exact message — names joined with ','.
    assert out["reasons"] == [
        "Field count mismatch for field 100",
        "Record has multiple names: h1,h2",
    ]
    assert out["can_merge"] is False


def test_multiple_names_guard_blocks_equal_counts(spark):
    # equal counts pass the count gate, but BOTH records having two
    # name values still cannot form authority queries — the reference
    # throws per record; here each side contributes its own reason
    cfg = DedupConfig()
    pairs = spark.createDataFrame([("a", "b")], "url_a string, url_b string")
    feats = spark.createDataFrame(
        [
            ("a", "fi", False, datetime.datetime(2024, 1, 1), 10, [], ["x", "y"]),
            ("b", "fi", False, datetime.datetime(2024, 1, 2), 10, [], ["h1", "h2"]),
        ],
        "url string, lang string, has_diacritics boolean, warc_ts timestamp,"
        " text_len int, sources array<string>, headings array<string>",
    )
    out = pair_reasons(
        attach_features(pairs, feats),
        cfg,
        count_columns={"100": ("a_headings", "b_headings")},
    ).collect()[0]
    assert out["reasons"] == [
        "Record has multiple names: x,y",
        "Record has multiple names: h1,h2",
    ]
    assert out["can_merge"] is False


def test_reprint_notes_dedup_under_normalized_key(spark):
    # two notes differing ONLY in punctuation must collapse to one —
    # the reference skips a note whose \W-stripped form is already
    # included (post-merge-modifiers.js:183-193); first (sorted) wins
    from dedup.survivor import reprint_notes

    ts1 = datetime.datetime(2024, 5, 1)
    members = spark.createDataFrame(
        [
            ("c1", "https://s.example/p/1", "fi", ts1),
            ("c1", "https://s.example/p/2", "en-US", ts1),
            ("c1", "https://s.example/p/3", "en.US", ts1),
        ],
        "cluster_id string, url string, lang string, warc_ts timestamp",
    )
    survivors = spark.createDataFrame(
        [("c1", "https://s.example/p/1", "fi")],
        "cluster_id string, survivor_url string, lang string",
    )
    out = reprint_notes(members, survivors).collect()[0]
    # raw notes sorted: 'Lisäpainokset: en-US 2024.' < '...: en.US 2024.'
    # ('-' 0x2D < '.' 0x2E); both strip to the same \W-less key
    assert out["notes"] == ["Lisäpainokset: en-US 2024."]
