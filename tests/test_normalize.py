"""Normalizer + flags — reference semantics bug-for-bug
(lib/record-utils.js:206-216, 231-233, 364-387;
lib/mergeability-validators.js:134-150)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedup.normalize import (
    DIACRITICS_RE,
    has_diacritics,
    is_deleted,
    is_suppressed,
    is_truncated,
    normalize_text,
)


def _one(spark, text, col_fn):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(col_fn(F.col("t")).alias("v")).collect()[0]["v"]


def test_normalizer_reference_semantics(spark):
    # lower → [^a-z0-9åäö]+ → ' ' → trim  (record-utils.js:231-233)
    assert _one(spark, "Tilastot kertyvät... KYLLÄ!", normalize_text) == (
        "tilastot kertyvät kyllä"
    )
    assert _one(spark, "  A--B__C  ", normalize_text) == "a b c"
    # å/ä/ö retained, everything else non-alnum collapses
    assert _one(spark, "Åbo Äiti Öljy", normalize_text) == "åbo äiti öljy"
    # digits kept
    assert _one(spark, "vol. 2, 1999", normalize_text) == "vol 2 1999"
    # uppercase Å folds to å via lower()
    assert _one(spark, "ÅÄÖ", normalize_text) == "åäö"


def test_diacritics_quirk_class(spark):
    # /[^ -~,'öäå]/ — ASCII range + öäå whitelisted (and redundant , ')
    assert _one(spark, "plain ascii text", has_diacritics) is False
    assert _one(spark, "tämä on suomeksi äöå", has_diacritics) is False
    assert _one(spark, "façade", has_diacritics) is True
    assert _one(spark, "naïve", has_diacritics) is True
    # uppercase Ä is NOT in the whitelist → counts as diacritic (quirk)
    assert _one(spark, "TÄMÄ", has_diacritics) is True


def test_row_flags(spark):
    assert _one(spark, "", is_deleted) is True
    assert _one(spark, "   ", is_deleted) is True
    assert _one(spark, "x", is_deleted) is False
    assert _one(spark, "^^broken record", is_truncated) is True
    assert _one(spark, "fine record", is_truncated) is False
    assert _one(spark, "this page is NOINDEX please", is_suppressed) is True
    assert _one(spark, "indexable", is_suppressed) is False


def test_diacritics_regex_matches_reference_literal():
    # the exact char class from record-utils.js:211 (order preserved)
    assert DIACRITICS_RE == "[^ -~,'öäå]"
