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


def test_fast_path_equivalence_fuzz(spark):
    """The ASCII-fast-path decompositions of normalize_text and
    has_diacritics must be byte-identical to the reference regexes
    (which java.util.regex runs ~27x slower and without thread scaling
    — see the module comment) over adversarial unicode inputs."""
    import random

    from dedup.normalize import NORMALIZE_RE

    random.seed(3)
    pool = (
        list(range(32, 127))
        + [229, 228, 246, 197, 196, 214]  # åäö ÅÄÖ
        + [1, 2, 3, 9, 10, 127, 0x300, 0x4E00, 0x1F600]
    )
    fuzz = [
        "".join(chr(random.choice(pool)) for _ in range(60))
        for _ in range(1500)
    ]
    fuzz += ["", "   ", "ÅÄÖ åäö", "foo[bar]baz_`qux^", "a\tb\nc", "A~B"]
    df = spark.createDataFrame([(c,) for c in fuzz], "t string")
    ref_norm = F.trim(
        F.regexp_replace(F.lower(F.col("t")), NORMALIZE_RE, " ")
    )
    ref_diac = F.col("t").rlike(DIACRITICS_RE)
    bad = df.select(
        ref_norm.alias("rn"),
        normalize_text(F.col("t")).alias("fn"),
        ref_diac.alias("rd"),
        has_diacritics(F.col("t")).alias("fd"),
    ).filter(
        (F.col("rn") != F.col("fn")) | (F.col("rd") != F.col("fd"))
    )
    assert bad.count() == 0
