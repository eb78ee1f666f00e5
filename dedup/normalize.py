"""Text canonicalization + row-level quality flags.

The normalizer reproduces the reference's comparator normalization
bug-for-bug (lib/record-utils.js:231-233):

    value.toLowerCase().replace(/[^a-z0-9åäö]+/g, ' ').trim()

i.e. lowercase, collapse every run of chars outside [a-z0-9åäö] to one
space, trim. It is THE pre-shingling canonicalizer (SURVEY.md §2.3.1) so
verified Jaccard reproduces reference equivalence classes.

Row flags mirror the reference's pre-pairing guards:
  * is_deleted   — isDeleted (lib/record-utils.js:372-387): precondition,
                   filtered before pairing
                   (lib/marc-record-merge-melindautils.js:76-81).
                   Web analogue: empty/whitespace-only text.
  * is_suppressed— isSuppressed (lib/record-utils.js:364-370). Web
                   analogue: a 'noindex' sentinel in the text.
  * is_truncated — noAlephMultifields '^^' artifact
                   (lib/mergeability-validators.js:134-150): text starting
                   with the truncation sentinel never merges.
  * has_diacritics — anyDiacritics (lib/record-utils.js:206-216), regex
                   /[^ -~,'öäå']/ preserved QUIRK-FOR-QUIRK: the class
                   also (redundantly) whitelists ',' and \' and the
                   space-to-tilde ASCII range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

NORMALIZE_RE = "[^a-z0-9åäö]+"
# reference anyDiacritics char class, verbatim (record-utils.js:211)
DIACRITICS_RE = "[^ -~,'öäå]"
TRUNCATION_SENTINEL = "^^"
SUPPRESSED_SENTINEL = "noindex"

# java.util.regex drops to a ~27x slower, NON-thread-scaling path the
# moment a character class unions more than two components (measured on
# this host, 200k docs: [^a-z0-9]+ = 0.5s, but [^a-z0-9A]+ / [^a-z0-9_]+
# / [^a-z0-9åäö]+ all ≈ 13-22s at ANY core count). The hot-path
# normalizer therefore decomposes the reference regex into a chain of
# ≤2-component classes plus translate() (char-map, fast):
#
#  * lowercase FIRST, so uppercase A/B/C cannot occur in the data →
#    collision-free protection slots for å/ä/ö;
#  * [^0-9A-z]+ (two components) spaces everything except digits,
#    letters of either case, and the six chars [\]^_` that hide inside
#    the A-z range — a second one-component pass spaces those, and a
#    final ' +' pass collapses the runs the two-step split can leave;
#  * has_diacritics needs no translate-back (boolean): folding öäå onto
#    '~' (already inside the allowed ' '..'~' range) leaves every other
#    char's match status untouched.
#
# Byte-identical semantics to the reference regexes — the DuckDB
# oracles keep the original patterns and the parity gate certifies
# equality; tests fuzz the equivalence over unicode inputs.


def normalize_text(col: Column) -> Column:
    """lower → non-[a-z0-9åäö] runs → single space → trim.

    Exact reference semantics (record-utils.js:231-233) via the
    ASCII-fast-path decomposition above (measured 15.8s → 1.9s on the
    200k-doc corpus, and it thread-scales)."""
    c = F.lower(col)
    c = F.translate(c, "åäö", "ABC")
    c = F.regexp_replace(c, "[^0-9A-z]+", " ")
    c = F.regexp_replace(c, r"[\x5b-\x60]+", " ")
    c = F.regexp_replace(c, " +", " ")
    c = F.translate(c, "ABC", "åäö")
    return F.trim(c)


def has_diacritics(col: Column) -> Column:
    """anyDiacritics quirk class (record-utils.js:211), ASCII-fast-path
    form: öäå fold onto '~' (allowed either way); everything else keeps
    its original match status under [^ -~,']."""
    return F.translate(col, "öäå", "~~~").rlike("[^ -~,']")


def is_deleted(col: Column) -> Column:
    """Empty-content analogue of isDeleted — rows that never enter pairing."""
    return col.isNull() | (F.trim(col) == F.lit(""))


def is_suppressed(col: Column) -> Column:
    return F.lower(col).contains(SUPPRESSED_SENTINEL)


def is_truncated(col: Column) -> Column:
    return col.startswith(TRUNCATION_SENTINEL)


def with_normalized(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Add norm_text + quality flags. Narrow (no shuffle)."""
    c = F.col(text_col)
    return (
        pages.withColumn("norm_text", normalize_text(c))
        .withColumn("is_deleted", is_deleted(c))
        .withColumn("is_suppressed", is_suppressed(c))
        .withColumn("is_truncated", is_truncated(c))
        .withColumn("has_diacritics", has_diacritics(c))
    )


def quarantine_filter(pages: DataFrame) -> DataFrame:
    """The reference throws before any validator runs if either record is
    deleted (marc-record-merge-melindautils.js:76-81); we pre-filter the
    corpus so quarantined rows never reach candidate generation — a
    manual predicate pushdown that prunes the whole pipeline."""
    return pages.filter(
        ~F.col("is_deleted") & ~F.col("is_suppressed") & ~F.col("is_truncated")
    )
