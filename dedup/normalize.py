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


def normalize_text(col: Column) -> Column:
    """lower → non-[a-z0-9åäö] runs → single space → trim."""
    return F.trim(F.regexp_replace(F.lower(col), NORMALIZE_RE, " "))


def has_diacritics(col: Column) -> Column:
    return col.rlike(DIACRITICS_RE)


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
