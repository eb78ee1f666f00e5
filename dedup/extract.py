"""html → text extraction (SURVEY.md §7 stage 2).

Arrow-vectorized scalar pandas UDF over the `html` binary column. Per
BASELINE.json input_hint the invariant is: extracted text is
byte-identical per url to the table's `text` column. The extractor is
deterministic — a tag-stripping state machine with entity decoding —
and for corpus-generated wrappers it is an exact inverse of generation
(unit-tested byte equality).

Scale notes: this is the ONLY stage that reads the (wide) html column;
it runs first and everything downstream selects text-derived columns
only, so Catalyst's column pruning keeps the binary payload out of
every later scan/shuffle.
"""

from __future__ import annotations

import html as _htmllib
import re

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")

# block-level tags whose boundaries imply whitespace
_BLOCK_RE = re.compile(
    rb"</?(p|div|br|li|ul|ol|h[1-6]|tr|td|table|section|article|header|"
    rb"footer|blockquote)[^>]*>",
    re.IGNORECASE,
)
_DROP_RE = re.compile(
    rb"<(script|style|noscript)[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL
)


_WRAP_RE = re.compile(rb"^<html><body>(.*)</body></html>$", re.DOTALL)


def escape_wrapper_text(text: str) -> str:
    """&/</> escaping for the canonical '<html><body>…' wrapper — the
    exact inverse of html.unescape on those three entities, so the
    byte-identical-per-url invariant holds for text that CONTAINS
    entity-like substrings ('Fish &amp; Chips') or markup characters."""
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def extract_text_bytes(payload: bytes | None) -> str | None:
    """Deterministic extraction. Two regimes:

    * the canonical wrapper ('<html><body>…</body></html>') extracts
      EXACTLY — body bytes decoded and entity-unescaped, nothing else
      touched (no whitespace collapse) — the true inverse of
      escape_wrapper_text, so the invariant survives newlines, double
      spaces and entity-like text. The exact path requires the body to
      contain NO raw '<': escape_wrapper_text always escapes it, so a
      real crawled page that merely matches the wrapper shape (and
      would otherwise get its <script> contents returned verbatim)
      falls through to the lossy heuristic;
    * anything else takes the lossy heuristic: drop script/style,
      tags → boundaries, entity-decode, collapse whitespace.
    """
    if payload is None:
        return None
    m = _WRAP_RE.match(payload)
    if m is not None and b"<" not in m.group(1):
        return _htmllib.unescape(m.group(1).decode("utf-8", "replace"))
    b = _DROP_RE.sub(b" ", payload)
    b = _BLOCK_RE.sub(b" ", b)
    b = _TAG_RE.sub(b"", b)
    s = b.decode("utf-8", "replace")
    s = _htmllib.unescape(s)
    return _WS_RE.sub(" ", s).strip()


@F.pandas_udf(T.StringType())
def extract_text_udf(html_col: pd.Series) -> pd.Series:
    return html_col.map(extract_text_bytes)


def with_extracted_text(pages: DataFrame, out_col: str = "extracted_text") -> DataFrame:
    return pages.withColumn(out_col, extract_text_udf(F.col("html")))


def extraction_mismatches(pages: DataFrame) -> DataFrame:
    """Rows violating the byte-identical-per-url invariant — must be
    empty on any corpus whose html wraps text deterministically."""
    df = with_extracted_text(pages)
    return df.filter(
        F.coalesce(F.col("extracted_text"), F.lit(""))
        != F.coalesce(F.col("text"), F.lit(""))
    ).select("url", "text", "extracted_text")
