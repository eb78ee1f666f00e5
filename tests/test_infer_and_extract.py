"""infer_type_and_count — the reference's 8 golden cases verbatim
(test/infer300a.spec.js:38-47) — and the extract stage's byte-identical
invariant (BASELINE.json input_hint)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedup.extract import extract_text_bytes, extraction_mismatches
from dedup.infer import infer_type_and_count, infer_type_and_count_udf

REFERENCE_CASES = {
    "12 s. :": ("volume", 1),
    "[1], 55 s. :": ("volume", 1),
    "XV, 514 s. :": ("volume", 1),
    "[4], 257, [1] s.": ("volume", 1),
    "XV, [4], 257, [1] s.": ("volume", 1),
    "2 nid.": ("volume", 2),
    "4 nid. (349, 312, 276, 336 s.)": ("volume", 4),
    "2 vol.": ("volume", 2),
}


def test_reference_golden_cases():
    for raw, expected in REFERENCE_CASES.items():
        assert infer_type_and_count(raw) == expected, raw


def test_roman_preface_beats_embedded_volume_count():
    # reference VOLUMES regexes are ^-anchored (record-utils.js:423-428):
    # 'XV, 2 vol.' falls through to IMPLICIT_VOLUME_WITH_PREFACE → count 1
    assert infer_type_and_count("XV, 2 vol.") == ("volume", 1)


def test_uninferrable_returns_none():
    assert infer_type_and_count("kartta") is None
    assert infer_type_and_count("") is None
    assert infer_type_and_count(None) is None


def test_udf_matches_pure_function(spark):
    rows = [(k,) for k in REFERENCE_CASES] + [("kartta",), (None,)]
    df = spark.createDataFrame(rows, "extent string")
    got = df.select(
        "extent", infer_type_and_count_udf(F.col("extent")).alias("r")
    ).collect()
    for r in got:
        exp = REFERENCE_CASES.get(r["extent"]) if r["extent"] else None
        if exp is None and r["extent"] not in REFERENCE_CASES:
            assert r["r"]["type"] is None
        else:
            assert (r["r"]["type"], r["r"]["count"]) == exp


def test_extract_pure_function():
    assert (
        extract_text_bytes(b"<html><body>hello world</body></html>")
        == "hello world"
    )
    assert extract_text_bytes(
        b"<div>a</div><script>drop()</script><p>b &amp; c</p>"
    ) == "a b & c"
    assert extract_text_bytes(None) is None


def test_extraction_byte_identical_on_corpus(spark):
    from dedup.corpus import corpus_dataframes

    pages, _t, _s = corpus_dataframes(spark, n_docs=300, seed=42)
    assert extraction_mismatches(pages).count() == 0


def test_extraction_byte_identical_on_driver_pages(spark, sf_dir):
    from dedup.pages import load_pages

    assert extraction_mismatches(load_pages(spark, sf_dir)).count() == 0


def test_extraction_exact_inverse_for_adversarial_text(spark):
    """The wrapper escapes &/</>, extraction unescapes, nothing else is
    touched: entity-like text, newlines and double spaces round-trip
    byte-identically (they used to break the invariant)."""
    from dedup.extract import escape_wrapper_text
    from dedup.pages import documents_to_pages

    texts = ["Fish &amp; Chips", "a  b\nline two", "x<y>z & w", "plain"]
    for t in texts:  # pure-python path (corpus generator)
        w = ("<html><body>" + escape_wrapper_text(t) + "</body></html>").encode()
        assert extract_text_bytes(w) == t
    docs = spark.createDataFrame(
        [(i, t, "en", "crawl-a") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string",
    )
    pages = documents_to_pages(docs)  # Spark-side wrapper (escaped)
    assert extraction_mismatches(pages).count() == 0


def test_wrapper_shaped_real_page_takes_lossy_path():
    """A REAL crawled page that happens to match the wrapper shape must
    NOT take the exact path: its <script> contents would be returned
    verbatim as text. escape_wrapper_text always escapes '<', so raw
    '<' inside the body is proof the payload is not a corpus wrapper."""
    real = (b"<html><body><script>var x = 1;</script>"
            b"<p>visible   text</p></body></html>")
    got = extract_text_bytes(real)
    assert "var x" not in got
    assert got == "visible text"
    # the canonical wrapper (escaped body) still round-trips exactly
    from dedup.extract import escape_wrapper_text
    t = "a <b> & c\n\n  double  spaced"
    w = ("<html><body>" + escape_wrapper_text(t) + "</body></html>").encode()
    assert extract_text_bytes(w) == t
