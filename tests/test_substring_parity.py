"""Substring channel vs its oracle-checkable spec (VERDICT round-1
item 4): the production winnowing channel must equal the crossJoin
containment relation on docs where the winnowing guarantee applies.

Soundness: channel ⊆ spec always (containment verify is exact).
Completeness: spec pairs whose contained doc is long enough to yield
≥ substring_min_shared interior winnowed fingerprints are all found
(uncapped bucket tier)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.corpus import corpus_dataframes
from dedup.normalize import quarantine_filter, with_normalized
from dedup.suffix import substring_edges


@pytest.fixture(scope="module")
def corpus(spark):
    pages, _t, _s = corpus_dataframes(spark, n_docs=400, seed=42)
    clean = quarantine_filter(with_normalized(pages)).cache()
    return clean


def _spec_pairs(clean):
    """The q_substring_pairs spec: exact containment via crossJoin."""
    a = clean.select(F.col("url").alias("ua"), F.col("norm_text").alias("ta"))
    b = clean.select(F.col("url").alias("ub"), F.col("norm_text").alias("tb"))
    return (
        a.crossJoin(b)
        .filter(
            (F.col("ua") != F.col("ub"))
            & (F.length("ta") < F.length("tb"))
            & (F.instr(F.col("tb"), F.col("ta")) > 0)
        )
        .select(
            F.least("ua", "ub").alias("u1"),
            F.greatest("ua", "ub").alias("u2"),
            F.length("ta").alias("contained_len"),
        )
    )


def test_channel_sound_and_complete_vs_spec(corpus):
    cfg = DedupConfig(substring_max_bucket=1_000_000_000)
    edges, _hot = substring_edges(corpus, cfg)
    got = {
        (r["u1"], r["u2"])
        for r in edges.select(
            F.least("url_a", "url_b").alias("u1"),
            F.greatest("url_a", "url_b").alias("u2"),
        ).collect()
    }
    spec_rows = _spec_pairs(corpus).collect()
    spec_all = {(r["u1"], r["u2"]) for r in spec_rows}
    # soundness: every channel edge is a true containment
    assert got <= spec_all
    # completeness where the winnowing guarantee holds: a contained doc
    # of length ≥ k - 1 + 3·window has ≥ 2 fully-interior windows, hence
    # ≥ substring_min_shared shared fingerprints
    min_guaranteed = cfg.k_shingle - 1 + 3 * cfg.fingerprint_window
    # the channel runs on exact-dup REPRESENTATIVES (members reconnect
    # through run_dedup's exact channel) — compare spec pairs after
    # mapping each url to its representative
    rep_rows = (
        corpus.groupBy("norm_text")
        .agg(F.min("url").alias("rep"), F.collect_list("url").alias("urls"))
        .collect()
    )
    rep_of = {u: r["rep"] for r in rep_rows for u in r["urls"]}
    spec_guaranteed = {
        tuple(sorted((rep_of[r["u1"]], rep_of[r["u2"]])))
        for r in spec_rows
        if r["contained_len"] >= min_guaranteed
        and rep_of[r["u1"]] != rep_of[r["u2"]]
    }
    assert len(spec_guaranteed) > 0
    missing = spec_guaranteed - got
    assert not missing, f"channel missed {len(missing)} guaranteed pairs"


def test_channel_nonempty_on_planted_substring_kind(spark, corpus):
    cfg = DedupConfig()
    edges, _hot = substring_edges(corpus, cfg)
    assert edges.count() > 0
