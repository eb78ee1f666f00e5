"""Plain 5-column parquet ingest (url, warc_ts, html, text, lang) —
the minimal BASELINE.json input_hint shape with NONE of the synthetic
gate-metadata columns. The rule / count / extent gates must degrade to
no-ops via the column-presence guards (dedup/pipeline.py rule_columns /
count_columns wiring, dedup/verify.OPTIONAL_FEATURE_COLS), not crash —
and the always-on gates (lang, diacritics) must still fire."""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.pipeline import run_dedup

TS = datetime.datetime(2024, 5, 1)
BASE = (
    "the quick brown fox jumps over the lazy dog again and again "
    "while the band plays waltzing matilda down by the river bend "
    "and every sailor knows the way home across the wine dark sea"
)


def _plain_rows():
    near = BASE.replace("sailor", "pilot")
    return [
        # exact pair + a near-dup: all three should cluster
        ("https://p/a", TS, b"<html>", BASE, "en"),
        ("https://p/b", TS, b"<html>", BASE, "en"),
        ("https://p/c", TS, b"<html>", near, "en"),
        # same text, different lang: candidate, gated by sameType
        ("https://p/d", TS, b"<html>", BASE, "fi"),
        # deleted (empty text): quarantined before pairing
        ("https://p/e", TS, b"<html>", "   ", "en"),
        # unrelated singleton
        ("https://p/f", TS, b"<html>",
         "completely different content about gardening tools and the "
         "proper maintenance of hedge trimmers in coastal climates with "
         "notes on rust prevention and seasonal storage of equipment",
         "en"),
    ]


SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def test_run_dedup_on_plain_five_columns(spark):
    pages = spark.createDataFrame(_plain_rows(), SCHEMA)
    cfg = DedupConfig()
    res = run_dedup(pages, cfg)  # no sources / side tables either

    assert res.quarantined.count() == 1  # the empty-text row

    # metadata gates degraded to no-ops: no rule/count/extent reasons
    # exist anywhere (their columns are absent), but the always-on lang
    # gate still fires on the cross-language exact pair
    reasons = [
        r
        for row in res.pairs.select("reasons").collect()
        for r in row["reasons"]
    ]
    assert any(
        r.startswith("Records are of different type (leader/6):")
        for r in reasons
    )
    assert not any("Field count mismatch" in r for r in reasons)
    assert not any("Record has multiple names" in r for r in reasons)

    assign = {r["url"]: r["cluster_id"] for r in res.assignments.collect()}
    merged = {assign["https://p/a"], assign["https://p/b"], assign["https://p/c"]}
    assert len(merged) == 1                      # exact + near merged
    assert assign["https://p/d"] != assign["https://p/a"]  # lang-gated
    assert assign["https://p/f"] == "https://p/f"          # singleton
    assert "https://p/e" not in assign                      # quarantined

    # survivors: one per cluster, no crash in the metadata-less tail
    assert res.survivors.count() == 3  # {a,b,c}, {d}, {f}
    res.release()


def test_cli_ingests_plain_five_column_parquet(spark, tmp_path):
    """spark-submit surface end-to-end on written 5-column parquet."""
    import dedup.session as session
    from dedup import cli

    src = str(tmp_path / "plain_pages")
    spark.createDataFrame(_plain_rows(), SCHEMA).write.parquet(src)
    out_dir = str(tmp_path / "out")

    orig_get_spark = session.get_spark
    session.get_spark = lambda *a, **k: spark
    orig_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = cli.main(["--input", src, "--output", out_dir])
    finally:
        session.get_spark = orig_get_spark
        spark.stop = orig_stop
    assert rc == 0

    metrics = {
        m["stage"]: m
        for m in (json.loads(line) for line in open(f"{out_dir}/metrics.jsonl"))
    }
    assert metrics["TOTAL"]["docs"] == 5          # 6 rows - 1 quarantined
    assert metrics["survivors"]["rows_out"] == 3
    surv = spark.read.parquet(f"{out_dir}/survivors")
    assert surv.count() == 3
    # the merged cluster's survivor carries lineage over all 3 members
    m3 = surv.filter(F.size("merged_from") == 3)
    assert m3.count() == 1
