"""Bucketed sink (zero-Exchange co-located joins) + JSONL source."""

from __future__ import annotations

import contextlib
import io
import json
import os

import pytest
from pyspark.sql import functions as F

from dedup.pages import load_pages_jsonl
from dedup.sinks import read_bucketed, write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@contextlib.contextmanager
def _no_broadcast(spark):
    """Force the sort-merge path so the Exchange assertion is about
    bucketing, not about the small side broadcasting."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    n = 500
    a = spark.range(n).select(
        F.concat(F.lit("https://s/"), F.col("id")).alias("url"),
        (F.col("id") % 7).alias("feat"),
    )
    b = spark.range(0, n, 2).select(
        F.concat(F.lit("https://s/"), F.col("id")).alias("url"),
        (F.col("id") % 3).alias("cluster_id"),
    )
    ta = write_bucketed(a, "t_sink_a", str(tmp_path / "a"), n_buckets=4)
    tb = write_bucketed(b, "t_sink_b", str(tmp_path / "b"), n_buckets=4)
    with _no_broadcast(spark):
        joined = ta.join(tb, "url")
        assert joined.count() == 250
        assert "Exchange" not in _plan(joined), _plan(joined)
        # groupBy on the bucket key: partial/final aggregate, no shuffle
        agg = ta.groupBy("url").agg(F.sum("feat").alias("s"))
        assert "Exchange" not in _plan(agg), _plan(agg)
        # control: the SAME join off raw path reads (bucket spec
        # forgotten) DOES shuffle — the assertion above means something
        ra = spark.read.parquet(str(tmp_path / "a"))
        rb = spark.read.parquet(str(tmp_path / "b"))
        assert "Exchange" in _plan(ra.join(rb, "url"))
    spark.sql("DROP TABLE IF EXISTS t_sink_a")
    spark.sql("DROP TABLE IF EXISTS t_sink_b")


def test_bucketed_rewrite_is_idempotent(spark, tmp_path):
    df = spark.range(10).select(
        F.col("id").cast("string").alias("url"), F.col("id").alias("v")
    )
    write_bucketed(df, "t_sink_c", str(tmp_path / "c"), n_buckets=2)
    t = write_bucketed(df, "t_sink_c", str(tmp_path / "c"), n_buckets=2)
    assert t.count() == 10
    assert read_bucketed(spark, "t_sink_c").count() == 10
    spark.sql("DROP TABLE IF EXISTS t_sink_c")


def test_bucketed_auto_bucket_count(spark, tmp_path):
    df = spark.range(50).select(F.col("id").cast("string").alias("url"))
    t = write_bucketed(df, "t_sink_d", str(tmp_path / "d"))
    # 50 docs -> auto floor (min_partitions=4)
    desc = spark.sql("DESCRIBE TABLE EXTENDED t_sink_d").toPandas()
    row = desc[desc["col_name"] == "Num Buckets"]["data_type"].iloc[0]
    assert int(row) == 4
    assert t.count() == 50
    spark.sql("DROP TABLE IF EXISTS t_sink_d")


# ---------------------------------------------------------------------------
# JSONL source
# ---------------------------------------------------------------------------

BASE = (
    "the quick brown fox jumps over the lazy dog again and again "
    "while the band plays waltzing matilda down by the river bend "
    "and every sailor knows the way home across the wine dark sea"
)


def _write_jsonl(path: str, rows: list[dict]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_jsonl_source_roundtrip_and_dedup(spark, tmp_path):
    land = tmp_path / "land"
    os.makedirs(land)
    rows = [
        {"url": "https://j/a", "warc_ts_epoch": 1714521600, "text": BASE,
         "lang": "en", "source": "s1"},
        {"url": "https://j/b", "warc_ts_epoch": 1714521660, "text": BASE,
         "lang": "en", "source": "s2"},
        {"url": "https://j/c", "warc_ts_epoch": 1714521720,
         "text": BASE.replace("sailor", "pilot"), "lang": "en",
         "source": "s1"},
        # missing optional fields -> nulls, not failures
        {"url": "https://j/d", "text": "gardening tools and the art of "
         "keeping soil alive through a long wet winter season outside"},
    ]
    _write_jsonl(str(land / "part-0.jsonl"), rows)
    pages = load_pages_jsonl(spark, str(land))
    assert pages.columns == ["url", "warc_ts", "text", "lang", "source"]
    got = {r["url"]: r for r in pages.collect()}
    assert len(got) == 4
    assert got["https://j/d"]["lang"] is None
    assert got["https://j/d"]["warc_ts"] is None
    assert got["https://j/a"]["warc_ts"].year == 2024

    from dedup.config import DedupConfig
    from dedup.pipeline import run_dedup

    res = run_dedup(pages, DedupConfig(hash_mode="portable"))
    assign = {r["url"]: r["cluster_id"] for r in res.assignments.collect()}
    res.release()
    # exact pair + near-dup cluster together; the singleton stays alone
    assert assign["https://j/a"] == assign["https://j/b"] == assign["https://j/c"]
    assert assign["https://j/d"] != assign["https://j/a"]


def test_jsonl_malformed_line_is_total(spark, tmp_path):
    land = tmp_path / "land2"
    os.makedirs(land)
    with open(land / "part-0.jsonl", "w") as f:
        f.write('{"url": "https://j/ok", "text": "fine text here"}\n')
        f.write("{not json at all\n")
        f.write('{"url": "https://j/ok2", "text": "also fine text"}\n')
    pages = load_pages_jsonl(spark, str(land))
    rows = pages.collect()
    urls = {r["url"] for r in rows}
    # PERMISSIVE: the bad line becomes an all-null row, never a crash
    assert {"https://j/ok", "https://j/ok2"} <= urls
    assert len(rows) == 3


def test_cli_bucketed_tables(spark, tmp_path):
    """--bucketed-tables publishes clean + assignments as co-bucketed
    catalog tables: both exist, carry the run's rows, share one bucket
    count, and join each other on url with no Exchange."""
    from dedup import cli, session

    out = str(tmp_path / "out")
    orig_get_spark = session.get_spark
    session.get_spark = lambda *a, **k: spark
    orig_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = cli.main([
            "--synthetic", "200", "--seed", "42",
            "--output", out,
            "--channels", "lsh,exact",
            "--bucketed-tables",
        ])
    finally:
        session.get_spark = orig_get_spark
        spark.stop = orig_stop
    assert rc == 0
    metrics = [
        json.loads(line)
        for line in open(f"{out}/metrics.jsonl")
        if line.strip()
    ]
    by_stage = {m["stage"]: m for m in metrics}
    bc, ba = by_stage["bucketed_clean"], by_stage["bucketed_assignments"]
    assert bc["rows_out"] == by_stage["clean"]["rows_out"]
    assert ba["rows_out"] == by_stage["assignments"]["rows_out"]
    assert bc["n_buckets"] == ba["n_buckets"] > 0
    tc = read_bucketed(spark, bc["table"])
    ta = read_bucketed(spark, ba["table"])
    with _no_broadcast(spark):
        joined = tc.join(ta, "url")
        assert joined.count() == ba["rows_out"]
        assert "Exchange" not in _plan(joined), _plan(joined)
    spark.sql(f"DROP TABLE IF EXISTS {bc['table']}")
    spark.sql(f"DROP TABLE IF EXISTS {ba['table']}")
