"""Streaming ingest: file-source micro-batches → quarantine + exact
dedup in-stream → foreachBatch handoff; exactly-once via checkpoint."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.corpus import corpus_dataframes
from dedup.streaming import incremental_exact_dedup, read_pages_stream, run_incremental


def test_streaming_exact_dedup_and_handoff(spark, tmp_path):
    cfg = DedupConfig()
    pages, truth, _s = corpus_dataframes(spark, n_docs=300, seed=42)
    src = str(tmp_path / "stream_src")
    pages.repartition(6).write.parquet(src)

    stream = read_pages_stream(spark, src, max_files_per_trigger=2)
    assert stream.isStreaming

    collected: list[int] = []
    seen_urls: set[str] = set()

    def sink(batch_df, epoch_id):
        rows = batch_df.select("url", "text_hash").collect()
        collected.append(len(rows))
        seen_urls.update(r["url"] for r in rows)

    # corpus event time spans ~5h and files arrive unordered: the
    # watermark must cover the span or late rows are (correctly)
    # dropped — exercised separately below
    q = run_incremental(stream, cfg, sink, str(tmp_path / "ckpt"),
                        watermark="10 days")
    q.awaitTermination(120)

    n_quarantine = truth.filter(F.col("dup_kind") == "quarantine").count()
    n_exact = truth.filter(F.col("dup_kind") == "exact").count()
    n_total = pages.count()
    # multiple micro-batches ran
    assert len(collected) >= 2
    # quarantined rows never enter; exact dups within the watermark
    # horizon are dropped (all timestamps are within 1h in the corpus
    # except staggered offsets — allow the horizon slack)
    assert len(seen_urls) <= n_total - n_quarantine
    assert len(seen_urls) >= n_total - n_quarantine - n_exact - 5


def test_streaming_resume_is_exactly_once(spark, tmp_path):
    cfg = DedupConfig()
    pages, _t, _s = corpus_dataframes(spark, n_docs=200, seed=7)
    src = str(tmp_path / "src2")
    pages.repartition(4).write.parquet(src)
    ckpt = str(tmp_path / "ckpt2")

    seen: list[str] = []

    def sink(batch_df, epoch_id):
        seen.extend(r["url"] for r in batch_df.select("url").collect())

    q1 = run_incremental(read_pages_stream(spark, src), cfg, sink, ckpt,
                         watermark="10 days")
    q1.awaitTermination(120)
    first = list(seen)

    # restart against the same checkpoint: no new files → no re-delivery
    q2 = run_incremental(read_pages_stream(spark, src), cfg, sink, ckpt,
                         watermark="10 days")
    q2.awaitTermination(120)
    assert seen == first
    assert len(first) == len(set(first))


def test_streaming_near_dup_pairs_cross_batch(spark, tmp_path):
    """The applyInPandasWithState bucket-history operator must catch a
    NEAR-dup arriving in a LATER micro-batch than its base — the case
    the per-batch foreachBatch handoff structurally cannot see."""
    import datetime

    import numpy as np

    from dedup.streaming import streaming_near_dup_pairs

    cfg = DedupConfig()
    rng = np.random.default_rng(13)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]

    def words(n):
        return " ".join(vocab[i] for i in rng.integers(0, len(vocab), n))

    base = words(200)
    near = ("alpha " + base[len("alpha "):])  # tiny prefix edit
    other = words(200)
    ts = datetime.datetime(2024, 1, 1)

    def row(url, text):
        return (url, ts, b"<html>", text, "en", [], [], [], ["h"], None)

    from dedup.schema import PAGES_SCHEMA

    src = str(tmp_path / "near_src")
    # batch 1: base + an unrelated doc; batch 2: the near-dup
    spark.createDataFrame(
        [row("https://a/base", base), row("https://a/other", other)],
        PAGES_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [row("https://a/near", near)], PAGES_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    stream = read_pages_stream(spark, src, max_files_per_trigger=1)
    pairs = streaming_near_dup_pairs(stream, cfg)
    q = (
        pairs.writeStream.format("memory").queryName("near_pairs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "near_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 2  # the near-dup arrived in a LATER batch

    got = spark.sql(
        "SELECT DISTINCT url_a, url_b FROM near_pairs"
    ).collect()
    pairs_set = {(r["url_a"], r["url_b"]) for r in got}
    assert ("https://a/base", "https://a/near") in pairs_set
    # unrelated doc never pairs
    assert all("other" not in a and "other" not in b for a, b in pairs_set)


def test_streaming_near_dup_equals_batch_bucket_pairs(spark, tmp_path):
    """Equivalence property: with no caps engaged and no exact dups, the
    streaming bucket-history operator over ANY arrival order must emit
    exactly the batch relation {bucket-coocurring pairs with signature
    agreement >= estimate_floor} — each pair surfacing when its later
    member arrives."""
    import numpy as np
    from pyspark.sql import functions as F

    from dedup.minhash import explode_bands, signatures
    from dedup.normalize import quarantine_filter, with_normalized
    from dedup.streaming import streaming_near_dup_pairs

    cfg = DedupConfig()
    pages, _t, _s = corpus_dataframes(spark, n_docs=120, seed=21)
    # exact dups would hit the batch pipeline's rep-collapse (not part
    # of this operator); drop them so both sides see identical inputs
    pages = pages.withColumn("th", F.xxhash64("text"))
    w_first = pages.groupBy("th").agg(F.min("url").alias("url"))
    pages = pages.join(w_first, ["th", "url"]).drop("th")

    # --- batch side: band-coocurrence pairs with agreement >= floor ---
    clean = quarantine_filter(with_normalized(pages))
    sig = signatures(clean, cfg).select("url", "sig")
    bands = explode_bands(sig, cfg)
    co = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.url") < F.col("y.url")),
        )
        .select(
            F.col("x.url").alias("url_a"), F.col("y.url").alias("url_b")
        )
        .distinct()
    )
    sa = sig.select(F.col("url").alias("url_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("url").alias("url_b"), F.col("sig").alias("sig_b"))
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda e: e)
    )
    est = agree.cast("double") / F.size("sig_a").cast("double")
    batch_pairs = {
        (r["url_a"], r["url_b"])
        for r in co.join(sa, "url_a").join(sb, "url_b")
        .filter(est >= F.lit(cfg.estimate_floor))
        .select("url_a", "url_b").collect()
    }

    # --- streaming side: 3 arbitrary micro-batches ---
    src = str(tmp_path / "eq_src")
    parts = pages.randomSplit([1.0, 1.0, 1.0], seed=5)
    for p in parts:
        p.coalesce(1).write.mode("append").parquet(src)
    stream = read_pages_stream(spark, src, max_files_per_trigger=1)
    q = (
        streaming_near_dup_pairs(stream, cfg, state_cap=10_000)
        .writeStream.format("memory").queryName("eq_pairs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "eq_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    stream_pairs = {
        (r["url_a"], r["url_b"])
        for r in spark.sql(
            "SELECT DISTINCT url_a, url_b FROM eq_pairs"
        ).collect()
    }
    assert len(batch_pairs) > 0
    assert stream_pairs == batch_pairs


def test_streaming_near_dup_recrawl_does_not_duplicate_state(spark, tmp_path):
    """A re-crawled url REPLACES its entry in every bucket the new
    content maps to (the common case — most re-crawls are identical, so
    all buckets coincide): duplicate entries must not accumulate, or
    they would waste state_cap slots and inflate emissions. Pinned
    deterministically: after X arrives twice with identical content,
    a later Y(same content) emits exactly effective_bands RAW pair rows
    (one per shared bucket) — duplicated X state would emit 2×.
    Entries in buckets a CHANGED re-crawl no longer maps to are
    intentionally retained: each capture's pairs carry the similarity
    of the content at crawl time (WARC-archive semantics)."""
    import datetime

    import numpy as np

    from dedup.streaming import streaming_near_dup_pairs

    cfg = DedupConfig()
    rng = np.random.default_rng(29)
    voc = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    content_a = " ".join(voc[i] for i in rng.integers(0, len(voc), 200))
    ts = datetime.datetime(2024, 1, 1)

    def row(url, text):
        return (url, ts, b"<html>", text, "en", [], [], [], ["h"], None)

    from dedup.schema import PAGES_SCHEMA

    src = str(tmp_path / "recrawl_src")
    for batch in (
        [row("https://x", content_a)],
        [row("https://x", content_a)],  # identical re-crawl
        [row("https://y", content_a)],
    ):
        spark.createDataFrame(batch, PAGES_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(src)

    stream = read_pages_stream(spark, src, max_files_per_trigger=1)
    q = (
        streaming_near_dup_pairs(stream, cfg)
        .writeStream.format("memory").queryName("recrawl_pairs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "recrawl_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    raw = spark.sql(
        "SELECT url_a, url_b, est_jaccard FROM recrawl_pairs"
    ).collect()
    xy = [r for r in raw if (r["url_a"], r["url_b"]) ==
          ("https://x", "https://y")]
    # one row per shared bucket; a duplicated X entry would double this
    assert len(xy) == cfg.effective_bands, len(xy)
    assert {r["est_jaccard"] for r in xy} == {1.0}


def test_streaming_near_dup_state_ttl_drops_idle_buckets(spark, tmp_path):
    """state_ttl_ms bounds TOTAL state (the number of bucket keys, which
    otherwise grows with every distinct band key ever seen): a bucket
    idle past the TTL is dropped, so a near-dup arriving after an
    intermediate batch that let the timer fire finds no history. The
    TTL-less control on the same input still pairs — proving the drop is
    the TTL, not the operator."""
    import datetime

    import numpy as np

    from dedup.schema import PAGES_SCHEMA
    from dedup.streaming import streaming_near_dup_pairs

    cfg = DedupConfig()
    rng = np.random.default_rng(31)
    voc = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    # disjoint vocabulary: the filler must NOT land in (and thereby
    # keep alive, or pair inside) base's band buckets
    voc2 = ["golf", "hotel", "india", "juliet", "kilo", "lima"]

    def words(vocab, n):
        return " ".join(vocab[i] for i in rng.integers(0, len(vocab), n))

    base = words(voc, 200)
    filler = words(voc2, 200)
    ts = datetime.datetime(2024, 1, 1)

    def row(url, text):
        return (url, ts, b"<html>", text, "en", [], [], [], ["h"], None)

    src = str(tmp_path / "ttl_src")
    # batch 1: base; batch 2: unrelated filler (its trigger processes
    # the expired timers of base's now-idle buckets); batch 3: re-crawl
    # of base content under a new url
    for batch in (
        [row("https://t/base", base)],
        [row("https://t/filler", filler)],
        [row("https://t/late", base)],
    ):
        spark.createDataFrame(batch, PAGES_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(src)

    def run(name: str, ttl: int | None) -> set[tuple[str, str]]:
        stream = read_pages_stream(spark, src, max_files_per_trigger=1)
        q = (
            streaming_near_dup_pairs(stream, cfg, state_ttl_ms=ttl)
            .writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        return {
            (r["url_a"], r["url_b"])
            for r in spark.sql(
                f"SELECT DISTINCT url_a, url_b FROM {name}"
            ).collect()
        }

    with_ttl = run("ttl_pairs", ttl=1)  # 1 ms: idle buckets expire
    control = run("ttl_control", ttl=None)
    assert ("https://t/base", "https://t/late") in control
    assert ("https://t/base", "https://t/late") not in with_ttl


def test_streaming_candidates_flow_through_verify_tail(spark, tmp_path):
    """End-to-end: the stream's cross-batch near-dup candidates run
    through the SAME reason gates + CC as the batch pipeline (the
    reference feeds every pair through canMerge,
    marc-record-merge-melindautils.js:84-104). A cross-batch near-dup
    lands in a cluster; an equally-similar pair gated by source overlap
    does not."""
    import datetime

    import numpy as np

    from dedup.schema import PAGES_SCHEMA, SOURCES_SCHEMA
    from dedup.streaming import run_streaming_dedup

    cfg = DedupConfig()
    rng = np.random.default_rng(7)
    voc = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
           "golf", "hotel"]
    base_words = [voc[i] for i in rng.integers(0, len(voc), 250)]

    def variant(*edits: tuple[int, str]) -> str:
        w = list(base_words)
        for pos, word in edits:
            w[pos] = word
        return " ".join(w)

    ts = datetime.datetime(2024, 3, 1)

    def row(url, text):
        return (url, ts, b"<html>", text, "en", [], [], [], ["h"], None)

    a, b, c = "https://s/a", "https://s/b", "https://s/c"
    src = str(tmp_path / "tail_src")
    # three micro-batches: every near-dup pair is CROSS-batch
    for batch in (
        [row(a, variant())],
        [row(b, variant((10, "india")))],
        [row(c, variant((200, "juliet")))],
    ):
        spark.createDataFrame(batch, PAGES_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(src)

    # a∩c share s1, b∩c share s2 → both c-pairs gate on source overlap
    # (noSameLOWTags); a∩b share nothing → merges
    sources = spark.createDataFrame(
        [(a, "s1", None), (b, "s2", None),
         (c, "s1", None), (c, "s2", None)],
        SOURCES_SCHEMA,
    )

    res = run_streaming_dedup(
        spark, src, str(tmp_path / "tail_work"), cfg, sources=sources
    )

    # all three candidate pairs surfaced and carry gate verdicts
    pairs = {
        (r["url_a"], r["url_b"]): r
        for r in res.pairs.select(
            "url_a", "url_b", "jaccard", "can_merge", "reasons"
        ).collect()
    }
    assert set(pairs) == {(a, b), (a, c), (b, c)}
    for p in pairs.values():  # similarity is NOT the discriminator here
        assert p["jaccard"] >= cfg.jaccard_threshold
    assert pairs[(a, b)]["can_merge"]
    assert not pairs[(a, c)]["can_merge"]
    assert "Both records have have LOW tag: s1" in pairs[(a, c)]["reasons"]
    assert "Both records have have LOW tag: s2" in pairs[(b, c)]["reasons"]

    # only the ungated pair became an edge; c stays a singleton cluster
    edges = {(r["url_a"], r["url_b"])
             for r in res.edges.select("url_a", "url_b").collect()}
    assert edges == {(a, b)}
    assign = {r["url"]: r["cluster_id"] for r in res.assignments.collect()}
    assert assign[a] == assign[b] == a
    assert assign[c] == c

    # survivor tail parity: one survivor per cluster, none rejected
    surv = {r["cluster_id"]: r["survivor_url"]
            for r in res.survivors.collect()}
    assert set(surv) == {a, c}
    assert surv[a] in (a, b) and surv[c] == c
    assert res.rejected.count() == 0


def test_cli_streaming_mode_resumes_across_invocations(spark, tmp_path):
    """The spark-submit surface end-to-end: `--streaming` drains the
    landing directory, writes the batch-shaped result tables, and a
    SECOND invocation resumes from the stream checkpoints — including
    the near-dup bucket STATE, so a doc landed in invocation 2 pairs
    with one processed in invocation 1."""
    import datetime

    import dedup.session as session
    from dedup import cli
    from dedup.schema import PAGES_SCHEMA

    voc = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
           "golf", "hotel"]
    # index-suffixed words: diverse shingles, so a one-word edit stays
    # comfortably above the 0.8 Jaccard gate (a pure 8-word cycle left
    # the pair at 0.79 — repetitive text has few distinct shingles)
    base_words = [f"{voc[i % len(voc)]}{i}" for i in range(250)]

    def text(*edits: tuple[int, str]) -> str:
        w = list(base_words)
        for pos, word in edits:
            w[pos] = word
        return " ".join(w)

    def row(url, txt, hour):
        ts = datetime.datetime(2024, 3, 1, hour)
        return (url, ts, b"<html>", txt, "en", [], [], [], ["h"], None)

    a, b = "https://cli/a", "https://cli/b"
    filler = " ".join(voc[i % len(voc)] * 2 for i in range(300))
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [row(a, text(), 0), row("https://cli/f", filler, 0)], PAGES_SCHEMA
    ).coalesce(1).write.mode("append").parquet(landing)

    orig_get_spark, session.get_spark = session.get_spark, lambda *x, **k: spark
    orig_stop, spark.stop = spark.stop, lambda: None
    try:
        argv = ["--streaming", "--input", landing, "--output", out,
                "--watermark", "10 days"]
        assert cli.main(argv) == 0
        assert spark.read.parquet(f"{out}/assignments").count() == 2
        assert spark.read.parquet(f"{out}/survivors").count() == 2

        # invocation 2: only the new file is processed; the bucket state
        # restored from the checkpoint pairs b with invocation 1's a
        spark.createDataFrame(
            [row(b, text((10, "india")), 1)], PAGES_SCHEMA
        ).coalesce(1).write.mode("append").parquet(landing)
        assert cli.main(argv) == 0
    finally:
        session.get_spark = orig_get_spark
        spark.stop = orig_stop

    pairs = {(r["url_a"], r["url_b"])
             for r in spark.read.parquet(f"{out}/pairs").collect()}
    assert (a, b) in pairs
    assign = {r["url"]: r["cluster_id"]
              for r in spark.read.parquet(f"{out}/assignments").collect()}
    assert assign[a] == assign[b] == a
    assert spark.read.parquet(f"{out}/survivors").count() == 2

    with open(f"{out}/metrics.jsonl") as f:
        total = [json.loads(line) for line in f][-1]
    assert total["stage"] == "TOTAL" and total["mode"] == "streaming"
    assert total["docs"] == 3


def test_cli_streaming_applies_explicit_shuffle_partitions(spark, tmp_path):
    """An explicit --shuffle-partitions must reach the streaming drains'
    tail work (it used to be silently dropped: the sizing block sat
    after the --streaming early return). 'auto' keeps the session
    default — corpus size isn't known until the stores drain."""
    import datetime

    import dedup.session as session
    from dedup import cli
    from dedup.schema import PAGES_SCHEMA

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ts = datetime.datetime(2024, 3, 1)
    spark.createDataFrame(
        [("https://sp/a", ts, b"<html>", "alpha bravo " * 40, "en",
          [], [], [], ["h"], None)],
        PAGES_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(landing)

    orig_get_spark, session.get_spark = session.get_spark, lambda *x, **k: spark
    orig_stop, spark.stop = spark.stop, lambda: None
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        assert cli.main(
            ["--streaming", "--input", landing, "--output", out,
             "--shuffle-partitions", "7"]
        ) == 0
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        session.get_spark = orig_get_spark
        spark.stop = orig_stop


def test_streaming_degenerate_docs_not_banded(spark, tmp_path):
    """Empty-norm docs (CJK under the [a-z0-9åäö] alphabet) share the
    constant sentinel-shingle signature; banding them would pair every
    such same-alphabet page at estimate 1.0 and the verify tail would
    fuse them (sentinel jaccard = 1.0). The stream front-end must apply
    the batch pipeline's bandable predicate: degenerate docs dedup only
    via the exact watermark stage, never via LSH."""
    import datetime

    from dedup.schema import PAGES_SCHEMA
    from dedup.streaming import streaming_near_dup_pairs

    cfg = DedupConfig()
    ts = datetime.datetime(2024, 1, 1)

    def row(url, text):
        return (url, ts, b"<html>", text, "zh", [], [], [], ["h"], None)

    # two DIFFERENT CJK pages (both normalize to "") + a latin near-dup
    # pair that must still be caught
    cjk1 = "你好世界 这是完全不同的文件 " * 30
    cjk2 = "天地玄黄 宇宙洪荒 日月盈昃 " * 30
    base = "the quick brown fox jumps over the lazy dog again and again " * 10
    near = base + "tail"
    src = str(tmp_path / "degen_src")
    spark.createDataFrame(
        [row("https://z/cjk1", cjk1), row("https://z/cjk2", cjk2),
         row("https://z/base", base)],
        PAGES_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [row("https://z/near", near)], PAGES_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    stream = read_pages_stream(spark, src, max_files_per_trigger=1)
    pairs = streaming_near_dup_pairs(stream, cfg)
    q = (
        pairs.writeStream.format("memory").queryName("degen_pairs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "degen_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r["url_a"], r["url_b"]) for r in spark.sql(
        "SELECT DISTINCT url_a, url_b FROM degen_pairs").collect()}
    assert ("https://z/base", "https://z/near") in got
    assert all("cjk" not in a and "cjk" not in b for a, b in got), got


def test_incremental_tail_delta_verify_and_fold(spark, tmp_path):
    """VERDICT r4 #1: invocation 2's tail must NOT recompute Jaccard/
    gates for pairs already gated in invocation 1 (delta evidence via
    the timings hook), must fold new edges into the prior assignments,
    and must produce clusters identical to a full recompute."""
    import datetime

    import numpy as np

    from dedup.schema import PAGES_SCHEMA
    from dedup.streaming import (
        load_tail_state,
        run_streaming_dedup,
        streaming_verify_tail,
    )

    cfg = DedupConfig()
    rng = np.random.default_rng(21)
    voc = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
           "golf", "hotel"]
    base_words = [voc[i] for i in rng.integers(0, len(voc), 250)]

    def variant(*edits):
        w = list(base_words)
        for pos, word in edits:
            w[pos] = word
        return " ".join(w)

    ts = datetime.datetime(2024, 5, 1)

    def row(url, text):
        return (url, ts, b"<html>", text, "en", [], [], [], ["h"], None)

    a, b, c, d = ("https://i/a", "https://i/b", "https://i/c", "https://i/d")
    src = str(tmp_path / "inc_src")
    work = str(tmp_path / "inc_work")

    # ---- invocation 1: a + its near-dup b ----
    for batch in ([row(a, variant())], [row(b, variant((10, "india")))]):
        spark.createDataFrame(batch, PAGES_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(src)
    t1: dict = {}
    res1 = run_streaming_dedup(spark, src, work, cfg, timings=t1)
    assert t1["n_cand_total"] == t1["n_cand_new"] == 1
    assign1 = {r["url"]: r["cluster_id"] for r in res1.assignments.collect()}
    assert assign1[a] == assign1[b] == a
    res1.release()

    # committed state loads for the SAME config, not for a changed one
    assert load_tail_state(spark, f"{work}/tail_state", cfg)[0] is not None
    other = DedupConfig(jaccard_threshold=0.5)
    assert load_tail_state(spark, f"{work}/tail_state", other) == (None, None)

    # ---- invocation 2: near-dup c (pairs with both) + unrelated d ----
    # d uses a DISJOINT vocabulary so it shares no shingles with a/b/c
    voc2 = ["zulu", "yankee", "xray", "whiskey", "victor", "uniform"]
    unrel = " ".join(voc2[i] for i in rng.integers(0, len(voc2), 250))
    spark.createDataFrame(
        [row(c, variant((200, "juliet"))), row(d, unrel)], PAGES_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    t2: dict = {}
    res2 = run_streaming_dedup(spark, src, work, cfg, timings=t2)
    # the (a, b) pair was gated in invocation 1 and MUST NOT re-verify:
    # n_cand_new counts pairs that actually reach Jaccard/gating, and
    # only the two c-pairs are new. The SCAN is also delta-bounded by
    # the read cursor — at most the 2 s re-read margin's overlap on top
    # of this drain's own files (3 = all-files upper bound; 2 when the
    # drains are more than the margin apart, the normal case)
    assert t2["n_cand_total"] <= 3
    assert t2["n_cand_new"] == 2

    got = {
        "pairs": sorted(
            (r["url_a"], r["url_b"], r["jaccard"], r["can_merge"])
            for r in res2.pairs.select(
                "url_a", "url_b", "jaccard", "can_merge").collect()
        ),
        "edges": sorted(
            (r["url_a"], r["url_b"]) for r in res2.edges.collect()
        ),
        "assign": sorted(
            (r["url"], r["cluster_id"]) for r in res2.assignments.collect()
        ),
        "surv": sorted(
            (r["cluster_id"], r["survivor_url"])
            for r in res2.survivors.collect()
        ),
    }
    res2.release()

    # ---- full recompute over the same stores must match exactly ----
    pages_store = spark.read.parquet(f"{work}/pages")
    cand = spark.read.parquet(f"{work}/pairs")
    full = streaming_verify_tail(pages_store, cand, cfg)
    want = {
        "pairs": sorted(
            (r["url_a"], r["url_b"], r["jaccard"], r["can_merge"])
            for r in full.pairs.select(
                "url_a", "url_b", "jaccard", "can_merge").collect()
        ),
        "edges": sorted(
            (r["url_a"], r["url_b"]) for r in full.edges.collect()
        ),
        "assign": sorted(
            (r["url"], r["cluster_id"]) for r in full.assignments.collect()
        ),
        "surv": sorted(
            (r["cluster_id"], r["survivor_url"])
            for r in full.survivors.collect()
        ),
    }
    full.release()
    assert got == want
    # the fold produced one merged cluster {a, b, c} + singleton d
    assign2 = dict(got["assign"])
    assert assign2[a] == assign2[b] == assign2[c] == a
    assert assign2[d] == d


def _bucket_reference_loop(urls, seen, arr_urls, arr_sigs, floor, cap):
    """The sequential per-arrival loop _bucket_batch_update replaced —
    kept as the semantics oracle for the property test below."""
    import numpy as np

    urls = list(urls)
    seen = seen.copy()
    rows = []
    for url, s_np in zip(arr_urls, arr_sigs):
        if url in urls:
            keep = [i for i, u2 in enumerate(urls) if u2 != url]
            urls = [urls[i] for i in keep]
            seen = seen[keep]
        if len(urls):
            est = (seen == s_np).mean(axis=1)
            for i in np.nonzero(est >= floor)[0]:
                u2 = urls[int(i)]
                a, b = (url, u2) if url < u2 else (u2, url)
                rows.append((a, b, float(est[i])))
        urls.append(str(url))
        seen = np.vstack([seen, s_np[None, :]])
    return rows, urls[-cap:], seen[-cap:]


def test_bucket_batch_update_matches_reference_loop():
    """The vectorized micro-batch state update must reproduce the
    sequential loop exactly — pairs (as a multiset), post-batch state
    order, and estimates — including re-crawl replacement inside the
    batch and across the state boundary, at a 1000-row micro-batch."""
    import numpy as np

    from dedup.streaming import _bucket_batch_update

    rng = np.random.default_rng(99)
    width, floor, cap = 16, 0.5, 32

    def rand_sig():
        return rng.integers(0, 4, size=width).astype(np.int64)

    for trial in range(5):
        n_state = int(rng.integers(0, 20))
        state_urls = [f"https://u/{i}" for i in range(n_state)]
        state_sigs = (
            np.vstack([rand_sig() for _ in range(n_state)])
            if n_state else np.empty((0, width), dtype=np.int64)
        )
        m = 1000 if trial == 0 else int(rng.integers(1, 60))
        # arrivals drawn from a small url pool → many in-batch
        # re-crawls AND collisions with state urls
        pool = state_urls + [f"https://v/{i}" for i in range(30)]
        arr_urls = [pool[i] for i in rng.integers(0, len(pool), m)]
        # low-cardinality sig values → many pairs at/above the floor
        arr_sigs = np.vstack([rand_sig() for _ in range(m)])

        got = _bucket_batch_update(
            state_urls, state_sigs, arr_urls, arr_sigs, floor, cap
        )
        want = _bucket_reference_loop(
            state_urls, state_sigs, arr_urls, arr_sigs, floor, cap
        )
        assert sorted(got[0]) == sorted(want[0]), f"trial {trial}: pairs"
        assert got[1] == want[1], f"trial {trial}: state urls"
        assert np.array_equal(got[2], want[2]), f"trial {trial}: state sigs"


def test_bucket_batch_update_empty_arrivals():
    import numpy as np

    from dedup.streaming import _bucket_batch_update

    seen = np.ones((2, 4), dtype=np.int64)
    rows, urls, after = _bucket_batch_update(
        ["a", "b"], seen, [], np.empty((0, 4), dtype=np.int64), 0.5, 16
    )
    assert rows == [] and urls == ["a", "b"]
    assert np.array_equal(after, seen)


def test_streaming_exact_dedup_degenerate_docs_stay_distinct(spark, tmp_path):
    """Empty-NORM docs (CJK / punctuation-only pages) must NOT fuse in
    the streaming exact stage: the raw-text fallback keys them by their
    raw bytes (the batch exact_groups contract, dedup/candidates.py:35),
    so two DIFFERENT CJK pages both survive while a byte-identical CJK
    re-crawl is still dropped."""
    import datetime

    from dedup.schema import PAGES_SCHEMA
    from dedup.streaming import incremental_exact_dedup, read_pages_stream

    ts = datetime.datetime(2024, 5, 1)

    def row(url, text):
        return (url, ts, b"<html>", text, "zh", [], [], [], ["h"], None)

    rows = [
        row("https://z/a", "春眠不觉晓处处闻啼鸟夜来风雨声花落知多少"),
        row("https://z/b", "床前明月光疑是地上霜举头望明月低头思故乡"),
        # byte-identical re-crawl of a under a new url: MUST drop
        row("https://z/a2", "春眠不觉晓处处闻啼鸟夜来风雨声花落知多少"),
    ]
    src = str(tmp_path / "cjk_src")
    spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)

    seen: set[str] = set()

    def sink(batch_df, epoch_id):
        seen.update(r["url"] for r in batch_df.select("url").collect())

    q = (
        incremental_exact_dedup(
            read_pages_stream(spark, src), DedupConfig(), watermark="1 hour"
        )
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cjk_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert "https://z/a" in seen and "https://z/b" in seen
    assert len(seen) == 2  # exactly one of {a, a2} survived, plus b


def test_tail_state_lsm_delta_writes_and_compaction(spark, tmp_path):
    """The per-drain pair-state WRITE must be O(delta), not O(corpus):
    save_tail_state appends a pairs_delta dir per drain, the loader
    unions base + deltas, compaction folds them into a fresh base every
    compact_every drains, GC keeps only the last two markers' dirs, and
    a config change invalidates cleanly."""
    import os

    from dedup.streaming import (
        _read_state_meta,
        load_tail_state,
        save_tail_state,
    )

    cfg = DedupConfig()
    sd = str(tmp_path / "state")
    schema = "url_a string, url_b string, can_merge boolean"

    def pairs(*rows):
        return spark.createDataFrame(list(rows), schema)

    def assigns(*urls):
        return spark.createDataFrame([(u, u) for u in urls],
                                     "url string, cluster_id string")

    p0 = [("a", "b", True), ("a", "c", False)]
    p1 = [("b", "d", True)]
    p2 = [("c", "e", True)]

    # drain 0: fresh start → full base write
    save_tail_state(sd, pairs(*p0), pairs(*p0), assigns("a", "b"), cfg)
    meta = _read_state_meta(sd)
    assert meta["pairs_base"] == "pairs_base_v0"
    assert meta["pairs_deltas"] == []

    # drain 1: only the delta is written
    save_tail_state(sd, pairs(*p1), pairs(*p0, *p1), assigns("a", "b", "d"),
                    cfg)
    meta = _read_state_meta(sd)
    assert meta["pairs_base"] == "pairs_base_v0"
    assert meta["pairs_deltas"] == ["pairs_delta_v1"]
    import duckdb  # independent reader: the delta dir holds ONLY p1

    n_delta = duckdb.sql(
        f"select count(*) from parquet_scan('{sd}/pairs_delta_v1/*.parquet')"
    ).fetchone()[0]
    assert n_delta == len(p1)
    prior, pa = load_tail_state(spark, sd, cfg)
    assert sorted(tuple(r) for r in prior.collect()) == sorted(p0 + p1)
    assert pa.count() == 3

    # drain 2 with compaction due → deltas fold into a new base
    save_tail_state(sd, pairs(*p2), pairs(*p0, *p1, *p2),
                    assigns("a", "b", "d", "e"), cfg, compact_every=1)
    meta = _read_state_meta(sd)
    assert meta["pairs_base"] == "pairs_base_v2"
    assert meta["pairs_deltas"] == []
    prior, _ = load_tail_state(spark, sd, cfg)
    assert sorted(tuple(r) for r in prior.collect()) == sorted(p0 + p1 + p2)

    # GC keeps dirs referenced by the current + previous markers only
    dirs = {d for d in os.listdir(sd) if d != "state.json"}
    assert dirs == {"pairs_base_v0", "pairs_delta_v1", "pairs_base_v2",
                    "assignments_v1", "assignments_v2"}

    # one more drain: epoch-0/1 leftovers age out
    save_tail_state(sd, pairs(), pairs(*p0, *p1, *p2),
                    assigns("a", "b", "d", "e"), cfg)
    meta = _read_state_meta(sd)
    assert meta["pairs_deltas"] == ["pairs_delta_v3"]
    dirs = {d for d in os.listdir(sd) if d != "state.json"}
    assert dirs == {"pairs_base_v2", "pairs_delta_v3",
                    "assignments_v2", "assignments_v3"}
    # the EMPTY delta still reads back (schema-carrying file forced)
    prior, _ = load_tail_state(spark, sd, cfg)
    assert sorted(tuple(r) for r in prior.collect()) == sorted(p0 + p1 + p2)

    # changed config: loader refuses, next save starts a fresh base
    other = DedupConfig(jaccard_threshold=0.5)
    assert load_tail_state(spark, sd, other) == (None, None)
    save_tail_state(sd, pairs(*p0), pairs(*p0), assigns("a"), other)
    meta = _read_state_meta(sd)
    assert meta["pairs_base"] == "pairs_base_v4"
    assert meta["pairs_deltas"] == []
    prior, _ = load_tail_state(spark, sd, other)
    assert sorted(tuple(r) for r in prior.collect()) == sorted(p0)


def test_crawl_window_stats_batch_equals_oracle_shape(spark):
    """Batch form: epoch-aligned tumbling windows, per-(window, lang)
    counters — checked against hand-computed values."""
    from dedup.streaming import crawl_window_stats

    base = 3600 * 473_352  # epoch-aligned hour
    rows = [
        ("u1", base + 60, "aaaa", "en"),
        ("u2", base + 120, "bb", "en"),
        ("u3", base + 180, "c", "fi"),
        ("u4", base + 3660, "dd", "en"),  # next window
    ]
    pages = spark.createDataFrame(
        rows, "url string, epoch long, text string, lang string"
    ).select(
        "url", F.timestamp_seconds("epoch").alias("warc_ts"), "text", "lang"
    )
    got = {
        (r["window_start_epoch"], r["lang"]): (
            r["window_end_epoch"], r["n_docs"], r["n_chars"],
            r["first_ts_epoch"], r["last_ts_epoch"],
        )
        for r in crawl_window_stats(pages).collect()
    }
    assert got == {
        (base, "en"): (base + 3600, 2, 6, base + 60, base + 120),
        (base, "fi"): (base + 3600, 1, 1, base + 180, base + 180),
        (base + 3600, "en"): (base + 7200, 1, 2, base + 3660, base + 3660),
    }


def test_crawl_window_stats_stream_drops_late_data(spark, tmp_path):
    """Streaming form: append mode emits a window once the watermark
    passes its end; a late row INSIDE the horizon still counts, a row
    BEYOND it is dropped — the watermark contract the batch form
    doesn't exercise."""
    from dedup.schema import PAGES_SCHEMA
    from dedup.streaming import crawl_window_stats, read_pages_stream

    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing, exist_ok=True)
    base = 3600 * 473_352  # W1 = [base, base+3600)

    def drop(name: str, rows: list[tuple[str, int, str, str]]) -> None:
        df = spark.createDataFrame(
            rows, "url string, epoch long, text string, lang string"
        ).select(
            "url",
            F.timestamp_seconds("epoch").alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            "text",
            "lang",
        )
        # align to the canonical pages schema (extra metadata columns null)
        for f in PAGES_SCHEMA.fieldNames():
            if f not in df.columns:
                df = df.withColumn(f, F.lit(None))
        df.select(*PAGES_SCHEMA.fieldNames()).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{landing}/{name}")

    def drain() -> None:
        stream = read_pages_stream(spark, f"{landing}/*", 1)
        q = (
            crawl_window_stats(stream, window="1 hour", watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    # drop 1: two on-time W1 rows; watermark after = base+120-1h < W1 end
    drop("d1", [("u1", base + 60, "aa", "en"), ("u2", base + 120, "b", "en")])
    drain()
    # drop 2: a LATE W1 row still inside the horizon (watermark from
    # drop 1 is below W1's end, so it must be merged), plus an advancer
    # two windows ahead that pushes the watermark past W1's end
    drop("d2", [
        ("u3", base + 30, "ccc", "en"),
        ("adv", base + 3 * 3600 + 5400, "x", "en"),
    ])
    drain()
    # drop 3: a TOO-LATE W1 row (watermark is now base+2.5h > W1 end —
    # must be dropped) plus a fresh advancer so the batch isn't empty
    drop("d3", [
        ("u4", base + 90, "zzzz", "en"),
        ("adv2", base + 5 * 3600, "x", "en"),
    ])
    drain()

    out = spark.read.parquet(sink)
    w1 = out.filter(F.col("window_start_epoch") == base).collect()
    assert len(w1) == 1, f"W1 must finalize exactly once, got {w1}"
    r = w1[0]
    # u1 + u2 + late-but-in-horizon u3; too-late u4 excluded
    assert r["n_docs"] == 3
    assert r["n_chars"] == 6  # 'aa' + 'b' + 'ccc'
    assert r["first_ts_epoch"] == base + 30
    assert r["last_ts_epoch"] == base + 120


def test_dirty_cluster_survivor_reuse(spark, tmp_path):
    """VERDICT r5 #1: drain 2's survivor stage must recompute ONLY the
    clusters touched by that drain's new edges/urls (dirty-cluster
    tracking) and reuse the prior survivor store for the rest, while
    every output stays identical to a full recompute."""
    import datetime

    import numpy as np

    from dedup.schema import PAGES_SCHEMA
    from dedup.streaming import run_streaming_dedup, streaming_verify_tail

    cfg = DedupConfig()
    rng = np.random.default_rng(33)
    voc_a = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    voc_b = ["zulu", "yankee", "xray", "whiskey", "victor", "uniform"]

    def doc(voc, seed_words, edits=()):
        w = list(seed_words)
        for pos, word in edits:
            w[pos] = word
        return " ".join(w)

    words_a = [voc_a[i] for i in rng.integers(0, len(voc_a), 250)]
    words_b = [voc_b[i] for i in rng.integers(0, len(voc_b), 250)]
    ts = datetime.datetime(2024, 6, 1)

    def row(url, text):
        return (url, ts, b"<html>", text, "en", [], [], [], ["h"], None)

    src = str(tmp_path / "dirty_src")
    work = str(tmp_path / "dirty_work")

    # drain 1: family A {a1, a2}, family B {b1, b2}, singleton e
    batches1 = (
        [row("https://d/a1", doc(voc_a, words_a))],
        [row("https://d/a2", doc(voc_a, words_a, [(10, "golf")])),
         row("https://d/b1", doc(voc_b, words_b))],
        [row("https://d/b2", doc(voc_b, words_b, [(20, "tango")])),
         row("https://d/e", " ".join(["kilo"] * 120))],
    )
    for batch in batches1:
        spark.createDataFrame(batch, PAGES_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(src)
    t1: dict = {}
    res1 = run_streaming_dedup(spark, src, work, cfg, timings=t1)
    a1 = {r["url"]: r["cluster_id"] for r in res1.assignments.collect()}
    assert a1["https://d/a1"] == a1["https://d/a2"]
    assert a1["https://d/b1"] == a1["https://d/b2"]
    res1.release()

    # drain 2: one near-dup of family A + one fresh singleton f —
    # family B and singleton e must NOT be recomputed
    spark.createDataFrame(
        [row("https://d/a3", doc(voc_a, words_a, [(200, "hotel")])),
         row("https://d/f", " ".join(["lima"] * 120))],
        PAGES_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    t2: dict = {}
    res2 = run_streaming_dedup(spark, src, work, cfg, timings=t2)

    # delta evidence: exactly ONE prior cluster (family A) is dirty;
    # family B's cluster and singleton e reuse their stored survivor
    # rows (2 kept), and only the A-pairs re-verify
    assert t2["n_dirty_clusters"] == 1, t2
    assert t2["n_prior_survivors_kept"] == 2, t2
    assert t2["n_cand_new"] == 2, t2

    got = {
        "assign": sorted(
            (r["url"], r["cluster_id"]) for r in res2.assignments.collect()
        ),
        "surv": sorted(
            tuple(str(r[c]) for c in (
                "cluster_id", "survivor_url", "n_members", "cluster_key",
                "merged_from", "sources", "notes", "lineage_json",
                "canonical_host", "reject_reason",
            ))
            for r in res2.survivors.collect()
        ),
    }
    res2.release()

    # full recompute over the same stores must match EXACTLY, including
    # lineage (reused rows are re-stamped with the current run identity)
    full = streaming_verify_tail(
        spark.read.parquet(f"{work}/pages"),
        spark.read.parquet(f"{work}/pairs"),
        cfg,
    )
    want = {
        "assign": sorted(
            (r["url"], r["cluster_id"]) for r in full.assignments.collect()
        ),
        "surv": sorted(
            tuple(str(r[c]) for c in (
                "cluster_id", "survivor_url", "n_members", "cluster_key",
                "merged_from", "sources", "notes", "lineage_json",
                "canonical_host", "reject_reason",
            ))
            for r in full.survivors.collect()
        ),
    }
    full.release()
    assert got == want
    assign2 = dict(got["assign"])
    assert assign2["https://d/a3"] == assign2["https://d/a1"]
    assert assign2["https://d/f"] == "https://d/f"
