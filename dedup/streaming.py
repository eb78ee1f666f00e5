"""Incremental ingest (Structured Streaming).

The reference is strictly batch-pairwise (SURVEY.md §2.2 streaming: ∅);
the rebuild's resumability is batch checkpointing. This module adds the
natural streaming FRONT-END a crawl pipeline needs: pages arrive as
parquet/file micro-batches, are quarantine-filtered and exact-deduped
in-stream (state-bounded by a watermark), and each micro-batch is
handed to the batch pipeline via foreachBatch for LSH/verify/cluster —
the recommended Spark pattern for stateful logic that needs full
DataFrame semantics (joins + windows) per batch.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F

from dedup.config import DedupConfig
from dedup.normalize import quarantine_filter, with_normalized
from dedup.schema import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def incremental_exact_dedup(
    pages_stream: DataFrame, cfg: DedupConfig, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming stage 1: quarantine filter + exact dedup.

    dropDuplicatesWithinWatermark bounds the dedup state — the streaming
    analogue of the exact-hash pre-dedup (dedup/candidates.exact_groups):
    a re-crawled byte-identical page within the watermark horizon is
    dropped before any downstream work.
    """
    norm = with_normalized(pages_stream)
    clean = quarantine_filter(norm)
    # same key domains as the batch exact_groups (dedup/candidates.py:35):
    # empty-NORM docs (CJK/Cyrillic/punctuation-only pages — every char
    # outside the normalizer's alphabet) fall back to their RAW text,
    # prefix-tagged so the domains can't collide. Keying the stream on
    # norm_text alone would drop every such same-alphabet page after the
    # first as a "re-crawl" — the streaming twin of the batch bug the
    # raw fallback exists for. The raw LENGTH rides along as a second
    # dedup column (the free narrow anti-collision factor).
    raw = F.coalesce(F.col("text"), F.lit(""))
    key = F.when(
        F.length("norm_text") > 0,
        F.concat(F.lit("n:"), F.col("norm_text")),
    ).otherwise(F.concat(F.lit("r:"), raw))
    key_len = F.when(
        F.length("norm_text") > 0, F.length("norm_text")
    ).otherwise(F.length(raw))
    keyed = clean.withColumn("text_hash", F.xxhash64(key)).withColumn(
        "_key_len", key_len
    )
    return (
        keyed.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["text_hash", "_key_len"])
        .drop("_key_len")
    )


def _bucket_batch_update(
    urls: list, seen, arr_urls: list, arr_sigs, floor: float, cap: int
):
    """One vectorized state update for a bucket's whole micro-batch of
    arrivals. Semantics are EXACTLY the sequential per-arrival loop it
    replaced (test_streaming has a property test against the reference
    loop):

    * arrival i compares against the state as it stood when i arrived —
      prior-batch entries whose url re-arrived at an index ≤ i are
      masked out (a re-crawl REPLACES its entry before comparing), and
      earlier same-batch arrivals count unless a later arrival of the
      same url sits between them;
    * matches at estimate ≥ floor emit (min_url, max_url, est) rows;
    * the post-batch state keeps un-replaced prior entries in order,
      then each arrived url once at its LAST arrival position, capped
      to the `cap` most recent.

    Returns (pair_rows, urls_after, seen_after)."""
    import numpy as np

    m, n = len(arr_urls), len(urls)
    rows: list[tuple[str, str, float]] = []
    first_idx: dict = {}
    last_idx: dict = {}
    for i, u in enumerate(arr_urls):
        first_idx.setdefault(u, i)
        last_idx[u] = i
    if m and n:
        # (m, n) agreement fractions in one broadcasted compare
        est1 = (arr_sigs[:, None, :] == seen[None, :, :]).mean(axis=2)
        state_first = np.asarray(
            [first_idx.get(u, m + 1) for u in urls], dtype=np.int64
        )
        valid1 = state_first[None, :] > np.arange(m)[:, None]
        for i, j in zip(*np.nonzero((est1 >= floor) & valid1)):
            u, u2 = arr_urls[int(i)], urls[int(j)]
            a, b = (u, u2) if u < u2 else (u2, u)
            rows.append((a, b, float(est1[i, j])))
    if m > 1:
        est2 = (arr_sigs[:, None, :] == arr_sigs[None, :, :]).mean(axis=2)
        # next arrival index of the same url after j (m+1 = none):
        # earlier arrival j is visible to arrival i only while no later
        # same-url arrival replaced it, i.e. next_occ[j] >= i
        next_occ = np.full(m, m + 1, dtype=np.int64)
        nxt: dict = {}
        for j in range(m - 1, -1, -1):
            u = arr_urls[j]
            if u in nxt:
                next_occ[j] = nxt[u]
            nxt[u] = j
        ii = np.arange(m)
        ua = np.asarray(arr_urls, dtype=object)
        valid2 = (
            (ii[None, :] < ii[:, None])
            & (next_occ[None, :] >= ii[:, None])
            & (ua[None, :] != ua[:, None])
        )
        for i, j in zip(*np.nonzero((est2 >= floor) & valid2)):
            u, u2 = arr_urls[int(i)], arr_urls[int(j)]
            a, b = (u, u2) if u < u2 else (u2, u)
            rows.append((a, b, float(est2[i, j])))
    keep_state = [j for j in range(n) if urls[j] not in first_idx]
    keep_arr = [i for i in range(m) if last_idx[arr_urls[i]] == i]
    urls_after = [urls[j] for j in keep_state] + [
        arr_urls[i] for i in keep_arr
    ]
    parts = []
    if keep_state:
        parts.append(seen[keep_state])
    if keep_arr:
        parts.append(arr_sigs[keep_arr])
    if parts:
        seen_after = np.vstack(parts)
    else:
        seen_after = seen[:0]
    return rows, urls_after[-cap:], seen_after[-cap:]


def streaming_near_dup_pairs(
    pages_stream: DataFrame,
    cfg: DedupConfig,
    state_cap: int | None = None,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Cross-batch NEAR-dup candidate stream — the custom stateful
    operator the foreachBatch handoff can't express (each batch only
    sees itself; exact re-crawls are caught by the watermark dedup, but
    a near-duplicate of a page seen three micro-batches ago needs the
    bucket history).

    Shape: per incoming page, MinHash signature + LSH band keys are
    computed with the SAME batch kernels/expressions as the batch
    pipeline (identical shingle/signature config — the north_rule
    invariant), then `applyInPandasWithState` keeps, PER BAND BUCKET,
    the signatures seen so far. A new arrival is compared against its
    bucket's state by signature agreement (the batch estimate
    pre-filter's statistic); matches emit (url_a, url_b, est_jaccard)
    candidate rows for the batch verify tail.

    State is bounded exactly like the batch hot-bucket cap: each bucket
    retains at most `state_cap` (default cfg.max_bucket_size)
    most-recent signatures — a boilerplate bucket degrades gracefully
    instead of growing without bound. A re-crawled url REPLACES its
    entry in every bucket the new content maps to (identical re-crawls,
    the common case, replace everywhere); entries in buckets a changed
    re-crawl no longer reaches are retained deliberately — each
    capture's pairs carry the similarity of the content at crawl time
    (WARC-archive semantics). Emitted pairs may repeat across bands
    (like batch LSH before its distinct); downstream dedups.

    State-SIZE vs state-COUNT: the per-bucket cap bounds each state
    entry, but the NUMBER of state keys grows with distinct
    (band_idx, band_key) values ever seen — ≈ docs × bands for diverse
    content. A long-running production stream must bound that with
    `state_ttl_ms`: buckets idle longer than the TTL are dropped
    (ProcessingTimeTimeout), trading cross-batch recall beyond the
    horizon for bounded total state — the streaming analogue of the
    watermark on the exact-dedup stage. None (default) keeps state
    forever, appropriate only for bounded backfills/tests.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    from dedup.minhash import band_key_expr, signatures

    cap = state_cap if state_cap is not None else cfg.max_bucket_size
    floor = cfg.estimate_floor

    norm = with_normalized(pages_stream)
    clean = quarantine_filter(norm)
    # degenerate docs — normalized text shorter than one shingle (CJK/
    # Cyrillic/punctuation-only pages normalize to '' under the
    # [a-z0-9åäö] alphabet) — share the constant sentinel-shingle
    # signature, so banding them would pair every such same-alphabet
    # page at estimate 1.0 and the verify tail would fuse them all
    # (sentinel-shingle jaccard = 1.0). Same bandable predicate as the
    # batch pipeline (pipeline.py): they dedup only via the exact
    # watermark stage.
    bandable = clean.filter(F.length("norm_text") >= F.lit(cfg.k_shingle))
    sig = signatures(bandable, cfg).select("url", "sig")
    # band keys exploded as a PROJECTION that keeps the sig column — a
    # join back onto sig here would be a watermark-less stream-stream
    # self-join whose join state retains every row of both sides
    # forever; the projection keeps the bucket operator the ONLY
    # stateful op, bounded by state_cap
    b, r = cfg.effective_bands, cfg.effective_rows
    keys = F.transform(
        F.sequence(F.lit(0), F.lit(b - 1)),
        lambda i: F.struct(
            i.cast("int").alias("band_idx"),
            band_key_expr(F.col("sig"), i, r, cfg).alias("band_key"),
        ),
    )
    bands = sig.select("url", "sig", F.explode(keys).alias("bk")).select(
        "url", "sig", F.col("bk.band_idx"), F.col("bk.band_key")
    )

    out_schema = "url_a string, url_b string, est_jaccard double"
    state_schema = "urls array<string>, sigs array<array<long>>"

    width = cfg.effective_num_perm

    def bucket_fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            # TTL expiry: drop the idle bucket's state, emit nothing
            state.remove()
            yield pd.DataFrame(
                {"url_a": [], "url_b": [], "est_jaccard": []}
            )
            return
        urls: list[str]
        if state.exists:
            st_urls, st_sigs = state.get
            urls = list(st_urls)
            seen = np.asarray(
                [list(s) for s in st_sigs], dtype=np.int64
            ).reshape(len(urls), width)
        else:
            urls = []
            seen = np.empty((0, width), dtype=np.int64)
        # gather the whole micro-batch's arrivals, then ONE vectorized
        # update: all state compares and all within-batch compares are
        # matrix ops instead of a per-arrival Python loop with an
        # O(cap) vstack state rebuild per row
        arr_urls: list[str] = []
        sig_rows: list = []
        for pdf in pdf_iter:
            arr_urls.extend(str(u) for u in pdf["url"])
            sig_rows.extend(pdf["sig"])
        arr_sigs = (
            np.asarray([list(s) for s in sig_rows], dtype=np.int64)
            .reshape(len(arr_urls), width)
        )
        rows, urls, seen = _bucket_batch_update(
            urls, seen, arr_urls, arr_sigs, floor, cap
        )
        state.update((urls, [[int(v) for v in row] for row in seen]))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(rows, columns=["url_a", "url_b", "est_jaccard"])

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        bands.groupBy("band_idx", "band_key")
        .applyInPandasWithState(
            bucket_fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def crawl_window_stats(
    pages: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time tumbling-window ingest statistics — the watermarked
    windowed aggregation a crawl monitor runs over the landing stream:
    per (window, lang) the doc count, total text chars, and the
    min/max event second actually observed.

    ONE expression serves batch and streaming (the operator is the
    aggregation, not the trigger): on a batch frame it is a plain
    groupBy over the derived window; on a STREAM a watermark is
    attached first, so state is bounded and append mode emits each
    window exactly once when the watermark passes its end — rows later
    than the horizon are dropped as late data (size `watermark` to the
    crawl's out-of-orderness, same contract as incremental_exact_dedup).

    Output columns are epoch seconds (BIGINT), not timestamps: stable
    to hash, timezone-free, and identical under batch and streaming.

    Scale shape: partial aggregation map-side, one shuffle on
    (window, lang) — counters, never row retention; streaming state is
    one small row per open window × lang.

    Reference analogue: none (the reference is batch-pairwise); this is
    part of the streaming front-end the rebuild adds (SURVEY.md §2.2
    row 50), exercising the watermark/window machinery the near-dup
    operator's custom state cannot."""
    src = (
        pages.withWatermark("warc_ts", watermark)
        if pages.isStreaming
        else pages
    )
    return (
        src.groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
            F.min(F.unix_timestamp("warc_ts")).alias("first_ts_epoch"),
            F.max(F.unix_timestamp("warc_ts")).alias("last_ts_epoch"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            F.unix_timestamp(F.col("w.end")).alias("window_end_epoch"),
            "lang",
            "n_docs",
            "n_chars",
            "first_ts_epoch",
            "last_ts_epoch",
        )
    )


# ---------------------------------------------------------------------------
# Incremental tail state
# ---------------------------------------------------------------------------

TAIL_STATE_VERSION = 3  # v3 adds the prior-survivor store (dirty-
#   cluster survivor reuse); v2 dirs fail the version check and degrade
#   to one full recompute, never to wrong output


def _cfg_fingerprint(cfg: DedupConfig) -> str:
    """Stable serialization of every knob the gated-pair state depends
    on. Prior verified pairs are reusable ONLY under the exact config
    that produced them (thresholds, gates, shingle params all feed the
    stored columns); a mismatch invalidates the state and the next
    drain recomputes from scratch."""
    from dataclasses import asdict

    return json.dumps(asdict(cfg), sort_keys=True, default=str)


def _read_state_meta(state_dir: str) -> dict | None:
    marker = os.path.join(state_dir, "state.json")
    if not os.path.exists(marker):
        return None
    try:
        with open(marker) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def load_tail_state(
    spark: SparkSession, state_dir: str, cfg: DedupConfig
) -> tuple[DataFrame | None, DataFrame | None]:
    """(prior_pairs, prior_assignments) from a committed tail-state dir,
    or (None, None) when absent/uncommitted/config-mismatched — every
    invalid shape degrades to a full recompute, never to wrong output.

    NOTE: the state is also implicitly conditioned on the SIDE TABLES
    (sources / host_ids / authorized_names) that fed the gates; callers
    that change a side table between drains must clear the state dir.
    """
    meta = _read_state_meta(state_dir)
    if (
        meta is None
        or meta.get("version") != TAIL_STATE_VERSION
        or meta.get("cfg") != _cfg_fingerprint(cfg)
    ):
        return None, None
    # LSM shape: one compacted base + one delta dir per drain since the
    # last compaction (see save_tail_state); the prior pair table is
    # the union of all of them, read in one multi-path parquet scan
    pair_dirs = ([meta["pairs_base"]] if meta.get("pairs_base") else []) + (
        meta.get("pairs_deltas") or []
    )
    if not pair_dirs:
        return None, None
    try:
        pairs = spark.read.parquet(
            *[os.path.join(state_dir, d) for d in pair_dirs]
        )
        assigns = spark.read.parquet(
            os.path.join(state_dir, meta["assignments"])
        )
    except (AnalysisException, KeyError):
        return None, None
    return pairs, assigns


def load_tail_cursor(state_dir: str, cfg: DedupConfig) -> str | None:
    """The committed pairs-store read cursor (ISO UTC seconds): files in
    the candidate store modified at or before this instant were already
    anti-joined/gated by a previous drain, so the next drain may scan
    the store with `modifiedAfter` and touch only the delta files. The
    cursor is only valid under the same config that produced the gated
    state (like the state itself) and is absent on pre-cursor state
    dirs — both degrade to a full scan, never to wrong output."""
    meta = _read_state_meta(state_dir)
    if (
        meta is None
        or meta.get("version") != TAIL_STATE_VERSION
        or meta.get("cfg") != _cfg_fingerprint(cfg)
    ):
        return None
    return meta.get("cursor")


def load_tail_survivors(
    spark: SparkSession, state_dir: str, cfg: DedupConfig
) -> DataFrame | None:
    """The prior drain's full survivor table (kept ∪ rejected rows),
    or None when absent/invalid — the tail then falls back to a full
    survivor recompute (correct, just not O(delta))."""
    meta = _read_state_meta(state_dir)
    if (
        meta is None
        or meta.get("version") != TAIL_STATE_VERSION
        or meta.get("cfg") != _cfg_fingerprint(cfg)
        or not meta.get("survivors")
    ):
        return None
    try:
        return spark.read.parquet(
            os.path.join(state_dir, meta["survivors"])
        )
    except AnalysisException:
        return None


def save_tail_state(
    state_dir: str,
    new_pairs: DataFrame,
    full_pairs: DataFrame,
    assignments: DataFrame,
    cfg: DedupConfig,
    cursor: str | None = None,
    compact_every: int = 16,
    survivors: DataFrame | None = None,
) -> None:
    """Commit this drain's gated pairs + assignments (and the pairs-
    store read cursor, see load_tail_cursor) as the next drain's prior
    state.

    LSM-shaped pair state: the per-drain WRITE is `pairs_delta_v{k}` —
    only the pairs gated THIS drain (O(delta)), not the accumulated
    table (O(corpus); rewriting the full wide pair table per trigger
    would re-introduce on the write side exactly the per-drain
    O(corpus) cost the incremental tail removed from the compute side).
    Every `compact_every` drains the deltas are folded into a fresh
    `pairs_base_v{k}` (one amortized O(corpus) write) so the number of
    live delta dirs — and the next drain's multi-path scan — stays
    bounded. Assignments are narrow (url, cluster_id) and rewritten
    whole each drain: new edges can relabel ANY old cluster, so there
    is no per-row delta to exploit.

    Epoch-versioned + crash-safe: data dirs are written fresh, then the
    marker flips atomically (os.replace). Dirs referenced by the
    current OR previous marker are kept — this drain's result frames
    lazily reference the previous epoch's files (the pairs output
    unions the prior parquet), so deleting them here would break any
    caller action after the save; everything older is garbage-
    collected. A crash mid-save leaves the old marker pointing at
    intact old dirs: the next drain re-gates a larger delta, never
    produces wrong output."""
    os.makedirs(state_dir, exist_ok=True)
    meta = _read_state_meta(state_dir)
    valid_prior = (
        meta is not None
        and meta.get("version") == TAIL_STATE_VERSION
        and meta.get("cfg") == _cfg_fingerprint(cfg)
        and meta.get("assignments")
    )
    epoch = (meta["epoch"] + 1) if meta and "epoch" in meta else 0

    def _write(name: str, df: DataFrame) -> str:
        out = os.path.join(state_dir, name)
        if os.path.exists(out):
            shutil.rmtree(out)
        df.write.mode("overwrite").parquet(out)
        if not any(f.endswith(".parquet") for f in os.listdir(out)):
            # an EMPTY delta (drain with no new pairs) can coalesce to
            # zero partitions → zero part files → the next multi-path
            # read has no footer to infer this path's schema from;
            # force one schema-carrying empty file
            df.sparkSession.createDataFrame([], df.schema).repartition(
                1
            ).write.mode("overwrite").parquet(out)
        return name

    if valid_prior and len(meta.get("pairs_deltas") or []) < compact_every:
        base = meta.get("pairs_base")
        deltas = (meta.get("pairs_deltas") or []) + [
            _write(f"pairs_delta_v{epoch}", new_pairs)
        ]
    else:
        # fresh start (no/invalid/mismatched prior) or compaction due:
        # one full write, delta chain resets
        base = _write(f"pairs_base_v{epoch}", full_pairs)
        deltas = []
    assignments_dir = _write(f"assignments_v{epoch}", assignments)
    # survivors: narrow per-cluster rows, rewritten whole like the
    # assignments (a merged cluster supersedes its members' old rows,
    # so there is no per-row delta to exploit without a compaction
    # log); COMPUTE per drain is O(delta) via dirty-cluster reuse
    survivors_dir = (
        _write(f"survivors_v{epoch}", survivors)
        if survivors is not None
        else None
    )
    marker = os.path.join(state_dir, "state.json")
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "version": TAIL_STATE_VERSION,
                "cfg": _cfg_fingerprint(cfg),
                "epoch": epoch,
                "cursor": cursor,
                "pairs_base": base,
                "pairs_deltas": deltas,
                "assignments": assignments_dir,
                "survivors": survivors_dir,
            },
            f,
        )
    os.replace(tmp, marker)
    # GC: keep every dir referenced by the marker just written or by
    # the previous one (lazy readers); delete the rest of our prefixes
    referenced = set(deltas) | {assignments_dir} | ({base} if base else set())
    if survivors_dir:
        referenced.add(survivors_dir)
    if meta:
        referenced |= set(meta.get("pairs_deltas") or [])
        referenced |= {
            meta.get(k)
            for k in ("pairs_base", "assignments", "survivors")
            if meta.get(k)
        }
        if meta.get("version") == 1 and "epoch" in meta:  # pre-LSM layout
            referenced |= {
                f"pairs_v{meta['epoch']}", f"assignments_v{meta['epoch']}"
            }
    for name in os.listdir(state_dir):
        if name in referenced or name == "state.json":
            continue
        for prefix in (
            "pairs_v", "pairs_base_v", "pairs_delta_v", "assignments_v",
            "survivors_v",
        ):
            if name.startswith(prefix):
                try:
                    int(name[len(prefix):])
                except ValueError:
                    continue
                shutil.rmtree(os.path.join(state_dir, name))
                break


@dataclass
class StreamingDedupResult:
    """Batch-tail outputs over the accumulated streaming stores."""

    pairs: DataFrame        # gated candidate pairs (+jaccard, reasons)
    edges: DataFrame        # pairs that passed every gate
    assignments: DataFrame  # (url, cluster_id) for every stored url
    survivors: DataFrame    # one preferred record per cluster
    rejected: DataFrame     # both-authorized clusters routed to reject
    cached: tuple = ()      # frames the tail persisted (release() owns)
    new_pairs: DataFrame | None = None  # pairs gated THIS drain only
    #   (the O(delta) slice save_tail_state persists; == pairs on a
    #   full recompute)
    survivors_all: DataFrame | None = None  # survivors ∪ rejected, the
    #   pre-split frame save_tail_state persists as the next drain's
    #   prior survivor store

    def release(self) -> None:
        """Unpersist every cache the tail pinned (same contract as
        DedupResult.release)."""
        for df in self.cached:
            try:
                df.unpersist()
            except Exception:  # session already stopped
                pass


def _open_pages_stream(
    spark: SparkSession,
    input_path: str,
    input_format: str,
    max_files_per_trigger: int,
) -> DataFrame:
    if input_format == "warc":
        from dedup.warc import read_pages_stream_warc

        return read_pages_stream_warc(spark, input_path, max_files_per_trigger)
    if input_format == "jsonl":
        from dedup.pages import read_pages_stream_jsonl

        return read_pages_stream_jsonl(spark, input_path, max_files_per_trigger)
    if input_format != "parquet":
        raise ValueError(f"unknown streaming input format {input_format!r}")
    return read_pages_stream(spark, input_path, max_files_per_trigger)


def start_streaming_stores(
    spark: SparkSession,
    input_path: str,
    work_dir: str,
    cfg: DedupConfig,
    watermark: str = "1 hour",
    max_files_per_trigger: int = 1,
    state_cap: int | None = None,
    state_ttl_ms: int | None = None,
    input_format: str = "parquet",
) -> list:
    """Start the two exactly-once streams the verify tail consumes:

    1. ``{work_dir}/pages`` — quarantine-filtered, watermark-exact-
       deduped clean pages (the accumulated corpus store; html dropped,
       norm_text kept so the tail can recompute shingles/features).
    2. ``{work_dir}/pairs`` — cross-batch near-dup candidates from the
       stateful bucket operator.

    Both run ``Trigger.AvailableNow`` against their own checkpoints, so
    a restarted driver resumes exactly where it stopped (the batch
    checkpoint/resume analogue). Returns the StreamingQuery handles.

    A candidate pair may name a url the exact-dedup watermark dropped
    (a byte-identical re-crawl under a new url): the tail's inner join
    onto the pages store discards it — correct, because the surviving
    twin carries the same content through verification.
    """
    stream = _open_pages_stream(
        spark, input_path, input_format, max_files_per_trigger
    )
    pages_q = (
        incremental_exact_dedup(stream, cfg, watermark)
        .drop("html")
        .writeStream.format("parquet")
        .option("path", f"{work_dir}/pages")
        .option("checkpointLocation", f"{work_dir}/_ckpt_pages")
        .trigger(availableNow=True)
        .start()
    )
    stream2 = _open_pages_stream(
        spark, input_path, input_format, max_files_per_trigger
    )
    pairs_q = (
        streaming_near_dup_pairs(
            stream2, cfg, state_cap=state_cap, state_ttl_ms=state_ttl_ms
        )
        .writeStream.format("parquet")
        .option("path", f"{work_dir}/pairs")
        .option("checkpointLocation", f"{work_dir}/_ckpt_pairs")
        .trigger(availableNow=True)
        .start()
    )
    return [pages_q, pairs_q]


def streaming_verify_tail(
    pages_store: DataFrame,
    candidate_pairs: DataFrame,
    cfg: DedupConfig,
    sources: DataFrame | None = None,
    host_ids: DataFrame | None = None,
    authorized_names: DataFrame | None = None,
    run_id: str = "stream-0",
    run_ts: str = "1970-01-01T00:00:00+00:00",
    prior_pairs: DataFrame | None = None,
    prior_assignments: DataFrame | None = None,
    prior_survivors: DataFrame | None = None,
    new_page_urls: DataFrame | None = None,
    timings: dict | None = None,
) -> StreamingDedupResult:
    """Run the stream's candidates through the SAME tail as the batch
    pipeline — exact Jaccard, then the full reason-gate stack, then
    connected components, then survivor selection with the full
    post-merge ordering (reprint notes, authorized-format override
    LAST, applyPostMergeModifications parity) — the way the reference
    feeds every pair through canMerge regardless of provenance
    (marc-record-merge-melindautils.js:84-104). The stream front-end
    only proposes; nothing reaches a cluster without passing the gates.

    pages_store: the accumulated clean store written by
    start_streaming_stores (normalized columns present).
    candidate_pairs: (url_a, url_b[, est_jaccard]) from the near-dup
    stream; repeats across bands/batches are deduped here.

    INCREMENTAL mode (prior_pairs/prior_assignments from a previous
    drain's load_tail_state): the expensive work is restricted to the
    DELTA — the reference's unit of work is the new pair (canMerge,
    marc-record-merge-melindautils.js:74-120), and a production crawl
    must not pay O(corpus) per trigger:
    * Jaccard (the shingle pandas UDF) + the reason gates run ONLY on
      candidate pairs not in prior_pairs (pair content is immutable:
      store rows never change and the gates are pure functions of the
      two rows + side tables, so a gated pair never needs re-gating);
    * connected components runs on the DIRTY SLICE only: prior clusters
      touched by a new verified edge are folded to star edges
      (cluster_id ← url) and unioned with the new edges; untouched
      prior assignments are kept verbatim (no new edge can change a
      component none of its members appear in) — components and
      min-labels are IDENTICAL to a full recompute;
    * the survivor window (select → reprint → authorized override)
      re-runs ONLY over the dirty clusters plus this drain's new
      singleton urls (dirty-cluster tracking — the reference's
      post-merge work is per merged pair, post-merge-modifiers.js, not
      per corpus). Untouched clusters reuse their prior survivor rows
      from `prior_survivors`, re-stamped with this drain's
      run_id/run_ts so the output equals a full recompute exactly.
      Without a prior survivor store (older state) the survivor chain
      falls back to the full-membership recompute.
    * `new_page_urls` (the pages-store read cursor's delta, when the
      caller has one) bounds the singleton fill to this drain's new
      urls; without it the fill derives the delta by anti-joining the
      store against the prior assignments (degraded, still correct).
    Outputs are identical to a full recompute by construction.

    timings (optional dict) receives n_cand_total / n_cand_new plus
    n_dirty_clusters / n_prior_survivors_kept — the delta-evidence
    counters the incremental tests assert on.
    """
    from dedup.cluster import assignments_with_singletons, connected_components
    from dedup.minhash import with_shingles
    from dedup.survivor import (
        apply_authorized_override,
        reprint_notes,
        select_survivors,
    )
    from dedup.verify import (
        attach_features,
        jaccard_on_pairs,
        pair_reasons,
        url_features,
        verified_edges,
    )

    cand = candidate_pairs.select("url_a", "url_b").distinct()
    # LIVE filter before the delta split: the near-dup stream bands
    # every incoming page, so its store carries pairs naming urls the
    # exact-dedup watermark dropped (byte-identical re-crawls under new
    # urls — the surviving twin carries the content). Those DEAD pairs
    # can never be gated (the Jaccard join onto the store would drop
    # them anyway), so they never enter prior_pairs — without this
    # filter every margin re-scan re-counts them as "new" forever and
    # they re-pay the explode + store join each drain. Two semi-joins
    # on the narrow url column kill them at the door instead.
    live = pages_store.select("url")
    if prior_pairs is not None:
        # incremental drains read a CURSOR-bounded candidate delta, so
        # `cand` is small while the accumulated store is the big side:
        # invert the membership check so the broadcast side is the
        # delta (guide §3.1 — never shuffle the store for a small
        # probe). live_urls = store ∩ cand-endpoints is delta-sized;
        # the semi-joins below then run small-vs-small.
        cand_urls = cand.select(
            F.explode(F.array("url_a", "url_b")).alias("url")
        ).distinct()
        live = live.join(F.broadcast(cand_urls), "url")
    cand = cand.join(
        live.withColumnRenamed("url", "url_a"), "url_a", "left_semi"
    ).join(live.withColumnRenamed("url", "url_b"), "url_b", "left_semi")
    if prior_pairs is not None:
        # the delta: candidates not already gated in a previous drain.
        # INVERTED anti-join: a left-anti can only broadcast its RIGHT
        # side, so `cand anti prior` would shuffle the accumulated
        # prior pair store every drain. Instead semi-join the store
        # against the broadcast delta (store scanned, never shuffled —
        # guide §3.1) to get the already-gated subset (≤ |cand|), then
        # anti-join the delta against that small set.
        already = prior_pairs.select("url_a", "url_b").join(
            F.broadcast(cand), ["url_a", "url_b"], "left_semi"
        )
        new_cand = cand.join(
            F.broadcast(already), ["url_a", "url_b"], "left_anti"
        )
    else:
        new_cand = cand
    if timings is not None:
        timings["n_cand_total"] = cand.count()
        timings["n_cand_new"] = new_cand.count()
    # shingles recomputed from the stored norm_text for urls that appear
    # in a NEW candidate pair ONLY (the batch pipeline's recompute-for-
    # survivors discipline — the wide arrays never hit a cache)
    needed = new_cand.select(
        F.explode(F.array("url_a", "url_b")).alias("url")
    ).distinct()
    sh = with_shingles(pages_store.join(needed, "url"), cfg).select(
        "url", "shingles"
    )
    with_j = jaccard_on_pairs(new_cand, sh)

    feats = url_features(
        pages_store, sources,
        extra_cols=tuple(sorted(set(cfg.field_rules) | set(cfg.count_fields))),
    )
    pairs = attach_features(with_j, feats)
    # same column-presence wiring as run_dedup: every rule/count gate
    # whose column exists on the store participates
    rule_columns = {
        t: (f"a_{t}", f"b_{t}")
        for t in sorted(cfg.field_rules)
        if t in pages_store.columns
    }
    count_columns = {
        t: (f"a_{t}", f"b_{t}")
        for t in cfg.count_fields
        if t in pages_store.columns
    }
    pairs = pair_reasons(
        pairs, cfg, host_ids,
        rule_columns=rule_columns or None,
        count_columns=count_columns or None,
    )
    # three consumers (the caller's pairs write, verified_edges, and
    # anything reading reasons) share a chain that re-runs the shingle
    # pandas UDF + both feature joins per consumer — the batch rule:
    # persist iff recompute crosses a python UDF
    pairs = pairs.persist()
    new_pairs = pairs
    if prior_pairs is not None:
        # full pair table for output parity (prior rows come off a
        # cheap parquet scan, not a recompute — unionByName because the
        # stored column order may differ from the fresh plan's)
        pairs = new_pairs.unionByName(prior_pairs)
    edges = verified_edges(pairs, cfg, "stream")
    cached: list[DataFrame] = [new_pairs]
    dirty_cids = dirty_assign = None
    if prior_assignments is not None:
        # DIRTY-CLUSTER tracking: only prior components containing an
        # endpoint of a NEW verified edge can change (edges are
        # append-only and store rows immutable, so untouched components
        # and their min-labels are fixed points). Fold the dirty slice
        # to star edges, union with the new edges, and CC runs on
        # O(new edges + dirty-cluster members) instead of O(all prior
        # non-singleton urls) per drain.
        new_edges = verified_edges(new_pairs, cfg, "stream").select(
            "url_a", "url_b"
        )
        touched = new_edges.select(
            F.explode(F.array("url_a", "url_b")).alias("url")
        ).distinct()
        # touched/dirty_cids are delta-sized (new-edge endpoints and
        # their clusters) — broadcast them through every slice join; a
        # bulk backfill that makes the delta corpus-sized should run
        # incremental=False instead
        dirty_cids = (
            prior_assignments.join(F.broadcast(touched), "url")
            .select("cluster_id").distinct().persist()
        )
        cached.append(dirty_cids)
        fold_dirty = (
            prior_assignments.join(F.broadcast(dirty_cids), "cluster_id")
            .filter(F.col("url") != F.col("cluster_id"))
            .select(
                F.col("cluster_id").alias("url_a"),
                F.col("url").alias("url_b"),
            )
        )
        slim = (
            new_edges.unionByName(fold_dirty).distinct()
            .localCheckpoint(eager=True)
        )
        cc_assign = connected_components(slim, n_edges=slim.count())
        # singleton fill bounded to THIS drain's new urls: the pages
        # cursor delta when the caller has one (minus the re-read
        # margin's already-known urls), else derived by anti-joining
        # the store against the prior assignments (degraded path)
        if new_page_urls is not None:
            delta_urls = new_page_urls.select("url").distinct()
            known = prior_assignments.select("url").join(
                F.broadcast(delta_urls), "url"
            )
            delta_urls = delta_urls.join(known, "url", "left_anti")
        else:
            delta_urls = pages_store.select("url").join(
                prior_assignments.select("url"), "url", "left_anti"
            )
        singles = delta_urls.join(
            cc_assign.select("url"), "url", "left_anti"
        ).select("url", F.col("url").alias("cluster_id"))
        dirty_assign = cc_assign.unionByName(singles).persist()
        cached.append(dirty_assign)
        # full assignment surface: untouched prior rows ride through
        # verbatim (broadcast anti-join on the slim dirty id set — the
        # prior store is scanned, never shuffled)
        assign = prior_assignments.join(
            F.broadcast(dirty_cids), "cluster_id", "left_anti"
        ).unionByName(dirty_assign)
        if timings is not None:
            timings["n_dirty_clusters"] = dirty_cids.count()
    else:
        slim = (
            edges.select("url_a", "url_b").distinct()
            .localCheckpoint(eager=True)
        )
        cc_assign = connected_components(slim, n_edges=slim.count())
        assign = assignments_with_singletons(
            cc_assign, pages_store.select("url")
        )
    # two consumers (assignments write + the members join below)
    assign = assign.persist()
    cached.append(assign)
    # survivor tail, batch-ordered (run_dedup's exact sequence): the
    # stream works on real urls throughout, so no uid/label remap is
    # needed — feats already carries everything select_survivors reads
    if dirty_assign is not None and prior_survivors is not None:
        # dirty slice only: survivor rows are pure per-cluster
        # functions of the members' (immutable) features + cfg +
        # run_id/run_ts, so untouched clusters reuse their stored rows
        # with this run's identity re-stamped — output equals the full
        # recompute exactly
        members = dirty_assign.join(feats, "url")
        survivors = select_survivors(
            members, cfg, authority_sources=cfg.authority_sources,
            run_id=run_id, run_ts=run_ts,
        )
        survivors = reprint_notes(members, survivors)
        survivors = apply_authorized_override(
            survivors, members, authorized_names
        )
        kept_prior = prior_survivors.join(
            F.broadcast(dirty_cids), "cluster_id", "left_anti"
        ).withColumn(
            "lineage",
            F.struct(
                F.col("lineage.merged_from_note").alias("merged_from_note"),
                F.lit(run_id).alias("run_id"),
                F.lit(run_ts).alias("run_ts"),
                F.lit("DEDUP").alias("agency"),
            ),
        ).withColumn("lineage_json", F.to_json(F.col("lineage")))
        if timings is not None:
            timings["n_prior_survivors_kept"] = kept_prior.count()
        survivors = survivors.unionByName(
            kept_prior.select(*survivors.columns)
        )
    else:
        members = assign.join(feats, "url")
        survivors = select_survivors(
            members, cfg, authority_sources=cfg.authority_sources,
            run_id=run_id, run_ts=run_ts,
        )
        survivors = reprint_notes(members, survivors)
        survivors = apply_authorized_override(
            survivors, members, authorized_names
        )
    # survivors/rejected are two filters of this frame; unpersisted,
    # each write re-runs the whole survivor window + override chain
    survivors = survivors.persist()
    cached.append(survivors)
    rejected = survivors.filter(F.col("reject_reason").isNotNull())
    kept = survivors.filter(F.col("reject_reason").isNull())
    return StreamingDedupResult(
        pairs=pairs, edges=edges, assignments=assign,
        survivors=kept, rejected=rejected,
        # new_pairs is the persisted object (pairs may be a derived
        # union); release() must unpersist exactly what was pinned
        cached=tuple(cached),
        new_pairs=new_pairs,
        survivors_all=survivors,
    )


def run_streaming_dedup(
    spark: SparkSession,
    input_path: str,
    work_dir: str,
    cfg: DedupConfig,
    sources: DataFrame | None = None,
    host_ids: DataFrame | None = None,
    authorized_names: DataFrame | None = None,
    watermark: str = "1 hour",
    max_files_per_trigger: int = 1,
    state_cap: int | None = None,
    state_ttl_ms: int | None = None,
    timeout_s: int = 600,
    run_id: str = "stream-0",
    run_ts: str = "1970-01-01T00:00:00+00:00",
    incremental: bool = True,
    timings: dict | None = None,
    input_format: str = "parquet",
) -> StreamingDedupResult:
    """One-call streaming dedup: drain the input with the two
    exactly-once streams, then run the batch verify tail over the
    accumulated stores. Re-invoking after more files land resumes both
    streams from their checkpoints and re-derives the tail over the
    grown stores (the tail is a deterministic function of the stores).

    incremental=True (default) persists the gated pairs + assignments
    under {work_dir}/tail_state after each drain and restricts the next
    drain's Jaccard/gate work to candidate pairs not yet gated, folding
    new edges into the prior assignments (see streaming_verify_tail) —
    identical outputs, O(delta) instead of O(corpus) verify cost per
    trigger. Clear the state dir (or pass incremental=False) if a SIDE
    TABLE changed between drains; a changed DedupConfig invalidates the
    state automatically."""
    import time as _time

    _t0 = _time.time()
    for q in start_streaming_stores(
        spark, input_path, work_dir, cfg,
        watermark=watermark,
        max_files_per_trigger=max_files_per_trigger,
        state_cap=state_cap,
        state_ttl_ms=state_ttl_ms,
        input_format=input_format,
    ):
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(f"streaming store {q.name!r} did not drain")
    if timings is not None:
        # mode-independent ingest cost vs the (incremental-vs-full) tail
        timings["t_streams_s"] = round(_time.time() - _t0, 2)
        _t0 = _time.time()
    # the cursor makes the candidate READ O(delta): every sink file
    # modified at or before the committed cursor was already scanned,
    # anti-joined and (if alive) gated by a previous drain, so only the
    # files this drain's stream appended need to be touched. Captured
    # AFTER awaitTermination (all of this drain's sink files exist) and
    # applied with a 2 s re-read margin at load time — a crash between
    # the streams and the state commit, or mtime skew on a real
    # filesystem, re-scans a slightly larger delta, never misses files.
    drain_end = datetime.now(timezone.utc)
    state_dir = f"{work_dir}/tail_state"
    prior_cursor = (
        load_tail_cursor(state_dir, cfg) if incremental else None
    )
    pages_store = spark.read.parquet(f"{work_dir}/pages")
    pairs_reader = spark.read.schema(
        "url_a string, url_b string, est_jaccard double"
    )
    if prior_cursor is not None:
        # modifiedAfter's bare timestamp is parsed in the SESSION
        # timezone (get_spark pins UTC, but a foreign session may not);
        # the cursor is UTC-aware, so convert before formatting — a
        # mismatch here would silently skip up to a whole TZ offset of
        # delta files
        from zoneinfo import ZoneInfo

        tz_name = spark.conf.get("spark.sql.session.timeZone", "UTC")
        try:
            tz = ZoneInfo(tz_name)
        except (KeyError, ValueError):  # offset-style ids ("+08:00")
            tz = timezone.utc if tz_name.upper() in ("UTC", "Z") else None
        if tz is None:
            # un-mappable session zone: a wrong margin could SKIP delta
            # files, so fall back to scanning the full store instead
            prior_cursor = None
        else:
            margin = (
                datetime.fromisoformat(prior_cursor) - timedelta(seconds=2)
            ).astimezone(tz)
            margin_str = margin.strftime("%Y-%m-%dT%H:%M:%S")
            pairs_reader = pairs_reader.option(
                "modifiedAfter", margin_str
            )
    # pages delta under the SAME cursor: new urls this drain, feeding
    # the tail's singleton fill and dirty-cluster slice without a
    # full-store anti-join (margin overlap is re-filtered inside the
    # tail against the prior assignments; no-cursor runs pass None and
    # the tail derives the delta itself)
    new_page_urls = None
    if prior_cursor is not None:
        try:
            new_page_urls = (
                spark.read.option("modifiedAfter", margin_str)
                .parquet(f"{work_dir}/pages")
                .select("url")
            )
        except AnalysisException as e:
            code = getattr(e, "getErrorClass", lambda: None)() or str(e)
            if not ("PATH_NOT_FOUND" in str(code)
                    or "UNABLE_TO_INFER_SCHEMA" in str(code)):
                raise
            new_page_urls = spark.createDataFrame([], "url string")
    try:
        candidate_pairs = pairs_reader.parquet(f"{work_dir}/pairs")
    except AnalysisException as e:
        # ONLY the two "sink wrote no files" shapes may degrade to zero
        # candidates (missing dir / metadata-only dir with no schema);
        # any other read failure (corrupt footer, permissions) must
        # surface — swallowing it would silently pass duplicates
        code = getattr(e, "getErrorClass", lambda: None)() or str(e)
        if not ("PATH_NOT_FOUND" in str(code)
                or "UNABLE_TO_INFER_SCHEMA" in str(code)):
            raise
        candidate_pairs = spark.createDataFrame(
            [], "url_a string, url_b string, est_jaccard double"
        )
    prior_pairs, prior_assign = (
        load_tail_state(spark, state_dir, cfg)
        if incremental
        else (None, None)
    )
    prior_surv = (
        load_tail_survivors(spark, state_dir, cfg) if incremental else None
    )
    res = streaming_verify_tail(
        pages_store, candidate_pairs, cfg, sources=sources,
        host_ids=host_ids, authorized_names=authorized_names, run_id=run_id,
        run_ts=run_ts, prior_pairs=prior_pairs,
        prior_assignments=prior_assign, prior_survivors=prior_surv,
        new_page_urls=new_page_urls if prior_assign is not None else None,
        timings=timings,
    )
    if timings is not None:
        timings["t_tail_build_s"] = round(_time.time() - _t0, 2)
        _t0 = _time.time()
    if incremental:
        save_tail_state(
            state_dir, res.new_pairs, res.pairs, res.assignments, cfg,
            cursor=drain_end.isoformat(timespec="seconds"),
            survivors=res.survivors_all,
        )
        if timings is not None:
            timings["t_save_s"] = round(_time.time() - _t0, 2)
    return res


def run_incremental(
    pages_stream: DataFrame,
    cfg: DedupConfig,
    sink_fn,
    checkpoint_dir: str,
    watermark: str = "1 hour",
):
    """Micro-batch handoff: each batch flows through the full batch
    pipeline inside foreachBatch (exactly-once with the checkpoint dir).

    sink_fn(batch_df, epoch_id) receives the deduped clean batch.
    NOTE: rows older than (max event time − watermark) are dropped as
    late — size the watermark to the crawl's out-of-orderness.
    """
    deduped = incremental_exact_dedup(pages_stream, cfg, watermark)
    return (
        deduped.writeStream.foreachBatch(sink_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
