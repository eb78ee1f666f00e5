"""Pipeline driver (SURVEY.md §7 stage 11).

Run via spark-submit:

    spark-submit --py-files dedup.zip dedup/cli.py \
        --input /path/pages_parquet --output /tmp/dedup_out \
        --stage all [--resume] [--n-docs 50000]

Stages checkpoint through CheckpointStore; `--resume` skips completed
stages using the manifest. `--synthetic N` generates the seeded corpus
instead of reading parquet (no external data).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from datetime import datetime, timezone

# allow `python dedup/cli.py` / `spark-submit dedup/cli.py` from anywhere;
# drop the script dir itself so package modules can't shadow stdlib names
_pkg_dir = os.path.dirname(os.path.abspath(__file__))
sys.path[:] = [p for p in sys.path if os.path.abspath(p or ".") != _pkg_dir]
sys.path.insert(0, os.path.dirname(_pkg_dir))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages input directory")
    ap.add_argument("--input-format", choices=("parquet", "jsonl", "warc"),
                    default="parquet",
                    help="jsonl = one object per line with url+text "
                         "(+warc_ts_epoch/lang/source), explicit schema "
                         "(dedup/pages.py load_pages_jsonl); warc = a "
                         "directory of .warc/.warc.gz response-record "
                         "shards, one task per shard (dedup/warc.py)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate a seeded synthetic corpus of N docs")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--jaccard", type=float, default=0.8)
    ap.add_argument("--channels", default="lsh,exact,simhash,substring",
                    help="comma list from {lsh,exact,simhash,substring,lcp,"
                         "media,ngram}; ngram = exact word-n-gram Jaccard "
                         "candidates (df-capped inverted index, "
                         "dedup/ngram.py — pairs face the full Jaccard + "
                         "reason verification); lcp = distributed suffix-array "
                         "shared-passage candidates (opt-in: shared long "
                         "passages are usually quotes/boilerplate, so its "
                         "pairs still face the full Jaccard + reason "
                         "verification); media = thumbnail-hash image "
                         "dedup over --media-input (pairs bypass the "
                         "Jaccard gate — shared-image pages rarely share "
                         "text — but face every reason gate)")
    ap.add_argument("--media-input", default=None,
                    help="parquet path with (url, payload binary): one "
                         "decodable image payload per page row, consumed "
                         "by the media channel (dedup/multimodal.py "
                         "media_dup_pairs)")
    ap.add_argument("--authority-sources", default="",
                    help="comma list of source names whose members outrank "
                         "all others in survivor selection "
                         "(preferredRecordInFENNI analogue)")
    ap.add_argument("--host-ids", default=None,
                    help="parquet path with a `url` column: known host "
                         "records — any pair touching one is blocked "
                         "(notHostRecord analogue, broadcast side table)")
    ap.add_argument("--authorized-names", default=None,
                    help="parquet path with (name_normalized, canonical): "
                         "authorized display forms for the post-merge "
                         "override; both-authorized clusters are routed "
                         "to `rejected`")
    ap.add_argument("--sources", default=None,
                    help="parquet path with (url, source, source_local_id): "
                         "per-url source memberships for the overlap gate "
                         "and survivor lineage (synthetic mode generates "
                         "its own unless this overrides it)")
    ap.add_argument("--streaming", action="store_true",
                    help="treat --input as a landing directory and run the "
                         "incremental path: two exactly-once streams "
                         "(watermark exact dedup + cross-batch near-dup "
                         "state) drain into stores under --output, then "
                         "the batch verify tail runs over the stores. "
                         "Re-invoking with the same --output resumes from "
                         "the stream checkpoints and reprocesses only new "
                         "files.")
    ap.add_argument("--watermark", default="1 hour",
                    help="streaming event-time horizon for exact-dedup "
                         "state (and the re-crawl replacement window)")
    ap.add_argument("--state-cap", type=int, default=None,
                    help="streaming: max signatures retained per LSH "
                         "bucket state entry")
    ap.add_argument("--shuffle-partitions", default="auto",
                    help="shuffle partition count, or 'auto' (default) = "
                         "max(cores, ceil(docs / cfg.target_docs_per_"
                         "partition)) — the constant-partition-SIZE rule "
                         "the scaling probes measured")
    ap.add_argument("--state-ttl-ms", type=int, default=None,
                    help="streaming: drop bucket state idle longer than "
                         "this (bounds TOTAL state for long-running "
                         "streams; default keeps state forever)")
    ap.add_argument("--bucketed-tables", action="store_true",
                    help="additionally publish clean + assignments as "
                         "url-bucketed catalog tables under "
                         "{output}/bucketed with a SHARED bucket count "
                         "from the auto sizing rule — every later "
                         "url-keyed join/agg against them (members "
                         "joins, store ⋈ pairs, re-runs from snapshot) "
                         "compiles with no Exchange (dedup/sinks.py)")
    args = ap.parse_args(argv)

    from dedup.checkpoint import CheckpointStore
    from dedup.config import DedupConfig
    from dedup.metrics import StageMetrics
    from dedup.corpus import corpus_dataframes
    from dedup.pipeline import prepare_clean, run_dedup
    from dedup.session import get_spark
    from dedup.simhash import simhash_channel
    from dedup.suffix import substring_edges
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    spark = get_spark("dedup-cli", master=args.master)
    authority = tuple(s for s in args.authority_sources.split(",") if s)
    cfg = DedupConfig(
        jaccard_threshold=args.jaccard, authority_sources=authority
    )
    host_ids = (
        spark.read.parquet(args.host_ids) if args.host_ids else None
    )
    authorized_names = (
        spark.read.parquet(args.authorized_names)
        if args.authorized_names
        else None
    )
    side_sources = (
        spark.read.parquet(args.sources) if args.sources else None
    )

    if args.streaming:
        if not args.input:
            ap.error("--streaming needs --input (the landing directory)")
        # an EXPLICIT partition count applies to the drains' tail work;
        # 'auto' keeps the session default here — the corpus size that
        # drives the auto rule isn't known until the stores have drained,
        # and each drain's delta is small by design
        if args.shuffle_partitions != "auto":
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(int(args.shuffle_partitions)),
            )
        return _run_streaming(
            spark, args, cfg, side_sources, host_ids, authorized_names
        )

    store = CheckpointStore(args.output, run_id=args.run_id)
    if not args.resume:
        store.invalidate_from("clean", [
            "clean", "edges", "assignments", "survivors"
        ])
    metrics = StageMetrics()
    t0 = time.time()

    if args.synthetic:
        pages, truth, sources = corpus_dataframes(spark, args.synthetic, args.seed)
        if side_sources is not None:
            sources = side_sources
    elif args.input:
        if args.input_format == "jsonl":
            from dedup.pages import load_pages_jsonl

            pages = load_pages_jsonl(spark, args.input)
        elif args.input_format == "warc":
            from dedup.warc import load_pages_warc

            pages = load_pages_warc(spark, args.input)
        else:
            pages = spark.read.parquet(args.input)
        sources = side_sources
    else:
        ap.error("need --input or --synthetic")

    # partition sizing BEFORE the first shuffle: auto = constant
    # partition size from the corpus row count (a metadata-cheap parquet
    # count / known synthetic n), floored at the session's core count so
    # small inputs still feed every slot
    if args.shuffle_partitions == "auto":
        from dedup.session import auto_shuffle_partitions

        n_docs = args.synthetic or pages.count()
        cores = spark.sparkContext.defaultParallelism
        parts = auto_shuffle_partitions(
            n_docs, min_partitions=cores,
            target_docs_per_partition=cfg.target_docs_per_partition,
        )
    else:
        parts = int(args.shuffle_partitions)
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))

    channels = set(args.channels.split(","))
    cand_channels, bypass_channels = [], []
    channel_caches: list = []
    # ONE normalization for channels + pipeline: every channel and
    # run_dedup itself consume this persisted narrow frame (cache
    # substitution matches plan identity — same object everywhere)
    clean = prepare_clean(pages, uid_bits=cfg.uid_bits).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    channel_caches.append(clean)
    if "simhash" in channels:
        # Hamming <= max_hamming IS the channel's similarity verification
        # (order-insensitive near-dups have sub-threshold char-shingle
        # Jaccard) — bypass the Jaccard gate, keep the reason gates
        sim_pairs, sim_hot = simhash_channel(
            clean, cfg, cache_registry=channel_caches
        )
        bypass_channels.append(sim_pairs.select("url_a", "url_b"))
        metrics.record_stage("simhash_hot_buckets", sim_hot)
    if "substring" in channels:
        sub_edges, sub_hot = substring_edges(
            clean, cfg, cache_registry=channel_caches
        )
        bypass_channels.append(sub_edges.select("url_a", "url_b"))
        metrics.record_stage("substring_hot_buckets", sub_hot)
    if "media" in channels:
        # thumbnail identity IS the channel's similarity evidence (two
        # pages sharing an image but no text have sub-threshold Jaccard
        # by construction) — bypass the Jaccard gate, keep every reason
        # gate, exactly like the reference feeds every pair through
        # canMerge regardless of provenance
        # (/root/reference/lib/marc-record-merge-melindautils.js:84-104)
        if not args.media_input:
            ap.error("--channels media needs --media-input")
        from dedup.multimodal import media_dup_pairs

        page_media = spark.read.parquet(args.media_input)
        media_pairs, media_hot = media_dup_pairs(
            page_media, cfg, cache_registry=channel_caches
        )
        bypass_channels.append(media_pairs.select("url_a", "url_b"))
        metrics.record_stage("media_hot_buckets", media_hot)
    if "ngram" in channels:
        # word-n-gram overlap is candidate EVIDENCE only: pairs face
        # the standard char-shingle Jaccard + reason verification
        from dedup.ngram import ngram_channel

        ng_pairs, ng_hot = ngram_channel(
            clean, cfg, cache_registry=channel_caches
        )
        cand_channels.append(ng_pairs)
        metrics.record_stage("ngram_hot_grams", ng_hot)
    if "lcp" in channels:
        from dedup.suffix import lcp_pairs_distributed

        lcp_pairs, lcp_hot, lcp_skipped = lcp_pairs_distributed(
            clean, cfg, return_stats=True, cache_registry=channel_caches
        )
        cand_channels.append(lcp_pairs.select("url_a", "url_b"))
        metrics.record_stage("lcp_hot_blocks", lcp_hot)
        metrics.record_stage("lcp_skipped_doc_blocks", lcp_skipped)

    res = run_dedup(
        pages, cfg, sources=sources,
        host_ids=host_ids,
        authorized_names=authorized_names,
        candidate_channels=cand_channels,
        bypass_jaccard_channels=bypass_channels,
        run_id=args.run_id,
        # real wall-clock audit timestamp (tests inject a fixed one;
        # the default epoch value must never reach production lineage)
        run_ts=datetime.now(timezone.utc).isoformat(timespec="seconds"),
        persist_pairs=True,  # stat-parity counters read pair columns
        clean=clean,
    )

    clean_ck = store.write_stage("clean", res.clean.drop("html"))
    metrics.record_stage("clean", clean_ck, histogram=True)
    edges_ck = store.write_stage("edges", res.edges)
    metrics.record_stage("edges", edges_ck, histogram=True)
    assign_ck = store.write_stage("assignments", res.assignments)
    metrics.record_stage("assignments", assign_ck, histogram=True)
    surv_ck = store.write_stage("survivors", res.survivors)
    metrics.record_stage("survivors", surv_ck)
    metrics.record_stage("rejected_survivors", res.rejected)
    metrics.record_stage("hot_buckets", res.hot_buckets)

    if args.bucketed_tables:
        # the two url-keyed stores every downstream consumer re-joins;
        # one shared bucket count (the run's auto-sized partition count)
        # so they co-join each other — and any same-bucketed side table —
        # with zero Exchange. Reads must resolve through the catalog
        # (read_bucketed), not the raw path.
        from dedup.sinks import write_bucketed

        safe_run = "".join(
            c if c.isalnum() else "_" for c in args.run_id
        )
        for stage, frame in (("clean", clean_ck), ("assignments", assign_ck)):
            t = write_bucketed(
                frame, f"dedup_{stage}_{safe_run}",
                f"{args.output}/bucketed/{stage}", n_buckets=parts,
            )
            metrics.records.append({
                "stage": f"bucketed_{stage}",
                "table": f"dedup_{stage}_{safe_run}",
                "n_buckets": parts,
                "rows_out": t.count(),
            })

    # stat-only parity counters (the reference's non-fatal per-pair
    # 'STAT 245]' / 'STAT DIAC]' debug logging, marc-record-merge-
    # melindautils.js:106-114) — aggregated instead of per-line logged
    stat_row = res.pairs.agg(
        F.sum(F.size("stat_245_msgs")).alias("n245"),
        F.sum(F.size("stat_diacritics_msgs")).alias("ndiac"),
        F.count(F.lit(1)).alias("npairs"),
    ).collect()[0]
    metrics.records.append({
        "stage": "stat_parity",
        "pairs": int(stat_row["npairs"] or 0),
        "stat_245_superset_msgs": int(stat_row["n245"] or 0),
        "stat_diacritics_msgs": int(stat_row["ndiac"] or 0),
    })

    wall = time.time() - t0
    n_docs = clean_ck.count()
    metrics.records.append(
        {"stage": "TOTAL", "wall_s": wall, "docs": n_docs,
         "docs_per_sec": n_docs / wall if wall else 0.0}
    )
    metrics.write(f"{args.output}/metrics.jsonl")
    print(json.dumps(metrics.records[-1]))
    res.release()
    for df in channel_caches:
        try:
            df.unpersist()
        except Exception:
            pass
    spark.stop()
    return 0


def _run_streaming(
    spark, args, cfg, sources, host_ids, authorized_names
) -> int:
    """Incremental surface: drain the landing directory through the two
    exactly-once streams (stores + checkpoints under {output}/stream),
    run the batch verify tail over the accumulated stores, write the
    same result tables the batch path writes. Idempotent per invocation:
    re-running after more files land resumes the streams and re-derives
    the tail over the grown stores."""
    from dedup.metrics import StageMetrics
    from dedup.streaming import run_streaming_dedup

    metrics = StageMetrics()
    t0 = time.time()
    res = run_streaming_dedup(
        spark, args.input, f"{args.output}/stream", cfg,
        sources=sources, host_ids=host_ids,
        authorized_names=authorized_names,
        watermark=args.watermark,
        state_cap=args.state_cap,
        state_ttl_ms=args.state_ttl_ms,
        run_id=args.run_id,
        run_ts=datetime.now(timezone.utc).isoformat(timespec="seconds"),
        input_format=args.input_format,
    )
    for name, df in (
        ("pairs", res.pairs),
        ("edges", res.edges),
        ("assignments", res.assignments),
        ("survivors", res.survivors),
        ("rejected", res.rejected),
    ):
        df.write.mode("overwrite").parquet(f"{args.output}/{name}")
        metrics.record_stage(
            name, spark.read.parquet(f"{args.output}/{name}"),
            histogram=(name == "assignments"),
        )
    res.release()

    wall = time.time() - t0
    n_docs = metrics.records[2]["rows_out"]  # assignments = stored urls
    metrics.records.append(
        {"stage": "TOTAL", "wall_s": wall, "docs": n_docs,
         "docs_per_sec": n_docs / wall if wall else 0.0,
         "mode": "streaming"}
    )
    metrics.write(f"{args.output}/metrics.jsonl")
    print(json.dumps(metrics.records[-1]))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
