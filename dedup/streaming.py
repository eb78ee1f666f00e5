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
    keyed = clean.withColumn("text_hash", F.xxhash64("norm_text"))
    return keyed.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )


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
