"""SparkSession factory tuned for the dedup pipeline.

Local mode for tests/bench; the same config block is what a
``spark-submit --py-files dedup.zip`` run on a real cluster would set
(minus master/driver-memory, which come from the submit command).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def auto_shuffle_partitions(
    n_docs: int,
    min_partitions: int = 4,
    target_docs_per_partition: int = 125_000,
) -> int:
    """Shuffle-partition count from corpus size: constant partition
    SIZE, not constant count — ceil(docs / target), floored at
    min_partitions (pass the cluster's total cores so every slot gets
    a task at small inputs).

    The 125k-docs/partition target is the measured sizing rule from the
    4M-doc scaling probe (BENCH_SCALING.json stretch_4m): 2M docs at 16
    partitions and 4M at 32 both run at 125k docs/partition and scale
    at 0.83/0.78; re-using the 2M COUNT at 4M (250k docs/partition)
    collapses efficiency to 0.593 — partition size, not count, is the
    invariant to carry across input scales, exactly as
    spark.sql.files.maxPartitionBytes sizes scans. Override the target
    via DedupConfig.target_docs_per_partition for corpora whose docs
    are much larger/smaller than the synthetic tier's ~1 KB."""
    import math

    return max(
        int(min_partitions),
        math.ceil(max(int(n_docs), 1) / int(target_docs_per_partition)),
    )


def ensure_scan_parallelism(df, min_parts: int | None = None):
    """Input-skew guard (optimization guide §2.5): a small input that
    arrives as one unsplittable parquet row group scans as ONE task,
    and every narrow stage downstream (normalize chain, Arrow kernels)
    inherits that single partition — measured as whole pipeline fronts
    running serially on one core. Repartition up to the session's
    default parallelism when (and only when) the scan is below it: on
    any real multi-file/multi-row-group input the guard is a no-op and
    plans no shuffle, so it is scale-safe by construction.

    Round-robin repartition is deterministic under retries (Spark sorts
    before keyless repartition — SPARK-23207) and every consumer here
    is row-set semantics (joins/aggregates/windows with total
    orderings), so results are partitioning-independent."""
    sc = df.sparkSession.sparkContext
    target = int(min_parts or sc.defaultParallelism)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def get_spark(
    app_name: str = "dedup",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("DEDUP_MASTER") or "local[{}]".format(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    if shuffle_partitions is None:
        # match parallelism, not the 200 default (wrong at both ends)
        n = master.split("[")[-1].rstrip("]") if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(int(n), 4)

    # shuffle spill dirs: local-mode shuffles are disk-bound on slow /tmp;
    # prefer a RAM-backed dir when present (on a real cluster this is the
    # NVMe-backed spark.local.dir the platform provisions)
    local_dir = os.environ.get("DEDUP_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's coalescing floors post-shuffle partitions at this SIZE
        # (default 1m). With parallelismFirst (default on) the target is
        # min(advisory, max(stage_bytes/parallelism, THIS)), so on any
        # real-scale stage the floor never binds — but a CPU-dense
        # Arrow/pandas stage over few megabytes was measured coalescing
        # to a third of the cores (bytes are a bad proxy for python
        # compute). 64k keeps small-but-hot stages at full parallelism;
        # override for other hardware via DEDUP_MIN_COALESCED_PARTITION.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("DEDUP_MIN_COALESCED_PARTITION", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("DEDUP_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
