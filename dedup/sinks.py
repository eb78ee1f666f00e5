"""Bucketed-table sink — pay the key shuffle once, join shuffle-free after.

At the 100-TB design point the same url-keyed stores are joined over
and over: assignments ⋈ features in every survivor pass, the
accumulated pages store ⋈ candidate pairs on every streaming drain,
side tables ⋈ pages on every re-run from a checkpoint. A plain parquet
snapshot forgets its partitioning, so every one of those joins re-pays
a full shuffle of the big side. Writing the store BUCKETED by the join
key (`bucketBy` + `sortBy`, hashed into a fixed bucket count recorded
in the table catalog) pays that shuffle exactly once at write time;
Catalyst then compiles every later equi-join between same-bucketed
tables to a zero-Exchange sort-merge join, and `GROUP BY url` over one
table to a zero-Exchange partial/final aggregate. This is the batch
analogue of the reference's caller-saves contract (the caller keeps
the merged store and hands it back, /root/reference/README.md:44) —
the expensive organization of the data survives between operations.

Bucket-count rule: the same constant-partition-SIZE sizing as shuffles
(dedup/session.auto_shuffle_partitions — ceil(docs / 125k)); a bucket
is a unit of join parallelism exactly like a shuffle partition, and a
count that tracks data size keeps per-task working sets flat at 100×
the input. Bucket counts must MATCH across tables joined together, so
derive both from the same corpus size.

Sandbox note: the bucket spec lives in the session catalog (in-memory
here, a Hive/Iceberg catalog on a real cluster), so the zero-shuffle
property holds for any reader that resolves the table through the
catalog — `spark.read.table`, not a raw path read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: tuple[str, ...] = ("url",),
    n_buckets: int | None = None,
    sort_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Write `df` as an external parquet table bucketed (and sorted)
    by `bucket_cols`, replacing any previous table of that name.
    Returns the catalog-backed frame (bucket metadata attached — joins
    and aggregations on the bucket key need no Exchange).

    n_buckets=None sizes buckets from the row count via the measured
    constant-partition-size rule (one extra count over `df`; pass an
    explicit count when the caller already knows it). Joined tables
    must share a bucket count — derive both from the same corpus size.
    """
    spark = df.sparkSession
    if n_buckets is None:
        from dedup.session import auto_shuffle_partitions

        n_buckets = auto_shuffle_partitions(df.count())
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(int(n_buckets), *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .saveAsTable(table)
    )
    return spark.read.table(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — REQUIRED for the zero-shuffle property (a raw
    path read sees plain parquet files and forgets the bucket spec)."""
    return spark.read.table(table)
