"""Candidate-pair generation (SURVEY.md §7 stages 4/8/9 outputs).

Scale design:

* Pair generation is shuffle-on-bucket-key (groupBy) + in-bucket pair
  expansion with higher-order array functions — not a self-equi-join
  (which would shuffle the exploded band table twice).
* Hot buckets (boilerplate/empty-template signatures) are the classic
  LSH failure mode: an m-member bucket implies O(m²) pairs. Buckets over
  `cfg.max_bucket_size` switch to STAR expansion: every member pairs
  only with the bucket's minimum url — O(m) candidates that still reach
  Jaccard verification, so genuine mega-clusters keep their recall
  (members link through the hub) while boilerplate buckets cost O(m)
  rejected verifications instead of O(m²). Hot-bucket stats are
  reported, never silently dropped. This is the explicit skew handling
  the north_rule demands — AQE cannot fix a pair blowup, only a bounded
  expansion can.
* The hot path NEVER materializes a bucket as an array: bucket sizes are
  counted first (streaming agg), and only sub-cap buckets go through
  collect_set (arrays bounded by the cap); over-cap buckets use a
  min-per-bucket aggregate + join.
* Exact duplicates are collapsed BEFORE signatures (one representative
  per identical normalized text), so a million byte-identical pages cost
  one MinHash signature and one bucket slot instead of 10¹² pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dedup.config import DedupConfig
from dedup.hashing import h60


def exact_groups(pages_with_norm: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(url, text_hash, rep_url): representative = min(url) per identical
    normalized text. Exact-dup edges fall out as rep_url != url rows."""
    if cfg.hash_mode == "portable":
        th = h60(F.col("norm_text"))
    else:
        th = F.xxhash64(F.col("norm_text"))
    hashed = pages_with_norm.select("url", th.alias("text_hash"))
    reps = hashed.groupBy("text_hash").agg(F.min("url").alias("rep_url"))
    return hashed.join(reps, "text_hash")


def exact_edges(groups: DataFrame) -> DataFrame:
    """Edges linking every exact-dup member to its representative."""
    return (
        groups.filter(F.col("url") != F.col("rep_url"))
        .select(
            F.col("rep_url").alias("url_a"),
            F.col("url").alias("url_b"),
            F.lit(1.0).alias("jaccard"),
            F.lit("exact").alias("channel"),
        )
    )


def representatives(groups: DataFrame) -> DataFrame:
    return groups.filter(F.col("url") == F.col("rep_url")).select("url")


def pairs_from_buckets(
    bucketed: DataFrame,
    key_cols: list[str],
    cfg: DedupConfig,
    min_collisions: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Generic bucket → unordered-pair expansion with hot-bucket star
    fallback. `bucketed` has key_cols + `url`. Returns
    (pairs, hot_buckets) with pairs = distinct (url_a < url_b) and
    hot_buckets = (key_cols..., bucket_size) rows that took the star
    path (skew lineage for metrics)."""
    from pyspark.sql import Window

    # ONE shuffle: hash-partition by bucket key, then window count +
    # window min reuse that partitioning (no groupBy+join round-trips).
    # Rows are unique per (key, url) by construction upstream (bands /
    # fingerprints are emitted distinct), so count(*) == distinct urls.
    w = Window.partitionBy(*key_cols)
    tagged = bucketed.withColumn("bucket_size", F.count(F.lit(1)).over(w))

    # --- sub-cap buckets: full pair expansion over bounded arrays -----
    small = (
        tagged.filter(
            (F.col("bucket_size") >= 2)
            & (F.col("bucket_size") <= cfg.max_bucket_size)
        )
        .groupBy(*key_cols)
        .agg(F.sort_array(F.collect_set("url")).alias("urls"))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("urls"),
            lambda x, i: F.transform(
                F.slice(F.col("urls"), i + 2, F.size("urls")),
                lambda y: F.struct(x.alias("url_a"), y.alias("url_b")),
            ),
        )
    )
    small_pairs = small.select(F.explode(pair_structs).alias("p")).select(
        "p.url_a", "p.url_b"
    )

    # --- over-cap buckets: star pairs around the bucket minimum ------
    # window min reuses the same partitioning — no extra shuffle
    hot_rows = tagged.filter(F.col("bucket_size") > cfg.max_bucket_size)
    star_pairs = (
        hot_rows.withColumn("hub_url", F.min("url").over(w))
        .filter(F.col("url") != F.col("hub_url"))
        .select(
            F.col("hub_url").alias("url_a"), F.col("url").alias("url_b")
        )
    )

    allp = small_pairs.unionByName(star_pairs)
    if min_collisions > 1:
        # require the pair to collide in >= k buckets: a true >=0.8-Jaccard
        # pair collides in ~13 of 32 bands (P[<2] ≈ 2e-6), while most
        # boilerplate noise collides once — pruned here on the slim
        # 16-byte pair rows, BEFORE any signature/shingle array joins.
        pairs = (
            allp.groupBy("url_a", "url_b")
            .agg(F.count(F.lit(1)).alias("n_collisions"))
            .filter(F.col("n_collisions") >= min_collisions)
            .select("url_a", "url_b")
        )
    else:
        pairs = allp.distinct()
    hot = (
        hot_rows.groupBy(*key_cols)
        .agg(F.max("bucket_size").alias("bucket_size"))
    )
    return pairs, hot


def lsh_candidates(
    bands: DataFrame, cfg: DedupConfig
) -> tuple[DataFrame, DataFrame]:
    """Candidate pairs from exploded LSH bands (url, band_idx, band_key)."""
    return pairs_from_buckets(
        bands, ["band_idx", "band_key"], cfg,
        min_collisions=cfg.min_band_collisions,
    )
