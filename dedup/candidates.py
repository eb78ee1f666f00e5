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
    normalized text. Exact-dup edges fall out as rep_url != url rows.

    Key design (100-TB robustness):
    * a doc whose NORMALIZED text is empty (every char outside the
      normalizer's [a-z0-9åäö] alphabet — CJK/Cyrillic/punctuation-only
      pages) falls back to its RAW text: grouping empty norms together
      would fuse every such same-lang page into one "exact" family with
      a forced jaccard of 1.0. The two key domains are prefix-tagged so
      a raw text can never collide with a normalized one.
    * the TEXT length rides along as a second group column: a 64-bit
      hash collision between different texts would otherwise verify at
      jaccard 1.0 forever (the rep mapping substitutes the rep's
      shingles for both sides, so no downstream check can see it);
      equal length is a free narrow second factor, and uid_bits=128
      upgrades the hash itself to a 128-bit md5 digest (the same
      escape hatch the surrogate ids use). On the production narrow
      path (prepare_clean dropped `text`, kept `raw_hash` + `text_len`)
      the length factor is `text_len` — the RAW length, not the length
      of the hash string, which is constant and would void the factor
      for exactly the empty-norm class that relies on it; prepare_clean
      additionally computes raw_hash as md5 when uid_bits=128, so the
      128-bit escape hatch covers the raw domain too (md5 of an md5
      digest string is injective over digests).
    """
    cols = pages_with_norm.columns
    if "text" in cols:  # spec/test callers that kept the raw column
        raw_part = F.coalesce(F.col("text"), F.lit(""))
        raw_len = F.length(raw_part)
    elif "raw_hash" in cols:  # production narrow clean (prepare_clean)
        raw_part = F.col("raw_hash").cast("string")
        raw_len = (
            F.coalesce(F.col("text_len"), F.lit(-1))
            if "text_len" in cols
            else F.length(raw_part)
        )
    else:  # no raw signal at all: empty-norm docs stay singletons
        raw_part = F.col("url").cast("string")
        raw_len = F.length(raw_part)
    key = F.when(
        F.length("norm_text") > 0,
        F.concat(F.lit("n:"), F.col("norm_text")),
    ).otherwise(F.concat(F.lit("r:"), raw_part))
    key_len = F.when(
        F.length("norm_text") > 0, F.length("norm_text")
    ).otherwise(raw_len)
    if cfg.hash_mode == "portable":
        th = h60(key)
    elif cfg.uid_bits == 128:
        th = F.unhex(F.md5(key))
    else:
        th = F.xxhash64(key)
    hashed = pages_with_norm.select(
        "url", th.alias("text_hash"), key_len.alias("_key_len")
    )
    reps = hashed.groupBy("text_hash", "_key_len").agg(
        F.min("url").alias("rep_url")
    )
    return hashed.join(reps, ["text_hash", "_key_len"]).select(
        "url", "text_hash", "rep_url"
    )


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
    keep_collisions: bool = False,
    max_bucket: int | None = None,
    cache_registry: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Generic bucket → unordered-pair expansion with hot-bucket star
    fallback. `bucketed` has key_cols + `url`. Returns
    (pairs, hot_buckets) with pairs = distinct (url_a < url_b)
    [+ `n_collisions` when keep_collisions] and hot_buckets =
    (key_cols..., bucket_size) rows that took the star path (skew
    lineage for metrics).

    Skew design: bucket stats come from a groupBy aggregate (map-side
    partial combine — a 10^8-member boilerplate bucket arrives at the
    reducer as <= one partial row per map task, never 10^8 rows at one
    task the way a Window.partitionBy count would). Over-cap keys are by
    construction rare and tiny after aggregation, so they BROADCAST:
    the star expansion is a map-side broadcast join (hot rows never
    shuffle by the skewed key at all), and the sub-cap path drops them
    with a broadcast anti-join before its collect_set shuffle, which
    therefore sees only cap-bounded groups."""
    cap = max_bucket if max_bucket is not None else cfg.max_bucket_size
    # rows are unique per (key, url) upstream (bands / fingerprints are
    # emitted distinct), so count(*) == distinct urls
    stats = bucketed.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("bucket_size"),
        F.min("url").alias("hub_url"),
    )
    hot = stats.filter(F.col("bucket_size") > cap).select(
        *key_cols, "hub_url", "bucket_size"
    )
    # hot is tiny (over-cap keys only) but its lineage is the full stats
    # shuffle; it feeds TWO broadcast exchanges (anti-join + star join),
    # which would otherwise each recompute that shuffle. The PERSISTED
    # frame itself goes into cache_registry — unpersist() on a derived
    # projection would not release this cache (plan no longer
    # sameResult), so callers must release exactly this object. Without
    # a registry there is nobody to release it, so the persist is
    # SKIPPED (the stats shuffle recomputes once) rather than pinning a
    # cache for the session lifetime.
    if cache_registry is not None:
        hot = hot.persist()
        cache_registry.append(hot)

    # --- sub-cap buckets: full pair expansion over bounded arrays -----
    small = (
        bucketed.join(F.broadcast(hot.select(*key_cols)), key_cols, "left_anti")
        .groupBy(*key_cols)
        .agg(F.sort_array(F.collect_set("url")).alias("urls"))
        .filter(F.size("urls") >= 2)
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
    star_pairs = (
        bucketed.join(F.broadcast(hot.select(*key_cols, "hub_url")), key_cols)
        .filter(F.col("url") != F.col("hub_url"))
        .select(
            F.col("hub_url").alias("url_a"), F.col("url").alias("url_b")
        )
    )

    allp = small_pairs.unionByName(star_pairs)
    if min_collisions > 1 or keep_collisions:
        # pair multiplicity = number of buckets the pair co-occurs in: a
        # true >=0.8-Jaccard pair collides in many bands (P[<2] ≈ 2e-6 at
        # the default config) while most boilerplate noise collides once —
        # pruned here on the slim 16-byte pair rows, BEFORE any
        # signature/shingle array joins.
        pairs = (
            allp.groupBy("url_a", "url_b")
            .agg(F.count(F.lit(1)).alias("n_collisions"))
            .filter(F.col("n_collisions") >= min_collisions)
        )
        if not keep_collisions:
            pairs = pairs.select("url_a", "url_b")
    else:
        pairs = allp.distinct()
    return pairs, hot.select(*key_cols, "bucket_size")


def lsh_candidates(
    bands: DataFrame, cfg: DedupConfig, cache_registry: list | None = None
) -> tuple[DataFrame, DataFrame]:
    """Candidate pairs from exploded LSH bands (url, band_idx, band_key)."""
    return pairs_from_buckets(
        bands, ["band_idx", "band_key"], cfg,
        min_collisions=cfg.effective_min_band_collisions,
        cache_registry=cache_registry,
    )
