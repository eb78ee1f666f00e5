"""Character-shingle MinHash + LSH banding (SURVEY.md §7 stage 4).

Shingling and banding are pure Column expressions (whole-stage codegen,
no Python). Fast-mode signatures are computed in ONE Arrow-vectorized
pandas UDF over the per-document shingle-hash arrays; portable-mode
signatures are pure SQL so DuckDB can replay them exactly.

Shape notes for 100 TB:
  * shingle hashing happens inside `transform(...)` on the normalized
    text — narrow, no shuffle, never touches the `html` binary column
    (column pruning keeps it out of the scan).
  * signatures are fixed-width arrays (num_perm * 8 bytes) — the wide
    text column is dropped before any shuffle.
  * band explosion multiplies rows by `bands` but each row is only
    (url, band_idx, band_key) ≈ tens of bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from dedup.config import DedupConfig
from dedup.hashing import h60, minhash_rows, perm_seeds
from dedup.normalize import normalize_text


def shingles_expr(norm_col: Column, k: int) -> Column:
    """All character k-grams of an already-normalized string.

    Documents shorter than k contribute their whole text as one shingle
    (substring is clamped), so short-doc pairs still compare.
    """
    n = F.greatest(F.length(norm_col) - F.lit(k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(norm_col, i, k))


def distinct_shingle_hashes(norm_col: Column, cfg: DedupConfig) -> Column:
    """array<long> of distinct shingle hashes (set semantics — the
    reference's multiset containment degrades to set containment for
    shingles, SURVEY.md §2.3.1)."""
    sh = shingles_expr(norm_col, cfg.k_shingle)
    if cfg.hash_mode == "portable":
        hashed = F.transform(sh, h60)
    elif cfg.shingle_hash_bits == 31:
        # 31-bit shingle hashes in fast mode: halves the bytes moved by
        # the exact-Jaccard join and the in-memory set ops; collision
        # probability within a doc pair (~400²/2 / 2³¹) ≈ 4e-5 — noise
        # well below the MinHash estimator's own variance. Masked before
        # the cast (ANSI mode rejects overflowing casts).
        hashed = F.transform(
            sh,
            lambda s: F.xxhash64(s).bitwiseAND(F.lit(0x7FFFFFFF)).cast("int"),
        )
    else:
        hashed = F.transform(sh, lambda s: F.xxhash64(s))
    # every consumer (min-over-permutations, array_intersect, min/max
    # fingerprint) is order-insensitive — no sort needed
    return F.array_distinct(hashed)


def with_shingles(pages: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Adds `shingles: array<long>`; expects `norm_text` present."""
    return pages.withColumn(
        "shingles", distinct_shingle_hashes(F.col("norm_text"), cfg)
    )


# ------------------------------------------------------------- signatures
def _fast_signature_udf(cfg: DedupConfig):
    seeds = perm_seeds(cfg.num_perm, cfg.seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(shingle_hashes: pd.Series) -> pd.Series:
        from dedup.hashing import minhash_batch

        arrs = [
            np.asarray(a, dtype=np.int64).view(np.uint64)
            if a is not None and len(a) > 0
            else None
            for a in shingle_hashes
        ]
        nonempty = [a for a in arrs if a is not None]
        if not nonempty:
            return pd.Series([None] * len(arrs))
        concat = np.concatenate(nonempty)
        lens = np.fromiter((len(a) for a in nonempty), dtype=np.int64)
        offsets = np.zeros(len(nonempty), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        sigs = minhash_batch(concat, offsets, seeds)  # (n, num_perm)
        out, k = [], 0
        for a in arrs:
            if a is None:
                out.append(None)
            else:
                out.append(sigs[k])
                k += 1
        return pd.Series(out)

    return sig


def _portable_signature_expr(cfg: DedupConfig) -> Column:
    """sig_j = min over shingles of h60(j || ':' || shingle-hash) — pure
    SQL in both engines (dedup/oracle.py mirrors it verbatim)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(cfg.portable_num_perm - 1)),
        lambda j: F.array_min(
            F.transform(
                F.col("shingles"),
                lambda s: h60(F.concat(j.cast("string"), F.lit(":"), s.cast("string"))),
            )
        ),
    )


def with_signature(pages: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Adds `sig: array<long>` (length cfg.effective_num_perm)."""
    if cfg.hash_mode == "portable":
        return pages.withColumn("sig", _portable_signature_expr(cfg))
    return pages.withColumn("sig", _fast_signature_udf(cfg)(F.col("shingles")))


# ---------------------------------------------------------------- banding
def band_key_expr(sig: Column, band_idx: Column, r: int, cfg: DedupConfig) -> Column:
    """Key for one band = hash of its r signature values + band index."""
    chunk = F.slice(sig, band_idx * r + 1, r)
    if cfg.hash_mode == "portable":
        joined = F.concat_ws(",", F.transform(chunk, lambda v: v.cast("string")))
        return h60(F.concat(band_idx.cast("string"), F.lit("|"), joined))
    return F.xxhash64(band_idx, chunk)


def explode_bands(pages: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(url, band_idx, band_key) — one row per band per doc."""
    b, r = cfg.effective_bands, cfg.effective_rows
    keys = F.transform(
        F.sequence(F.lit(0), F.lit(b - 1)),
        lambda i: F.struct(
            i.cast("int").alias("band_idx"),
            band_key_expr(F.col("sig"), i, r, cfg).alias("band_key"),
        ),
    )
    return (
        pages.select("url", F.explode(keys).alias("bk"))
        .select("url", F.col("bk.band_idx"), F.col("bk.band_key"))
    )


def signatures(pages_with_norm: DataFrame, cfg: DedupConfig) -> DataFrame:
    """norm_text → shingles → sig in one narrow pass; drops wide columns
    so only (url, shingles, sig) ever shuffles."""
    df = with_shingles(pages_with_norm, cfg)
    df = with_signature(df, cfg)
    return df.select("url", "shingles", "sig")
