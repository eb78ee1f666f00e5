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
from dedup.hashing import h60, perm_seeds
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
    shingles, SURVEY.md §2.3.1). Portable (oracle-replayable) form."""
    sh = shingles_expr(norm_col, cfg.k_shingle)
    if cfg.hash_mode == "portable":
        hashed = F.transform(sh, h60)
    elif cfg.shingle_hash_bits == 31:
        hashed = F.transform(
            sh,
            lambda s: F.xxhash64(s).bitwiseAND(F.lit(0x7FFFFFFF)).cast("int"),
        )
    else:
        hashed = F.transform(sh, lambda s: F.xxhash64(s))
    # every consumer (min-over-permutations, array_intersect, min/max
    # fingerprint) is order-insensitive — no sort needed
    return F.array_distinct(hashed)


# -------------------------------------------------- fast shingle kernel
def shingle_hash_kernel(
    text: str | None, k: int, mask31: bool
) -> np.ndarray | None:
    """Unique rolling-hash shingle hashes of one normalized string.

    Polynomial rolling hash (base 257, mod 2⁶⁴) over the utf-8 byte
    stream + splitmix64 finalizer — the same construction as the
    winnowing fingerprints (dedup/suffix.py). Replaces the JVM
    `transform(substring(...))` path, which materializes one String per
    shingle position (~10⁸ objects per 200k docs — the measured hot spot
    at 12s/8 cores). Docs shorter than k hash their whole text as one
    shingle (matching shingles_expr's clamp)."""
    if text is None:
        return None
    from dedup.hashing import rolling_poly_hashes, splitmix64

    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    width = min(k, max(len(b), 1))
    if len(b) == 0:
        h = splitmix64(np.zeros(1, dtype=np.uint64))
    else:
        h = rolling_poly_hashes(b, width)
    if mask31:
        h = (h & np.uint64(0x7FFFFFFF)).astype(np.int32)
    else:
        h = h.astype(np.int64)
    return np.unique(h)


def _fast_shingles_udf(cfg: DedupConfig):
    dtype = T.IntegerType() if cfg.shingle_hash_bits == 31 else T.LongType()
    k, mask31 = cfg.k_shingle, cfg.shingle_hash_bits == 31

    @F.pandas_udf(T.ArrayType(dtype))
    def shingles(norm_text: pd.Series) -> pd.Series:
        return pd.Series(
            [shingle_hash_kernel(t, k, mask31) for t in norm_text],
            dtype=object,
        )

    return shingles


def with_shingles(pages: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Adds `shingles` (array of hashes); expects `norm_text` present.
    Fast mode computes them in the vectorized numpy kernel; portable
    mode keeps the SQL-replayable h60 expression."""
    if cfg.hash_mode == "portable":
        return pages.withColumn(
            "shingles", distinct_shingle_hashes(F.col("norm_text"), cfg)
        )
    return pages.withColumn(
        "shingles", _fast_shingles_udf(cfg)(F.col("norm_text"))
    )


# ------------------------------------------------------------- signatures
def _minhash_over_arrays(arrs: list, seeds: np.ndarray) -> pd.Series:
    """Shared tail: None-aware batched MinHash over per-doc hash arrays."""
    from dedup.hashing import minhash_batch

    nonempty = [a for a in arrs if a is not None and len(a) > 0]
    if not nonempty:
        return pd.Series([None] * len(arrs), dtype=object)
    concat = np.concatenate(
        [np.asarray(a, dtype=np.int64).view(np.uint64) for a in nonempty]
    )
    lens = np.fromiter((len(a) for a in nonempty), dtype=np.int64)
    offsets = np.zeros(len(nonempty), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    sigs = minhash_batch(concat, offsets, seeds)  # (n, num_perm)
    out, k = [], 0
    for a in arrs:
        if a is None or len(a) == 0:
            out.append(None)
        else:
            out.append(sigs[k])
            k += 1
    return pd.Series(out, dtype=object)


def _fast_signature_udf(cfg: DedupConfig):
    seeds = perm_seeds(cfg.num_perm, cfg.seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(shingle_hashes: pd.Series) -> pd.Series:
        return _minhash_over_arrays(list(shingle_hashes), seeds)

    return sig


def _fast_sig_from_text_udf(cfg: DedupConfig):
    """norm_text → MinHash signature in ONE Arrow pass: rolling-hash
    shingles (shingle_hash_kernel) feed the blocked minhash kernel
    directly — the per-doc shingle arrays never cross the JVM↔Python
    boundary or materialize as a column."""
    seeds = perm_seeds(cfg.num_perm, cfg.seed)
    k, mask31 = cfg.k_shingle, cfg.shingle_hash_bits == 31

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(norm_text: pd.Series) -> pd.Series:
        arrs = [shingle_hash_kernel(t, k, mask31) for t in norm_text]
        return _minhash_over_arrays(arrs, seeds)

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
    """norm_text → (url, shingles, sig), narrow. In fast mode the two
    outputs are INDEPENDENT prunable UDF columns over norm_text — a
    consumer selecting only (url, sig) never computes or transfers the
    shingle arrays (Catalyst column pruning removes the other UDF)."""
    if cfg.hash_mode == "portable":
        df = with_shingles(pages_with_norm, cfg)
        df = with_signature(df, cfg)
        return df.select("url", "shingles", "sig")
    return pages_with_norm.select(
        "url",
        _fast_shingles_udf(cfg)(F.col("norm_text")).alias("shingles"),
        _fast_sig_from_text_udf(cfg)(F.col("norm_text")).alias("sig"),
    )
