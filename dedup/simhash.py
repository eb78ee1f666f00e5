"""64-bit SimHash + Hamming-ball bucketing (SURVEY.md §7 stage 8).

SimHash (Charikar, STOC'02; Manku et al., WWW'07 near-dup detection):
sign-sum of per-token hash bits. Candidate generation uses the
pigeonhole chunk trick from Manku et al.: split the 64-bit fingerprint
into `chunks` pieces; two fingerprints within Hamming distance d < chunks
share at least one exact chunk → equi-joinable bucket keys.

The fingerprint is computed in one Arrow-vectorized pandas UDF over the
per-doc token-hash arrays (token hashing stays JVM-side via xxhash64
inside `transform`); bucketing and the Hamming verify
(`bit_count(a ^ b)`) are pure Column expressions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from dedup.candidates import pairs_from_buckets
from dedup.config import DedupConfig
from dedup.hashing import h60


def token_hashes_expr(norm_col: Column, cfg: DedupConfig) -> Column:
    """Distinct token hashes of the normalized text, JVM-side."""
    toks = F.split(norm_col, " ")
    if cfg.hash_mode == "portable":
        return F.array_distinct(F.transform(toks, h60))
    return F.array_distinct(F.transform(toks, lambda t: F.xxhash64(t)))


def _simhash_udf(bits: int):
    @F.pandas_udf(T.LongType())
    def simhash(token_hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(token_hashes), dtype=np.int64)
        masks = np.uint64(1) << np.arange(bits, dtype=np.uint64)  # (bits,)
        for i, arr in enumerate(token_hashes):
            if arr is None or len(arr) == 0:
                continue
            x = np.asarray(arr, dtype=np.int64).view(np.uint64)  # (n,)
            # vote per bit: +1 if set, -1 if clear
            bitmat = (x[:, None] & masks[None, :]) != 0  # (n, bits)
            votes = bitmat.sum(axis=0) * 2 - len(x)
            fp = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                fp |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(fp.astype(np.int64))
        return pd.Series(out)

    return simhash


def with_simhash(pages_with_norm: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Adds `simhash: long` from norm_text."""
    th = token_hashes_expr(F.col("norm_text"), cfg)
    return pages_with_norm.withColumn(
        "simhash", _simhash_udf(cfg.simhash_bits)(th)
    )


def chunk_keys_expr(cfg: DedupConfig) -> Column:
    """Split the fingerprint into `chunks` bit-slices → bucket keys.
    Statically unrolled (shift amounts must be literals)."""
    width = cfg.simhash_bits // cfg.simhash_chunks
    mask = (1 << width) - 1
    return F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("chunk_idx"),
                F.shiftrightunsigned(F.col("simhash"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("chunk_key"),
            )
            for i in range(cfg.simhash_chunks)
        ]
    )


def simhash_candidates(
    simhashed: DataFrame, cfg: DedupConfig
) -> tuple[DataFrame, DataFrame]:
    """(url, simhash) → candidate pairs within the Hamming ball.

    Pigeonhole guarantee: distance ≤ chunks-1 ⇒ some chunk equal; we
    additionally verify bit_count(xor) ≤ max_hamming exactly.
    """
    exploded = simhashed.select(
        "url", "simhash", F.explode(chunk_keys_expr(cfg)).alias("ck")
    ).select("url", F.col("ck.chunk_idx"), F.col("ck.chunk_key"))
    pairs, hot = pairs_from_buckets(exploded, ["chunk_idx", "chunk_key"], cfg)

    sa = simhashed.select(F.col("url").alias("url_a"), F.col("simhash").alias("sh_a"))
    sb = simhashed.select(F.col("url").alias("url_b"), F.col("simhash").alias("sh_b"))
    verified = (
        pairs.join(sa, "url_a")
        .join(sb, "url_b")
        .withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= cfg.simhash_max_hamming)
        .select("url_a", "url_b", "hamming")
    )
    return verified, hot
