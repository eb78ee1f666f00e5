"""64-bit weighted SimHash + Hamming-ball bucketing (SURVEY.md §7 stage 8).

SimHash (Charikar, STOC'02; Manku et al., WWW'07 near-dup detection):
sign-sum of per-token hash bits, weighted by term frequency (the Manku
et al. production form — unweighted sign-sums degenerate when documents
share a small vocabulary, because the token SET stops discriminating).
Candidate generation uses the pigeonhole chunk trick from Manku et al.:
split the 64-bit fingerprint into `chunks` pieces; two fingerprints
within Hamming distance d < chunks share at least one exact chunk →
equi-joinable bucket keys.

What the channel contributes beyond MinHash/LSH: token-multiset
similarity is ORDER-INSENSITIVE, so reordered near-duplicates (shuffled
word order, reflowed layout) keep Hamming ≈ 0 while their character-
shingle Jaccard collapses far below the 0.8 threshold. Verified pairs
(bit_count(a^b) <= max_hamming) therefore enter the pipeline as a
BYPASS-Jaccard channel — Hamming is the channel's own verification,
like each reference validator trusts its own check — and still pass
every reason gate.

The fingerprint is computed in one Arrow-vectorized pandas UDF with a
batched numpy kernel (one segmented reduceat over the whole batch, no
per-document Python loop); token hashing stays JVM-side via xxhash64
inside `transform`; bucketing and the Hamming verify are pure Column
expressions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from dedup.candidates import pairs_from_buckets
from dedup.config import DedupConfig
from dedup.hashing import h60


def token_hashes_expr(norm_col: Column, cfg: DedupConfig) -> Column:
    """Per-occurrence token hashes of the normalized text, JVM-side.
    Multiplicity is kept — the weighted sign-sum needs term frequency."""
    toks = F.split(norm_col, " ")
    if cfg.hash_mode == "portable":
        return F.transform(toks, h60)
    return F.transform(toks, lambda t: F.xxhash64(t))


def simhash_batch(
    concat_hashes: np.ndarray, offsets: np.ndarray, bits: int = 64
) -> np.ndarray:
    """Batched weighted SimHash: unpack every token hash's bits once for
    the whole Arrow batch, segmented-sum per document (np.add.reduceat),
    sign → packed fingerprint. Returns int64 (n_docs,).

    concat_hashes: all docs' token hashes concatenated (uint64, with
    multiplicity); offsets: start index per doc (offsets[0] == 0)."""
    shifts = np.arange(bits, dtype=np.uint64)
    # bit matrix via unpackbits on the raw little-endian bytes: column j
    # is bit j of the hash (byte 0 = LSB, bitorder='little' puts bit 0
    # first), identical to ((h >> j) & 1) — but the matrix is uint8, 4x
    # less memory traffic than the shift-and-mask int32 form (this
    # kernel is bandwidth-bound like the MinHash one); the segmented
    # sum upcasts in-register via reduceat's dtype, so no wide
    # intermediate ever materializes
    bitmat = np.unpackbits(
        np.ascontiguousarray(concat_hashes.astype("<u8")).view(np.uint8)
        .reshape(-1, 8),
        axis=1, bitorder="little",
    )[:, :bits]  # (n_hashes, bits) uint8
    ones = np.add.reduceat(bitmat, offsets, axis=0, dtype=np.int64)
    lens = np.diff(np.append(offsets, len(concat_hashes)))
    margins = 2 * ones - lens[:, None]
    fp_bits = (margins > 0).astype(np.uint64)
    packed = (fp_bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    return packed.astype(np.int64)


def _simhash_udf(bits: int):
    @F.pandas_udf(T.LongType())
    def simhash(token_hashes: pd.Series) -> pd.Series:
        arrs = [
            np.asarray(a, dtype=np.int64).view(np.uint64)
            if a is not None and len(a) > 0
            else None
            for a in token_hashes
        ]
        nonempty = [a for a in arrs if a is not None]
        if not nonempty:
            return pd.Series([0] * len(arrs), dtype="int64")
        concat = np.concatenate(nonempty)
        lens = np.fromiter((len(a) for a in nonempty), dtype=np.int64)
        offsets = np.zeros(len(nonempty), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        fps = simhash_batch(concat, offsets, bits)
        out, k = np.zeros(len(arrs), dtype=np.int64), 0
        for i, a in enumerate(arrs):
            if a is not None:
                out[i] = fps[k]
                k += 1
        return pd.Series(out)

    return simhash


def simhash_reference(token_hashes: np.ndarray, bits: int = 64) -> int:
    """Single-doc reference kernel (unit-test oracle for the batch)."""
    x = np.asarray(token_hashes, dtype=np.uint64)
    shifts = np.arange(bits, dtype=np.uint64)
    bitm = ((x[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    margins = 2 * bitm.sum(axis=0) - len(x)
    fp = ((margins > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
    return int(fp.astype(np.int64))


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
    simhashed: DataFrame, cfg: DedupConfig, cache_registry: list | None = None
) -> tuple[DataFrame, DataFrame]:
    """(url, simhash) → verified pairs within the Hamming ball.

    Pigeonhole guarantee: distance ≤ chunks-1 ⇒ some chunk equal; we
    additionally verify bit_count(xor) ≤ max_hamming exactly. The output
    is Hamming-VERIFIED — feed it to run_dedup as a bypass_jaccard
    channel (reason gates still apply).
    """
    exploded = simhashed.select(
        "url", "simhash", F.explode(chunk_keys_expr(cfg)).alias("ck")
    ).select("url", F.col("ck.chunk_idx"), F.col("ck.chunk_key"))
    pairs, hot = pairs_from_buckets(
        exploded, ["chunk_idx", "chunk_key"], cfg,
        cache_registry=cache_registry,
    )

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


def simhash_channel(
    clean: DataFrame, cfg: DedupConfig, cache_registry: list | None = None
) -> tuple[DataFrame, DataFrame]:
    """The full channel over a normalized corpus: short-doc guard →
    fingerprints → pigeonhole buckets → exact Hamming verify.

    The guard (cfg.simhash_min_len) exists because this channel's pairs
    BYPASS the Jaccard gate: for docs a few tokens long the frequency-
    weighted fingerprint is dominated by shared vocabulary, so unrelated
    short docs can land inside the Hamming ball and would merge on
    Hamming evidence alone. Short docs still reach exact + LSH dedup.
    """
    eligible = clean.filter(F.length("norm_text") >= cfg.simhash_min_len)
    sim = with_simhash(eligible, cfg).select("url", "simhash")
    # (url, simhash) is 16 bytes/row and has FIVE consumers downstream
    # (bucket stats + sub-cap + star expansions, then both sides of the
    # Hamming verify join) — unpersisted, each one re-runs the
    # fingerprint UDF over the whole corpus (measured: q3 30 s → ~10 s
    # at 30k docs with the persist). Persist only under a registry
    # (which owns the release) — registry-less callers must not pin a
    # session-lifetime cache.
    if cache_registry is not None:
        sim = sim.persist()
        cache_registry.append(sim)
    return simhash_candidates(sim, cfg, cache_registry=cache_registry)
