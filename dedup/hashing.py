"""Hash kernels.

Two families, selected by DedupConfig.hash_mode:

* "fast" (production): JVM-side ``xxhash64`` for shingle/band hashing and
  numpy splitmix64 for MinHash permutations — zero Python in the
  shingle-hash path, Arrow-vectorized Python only for signatures.

* "portable": a 60-bit md5-derived hash ``h60`` with the *same* value in
  Spark SQL and DuckDB SQL, so the whole MinHash/LSH chain can be
  oracle-verified by the driver. Spark:
      cast(conv(substring(md5(x),1,15),16,10) as bigint)
  DuckDB:
      ('0x' || substr(md5(x),1,15))::BIGINT
  15 hex chars = 60 bits → always positive, no overflow in either engine.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F


# ---------------------------------------------------------------- portable
def h60(col: Column) -> Column:
    """60-bit md5 hash of a string column; DuckDB-equal (see oracle.py)."""
    return F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 15), 16, 10).cast(
        "long"
    )


def h60_duckdb(expr: str) -> str:
    """The same hash as DuckDB SQL text."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


# ------------------------------------------------------------------- fast
# splitmix64 — public-domain mixing constants (Steele et al., "Fast
# splittable pseudorandom number generators", OOPSLA'14); standard numpy
# uint64 wraparound arithmetic.
_SM64_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM64_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM64_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 arrays."""
    x = (x + _SM64_GAMMA).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * _SM64_M1).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * _SM64_M2).astype(np.uint64)
    x ^= x >> np.uint64(31)
    return x


def rolling_poly_hashes(b: np.ndarray, width: int) -> np.ndarray:
    """splitmix64-finalized polynomial rolling hashes of every `width`-byte
    window of `b` (uint8): h[i] = splitmix64(Σ_j b[i+j]·257^j mod 2⁶⁴).

    THE shared k-gram hash construction — the MinHash shingle kernel
    (dedup/minhash.py) and the winnowing fingerprint kernel
    (dedup/suffix.py) must stay bit-identical, so both call this.

    Horner evaluation over `width` shifted byte views: iterate j from
    width-1 down to 0 so the FIRST window byte lands on 257^0. One
    n-vector accumulator and `width` fused multiply-adds — no
    (n × width) matrix ever materializes (the kernel is memory-
    bandwidth-bound; the windowed matmul form cost ~40% more traffic
    and 8·width bytes per input byte of peak memory)."""
    n = len(b) - width + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    base = np.uint64(257)
    raw = b[width - 1 : width - 1 + n].astype(np.uint64)
    for j in range(width - 2, -1, -1):
        raw *= base
        raw += b[j : j + n]
    return splitmix64(raw)


def perm_seeds(num_perm: int, seed: int) -> np.ndarray:
    """Deterministic per-permutation 64-bit seeds."""
    base = splitmix64(np.arange(num_perm, dtype=np.uint64) + np.uint64(seed) * np.uint64(0x51ED2701))
    return base


def minhash_rows(hash_matrix: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """MinHash of one document's shingle-hash vector under each seed.

    sig_j = min_x splitmix64(x ^ seed_j) — a distinct pseudo-permutation
    of the 64-bit hash space per seed. Returns int64 (two's-complement
    view of the uint64 minima, matching Spark LongType).
    """
    # hash_matrix: (n_shingles,) uint64; seeds: (num_perm,) uint64
    mixed = splitmix64(hash_matrix[None, :] ^ seeds[:, None])  # (p, n)
    return mixed.min(axis=1).astype(np.int64)


def minhash_batch(
    concat_hashes: np.ndarray, offsets: np.ndarray, seeds: np.ndarray
) -> np.ndarray:
    """Batched MinHash: segmented-min per seed over the Arrow batch
    (np.minimum.reduceat), instead of a (num_perm × n) matrix allocation
    per document. Returns (n_docs, num_perm) int64.

    Cache blocking: the seed loop would otherwise stream the whole
    concat array from RAM num_perm times (e.g. 64 × 800 MB per batch —
    memory-bandwidth-bound, the measured hot spot at high core counts).
    Instead the batch is cut into doc-aligned blocks sized to stay in
    L2/L3; each block runs the full seed loop while hot, and per-block
    minima combine into the output with elementwise minimum.

    concat_hashes: all docs' shingle hashes concatenated (uint64);
    offsets: start index of each doc's segment (len == n_docs, offsets[0]==0).
    Empty batches are the caller's responsibility (reduceat needs data).
    """
    n_docs = len(offsets)
    n = len(concat_hashes)
    out = np.full((n_docs, len(seeds)), np.iinfo(np.int64).max, dtype=np.int64)
    # ~512 KB of uint64 per block keeps the working set cache-resident
    block_target = 64 * 1024
    d0 = 0
    while d0 < n_docs:
        # extend the block doc-by-doc until it reaches the target size
        d1 = int(
            np.searchsorted(offsets, offsets[d0] + block_target, side="left")
        )
        d1 = max(d1, d0 + 1)
        start = offsets[d0]
        end = offsets[d1] if d1 < n_docs else n
        chunk = concat_hashes[start:end]
        offs = (offsets[d0:d1] - start).astype(np.int64)
        for j, seed in enumerate(seeds):
            mixed = splitmix64(chunk ^ seed)
            out[d0:d1, j] = np.minimum.reduceat(mixed, offs).astype(np.int64)
        d0 = d1
    return out
