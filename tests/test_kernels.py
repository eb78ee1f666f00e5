"""Pure-kernel unit tests (SURVEY.md §5 layer 2): hashing, MinHash
signatures, SimHash, winnowing, suffix-array LCP vs brute force,
banding math, connected components vs networkx-free reference."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.hashing import minhash_rows, perm_seeds, splitmix64
from dedup.suffix import suffix_array_lcp_pairs, winnow_fingerprints


def test_splitmix64_deterministic_and_mixing():
    x = np.arange(10, dtype=np.uint64)
    a, b = splitmix64(x), splitmix64(x)
    assert (a == b).all()
    assert len(np.unique(a)) == 10
    assert (a != x).all()


def test_minhash_jaccard_estimate():
    # two sets with known Jaccard 0.5 — estimate within ~4 sigma
    rng = np.random.default_rng(7)
    common = rng.integers(0, 2**63, 500).astype(np.uint64)
    only_a = rng.integers(0, 2**63, 250).astype(np.uint64)
    only_b = rng.integers(0, 2**63, 250).astype(np.uint64)
    seeds = perm_seeds(256, 42)
    sa = minhash_rows(np.concatenate([common, only_a]), seeds)
    sb = minhash_rows(np.concatenate([common, only_b]), seeds)
    est = (sa == sb).mean()
    true_j = 500 / 1000
    assert abs(est - true_j) < 4 * np.sqrt(true_j * (1 - true_j) / 256)


def test_minhash_identical_sets_identical_sigs():
    seeds = perm_seeds(64, 42)
    x = np.arange(100, dtype=np.uint64) * np.uint64(2654435761)
    assert (minhash_rows(x, seeds) == minhash_rows(x[::-1].copy(), seeds)).all()


def test_banding_threshold_math():
    # (1/b)^(1/r) approximates the S-curve threshold
    cfg = DedupConfig()
    thr = (1 / cfg.bands) ** (1 / cfg.rows_per_band)
    assert 0.3 < thr <= 0.5  # b=16, r=4 → 0.5, below jaccard_threshold
    p_detect = 1 - (1 - cfg.jaccard_threshold**cfg.rows_per_band) ** cfg.bands
    assert p_detect > 0.999  # at J=0.8 the LSH recall budget holds
    # min-band-collision prune keeps the budget too: P[X >= 2]
    import math

    p = cfg.jaccard_threshold**cfg.rows_per_band
    p_lt2 = (1 - p) ** cfg.bands + cfg.bands * p * (1 - p) ** (cfg.bands - 1)
    assert p_lt2 < 0.005


def test_winnow_fingerprints_containment():
    base = "the quick brown fox jumps over the lazy dog " * 5
    longer = "PREFIX PAD TEXT " + base + " SUFFIX PAD"
    fa = winnow_fingerprints(base, 9, 32)
    fb = winnow_fingerprints(longer, 9, 32)
    shared = np.intersect1d(fa, fb)
    # almost all of the contained doc's fingerprints appear in the container
    assert len(shared) >= max(len(fa) - 2, 1)


def test_winnow_deterministic_and_short_input():
    assert len(winnow_fingerprints("abc", 9, 32)) == 0
    f1 = winnow_fingerprints("abcdefghij" * 10, 9, 32)
    f2 = winnow_fingerprints("abcdefghij" * 10, 9, 32)
    assert (f1 == f2).all() and len(f1) > 0


def test_suffix_array_lcp_vs_brute_force():
    texts = {
        "a": "xxxx the common long substring here yyyy",
        "b": "zzzz the common long substring here wwww",
        "c": "totally unrelated content qqqq rrrr ssss",
        "d": "another document with different words entirely",
    }
    min_lcp = 20
    pairs = suffix_array_lcp_pairs(texts, min_lcp)

    def brute(t1, t2, k):
        grams = {t1[i : i + k] for i in range(len(t1) - k + 1)}
        return any(t2[i : i + k] in grams for i in range(len(t2) - k + 1))

    expected = sorted(
        tuple(sorted((i, j)))
        for i in texts
        for j in texts
        if i < j and brute(texts[i], texts[j], min_lcp)
    )
    assert pairs == expected


def test_simhash_hamming_locality(spark):
    from dedup.simhash import with_simhash

    cfg = DedupConfig()
    base = " ".join(f"token{i}" for i in range(60))
    near = base.replace("token7", "tokenX")
    far = " ".join(f"other{i}" for i in range(60))
    df = spark.createDataFrame(
        [(u, t) for u, t in [("b", base), ("n", near), ("f", far)]],
        "url string, norm_text string",
    )
    rows = {r["url"]: r["simhash"] for r in with_simhash(df, cfg).collect()}
    ham_near = bin(rows["b"] ^ rows["n"]).count("1")
    ham_far = bin(rows["b"] ^ rows["f"]).count("1")
    assert ham_near < 10 < ham_far


def test_simhash_candidates_find_near_pair(spark):
    from dedup.simhash import simhash_candidates, with_simhash

    # hamming ≤ 3 is a LONG-document regime: a one-token swap flips
    # ~64·P(|vote margin|<1) bits and margins grow like sqrt(n_tokens),
    # so 600 tokens keeps the expected flips ~2 (Manku et al. WWW'07
    # operate at k=3 on full web pages for the same reason)
    cfg = DedupConfig()
    base = " ".join(f"token{i}" for i in range(600))
    docs = [("https://a", base), ("https://b", base.replace("token7 ", "tX "))]
    docs += [
        (f"https://u{i}", " ".join(f"w{i}_{j}" for j in range(50)))
        for i in range(20)
    ]
    df = spark.createDataFrame(docs, "url string, norm_text string")
    sim = with_simhash(df, cfg).select("url", "simhash")
    pairs, _hot = simhash_candidates(sim, cfg)
    got = {(r["url_a"], r["url_b"]) for r in pairs.collect()}
    assert ("https://a", "https://b") in got
