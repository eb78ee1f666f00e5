"""Batched weighted-SimHash kernel: the whole-batch segmented reduceat
must equal the single-doc reference kernel, weighting must matter
(frequency, not distinct sets), and word-order shuffles must be
Hamming-0 (the property the channel's recall contribution rests on)."""

from __future__ import annotations

import numpy as np

from dedup.simhash import simhash_batch, simhash_reference


def test_batch_matches_reference_kernel():
    rng = np.random.default_rng(11)
    docs = [
        rng.integers(0, 2**63, size=int(n)).astype(np.uint64)
        for n in rng.integers(1, 200, size=50)
    ]
    concat = np.concatenate(docs)
    lens = np.fromiter((len(d) for d in docs), dtype=np.int64)
    offsets = np.zeros(len(docs), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    got = simhash_batch(concat, offsets)
    for i, d in enumerate(docs):
        assert int(got[i]) == simhash_reference(d), i


def test_weighting_distinguishes_frequency():
    # same distinct-token SET, different frequencies → different simhash
    a = np.array([1, 2, 3] * 1 + [7] * 50, dtype=np.uint64)
    b = np.array([1, 2, 3] * 50 + [7] * 1, dtype=np.uint64)
    assert simhash_reference(a) != simhash_reference(b)


def test_order_shuffle_is_hamming_zero():
    rng = np.random.default_rng(5)
    doc = rng.integers(0, 2**63, size=120).astype(np.uint64)
    shuffled = doc[rng.permutation(len(doc))]
    assert simhash_reference(doc) == simhash_reference(shuffled)


def test_spark_udf_matches_reference(spark):
    from pyspark.sql import functions as F

    from dedup.config import DedupConfig
    from dedup.simhash import with_simhash

    cfg = DedupConfig()
    texts = [
        ("u1", "alpha beta gamma alpha alpha delta"),
        ("u2", "gamma alpha beta delta alpha alpha"),  # shuffle of u1
        ("u3", "epsilon zeta eta theta iota kappa"),
    ]
    df = spark.createDataFrame(texts, "url string, norm_text string")
    got = {r["url"]: r["simhash"] for r in with_simhash(df, cfg).collect()}
    assert got["u1"] == got["u2"]  # multiset-identical → identical fp
    assert got["u1"] != got["u3"]


def test_simhash_bits_over_64_rejected():
    """The batch kernel packs bits into one uint64 word — >64 would
    silently truncate to the low 64 bits; the config refuses it."""
    import pytest

    from dedup.config import DedupConfig

    with pytest.raises(ValueError, match="simhash_bits"):
        DedupConfig(simhash_bits=65)
    with pytest.raises(ValueError, match="simhash_bits"):
        DedupConfig(simhash_bits=0)
    DedupConfig(simhash_bits=32)  # in-range still fine
