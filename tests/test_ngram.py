"""Word n-gram Jaccard channel (dedup/ngram.py).

Semantics checked against a plain-Python reference (set algebra over
word trigrams) plus the edge cases the Column expression must get
right: sub-n-word docs (Spark's sequence() DESCENDS for k < 0 — the
guard is semantics), exactly-n-word docs, the df cap excluding
boilerplate-only pairs without touching the Jaccard value, and the
threshold boundary in integer micro units.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.ngram import ngram_channel, ngram_dup_pairs, word_ngram_hashes


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, norm_text string")


def _py_grams(text: str, n: int) -> set[str]:
    w = text.split(" ") if text else []
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


CFG = DedupConfig(hash_mode="portable")


def test_gram_counts_and_edges(spark):
    df = _pages(
        spark,
        [
            ("u1", "a b c d"),       # 2 trigrams
            ("u2", "a b c"),         # exactly n words -> 1 gram
            ("u3", "a b"),           # < n words -> 0 grams (guard!)
            ("u4", ""),              # empty -> 0 grams
            ("u5", "x x x x"),       # 2 windows, same gram -> distinct 1
        ],
    )
    out = {
        r["url"]: r["n"]
        for r in df.select(
            "url", F.size(word_ngram_hashes(F.col("norm_text"), CFG)).alias("n")
        ).collect()
    }
    assert out == {"u1": 2, "u2": 1, "u3": 0, "u4": 0, "u5": 1}


def test_pairs_match_python_reference(spark):
    rows = [
        ("u1", "the quick brown fox jumps over the lazy dog"),
        ("u2", "the quick brown fox leaps over the lazy dog"),
        ("u3", "the quick brown fox jumps over the lazy dog today"),
        ("u4", "completely different words entirely here now"),
    ]
    cfg = DedupConfig(
        hash_mode="portable", ngram_jaccard_threshold=0.3, ngram_df_cap=64
    )
    pairs, hot = ngram_dup_pairs(_pages(spark, rows), cfg)
    got = {
        (r["url_a"], r["url_b"]): (r["n_inter"], r["n_union"], r["jaccard_micro"])
        for r in pairs.collect()
    }
    # python reference over the same spec
    sets = {u: _py_grams(t, 3) for u, t in rows}
    want = {}
    urls = sorted(sets)
    for i, a in enumerate(urls):
        for b in urls[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter == 0:
                continue
            jm = (1_000_000 * inter) // union
            if jm >= 300_000:
                want[(a, b)] = (inter, union, jm)
    assert got == want
    assert hot.count() == 0  # nothing crosses df_cap=64 here


def test_df_cap_blocks_boilerplate_only_pairs(spark):
    # 5 docs share ONLY the boilerplate gram; cap=4 excludes it from
    # candidate generation, so no pair forms even though pairwise
    # jaccard would be 1.0
    rows = [(f"u{i}", "all rights reserved") for i in range(5)]
    cfg = DedupConfig(hash_mode="portable", ngram_df_cap=4)
    pairs, hot = ngram_dup_pairs(_pages(spark, rows), cfg)
    assert pairs.count() == 0
    hot_rows = hot.collect()
    assert len(hot_rows) == 1 and hot_rows[0]["df"] == 5
    # raising the cap restores the pairs (value unchanged by the cap)
    cfg2 = DedupConfig(hash_mode="portable", ngram_df_cap=5)
    pairs2, _ = ngram_dup_pairs(_pages(spark, rows), cfg2)
    assert pairs2.count() == 10
    assert all(r["jaccard_micro"] == 1_000_000 for r in pairs2.collect())


def test_capped_gram_still_counts_in_value(spark):
    # shared rare gram seeds the pair; the capped boilerplate gram must
    # still contribute to inter/union (cap gates candidates, not value)
    boiler = "all rights reserved"
    rows = [
        ("u1", f"unique alpha beta {boiler}"),
        ("u2", f"unique alpha beta {boiler} extra"),
        ("u3", boiler),
        ("u4", boiler),
        ("u5", boiler),
    ]
    cfg = DedupConfig(
        hash_mode="portable", ngram_df_cap=4, ngram_jaccard_threshold=0.1
    )
    pairs, _ = ngram_dup_pairs(_pages(spark, rows), cfg)
    got = {(r["url_a"], r["url_b"]): (r["n_inter"], r["n_union"]) for r in pairs.collect()}
    s1, s2 = _py_grams(rows[0][1], 3), _py_grams(rows[1][1], 3)
    assert got[("u1", "u2")] == (len(s1 & s2), len(s1 | s2))


def test_threshold_boundary_micro(spark):
    # jaccard exactly at the threshold is KEPT (>=), just below is not
    rows = [
        ("u1", "a b c d"),   # grams {abc, bcd}
        ("u2", "a b c e"),   # grams {abc, bce} -> inter 1, union 3 -> 333333
    ]
    keep = DedupConfig(hash_mode="portable", ngram_jaccard_threshold=0.333333)
    drop = DedupConfig(hash_mode="portable", ngram_jaccard_threshold=0.333334)
    assert ngram_dup_pairs(_pages(spark, rows), keep)[0].count() == 1
    assert ngram_dup_pairs(_pages(spark, rows), drop)[0].count() == 0


def test_fast_and_portable_same_pair_set(spark):
    rows = [
        ("u1", "the quick brown fox jumps over the lazy dog"),
        ("u2", "the quick brown fox leaps over the lazy dog"),
        ("u3", "completely different words entirely here now"),
    ]
    fast = ngram_dup_pairs(
        _pages(spark, rows), DedupConfig(ngram_jaccard_threshold=0.3)
    )[0]
    port = ngram_dup_pairs(
        _pages(spark, rows),
        DedupConfig(hash_mode="portable", ngram_jaccard_threshold=0.3),
    )[0]
    cols = ["url_a", "url_b", "n_inter", "n_union", "jaccard_micro"]
    assert sorted(map(tuple, fast.select(cols).collect())) == sorted(
        map(tuple, port.select(cols).collect())
    )


def test_channel_pairs_face_pipeline_gates(spark):
    """e2e: an ngram candidate pair between same-source pages is still
    blocked by the source-overlap gate in run_dedup."""
    from dedup.pipeline import run_dedup

    text_a = "shared sentence of many common words repeated here " * 8
    pages = spark.createDataFrame(
        [
            ("https://a.example/1", 1, text_a, "en", "src1"),
            ("https://a.example/2", 2, text_a + " tail", "en", "src1"),
        ],
        "url string, warc_ts_epoch long, text string, lang string, source string",
    ).withColumn("warc_ts", F.col("warc_ts_epoch").cast("timestamp"))
    sources = spark.createDataFrame(
        [("https://a.example/1", "srcX"), ("https://a.example/2", "srcX")],
        "url string, source string",
    )
    from dedup.pipeline import prepare_clean

    cfg = DedupConfig(ngram_jaccard_threshold=0.3)
    clean = prepare_clean(pages)
    ch_pairs, _ = ngram_channel(clean, cfg)
    assert ch_pairs.count() == 1  # the channel proposes the pair
    res = run_dedup(
        pages, cfg, sources=sources, candidate_channels=[ch_pairs],
        persist=False, persist_pairs=False, clean=clean,
    )
    # same-source overlap gate blocks the merge: two singleton clusters
    assert res.assignments.select("cluster_id").distinct().count() == 2
    res.release()


def test_matches_duckdb_oracle_sf0001(spark, sf_dir):
    """Cheap local replica of the driver compare at sf0.001 (the full
    sf0.01 run lives in test_oracle_parity)."""
    import duckdb

    import __spark_entry__ as entrymod

    sdf = entrymod.queries()["ngram_dup_pairs"](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    odf = con.sql(entrymod.oracle_sql()["ngram_dup_pairs"]).df()
    key = ["url_a", "url_b"]
    s = sdf.sort_values(key, ignore_index=True)
    o = odf.sort_values(key, ignore_index=True)[s.columns]
    assert len(s) == len(o)
    assert s.equals(o.astype(s.dtypes.to_dict()))


def test_random_sweep_grams_match_python_h60(spark):
    """Seeded randomized cross-check of the whole gram construction —
    tokenize, window, distinct, portable hash — against an independent
    pure-Python md5 reference (one Spark job for all docs)."""
    import hashlib
    import random

    rng = random.Random(7)
    vocab = ["a", "bb", "ccc", "dd0", "e", "ff", "g9", "h", "i", "jj"]
    docs = []
    for i in range(60):
        nw = rng.randint(0, 8)
        docs.append((f"u{i}", " ".join(rng.choice(vocab) for _ in range(nw))))

    def py_h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def py_grams(text: str, n: int) -> set[int]:
        w = text.split(" ") if text else []
        return {
            py_h60(" ".join(w[i : i + n])) for i in range(len(w) - n + 1)
        }

    got = {
        r["url"]: set(r["g"])
        for r in _pages(spark, docs)
        .select("url", word_ngram_hashes(F.col("norm_text"), CFG).alias("g"))
        .collect()
    }
    want = {u: py_grams(t, CFG.ngram_n) for u, t in docs}
    assert got == want
