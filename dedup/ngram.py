"""Word n-gram Jaccard near-dup channel.

Character-shingle MinHash (dedup/minhash.py) *estimates* Jaccard over
9-char grams; this channel computes EXACT Jaccard over WORD n-grams —
the classic text-reuse statistic (w-shingling, Broder 1997), and the
form a training-data pipeline reaches for when near-dup evidence must
be reported as an exact set statistic rather than a signature estimate.

Reference analogue: another candidate SOURCE feeding the same verify
tail — the reference runs every pair through canMerge regardless of
provenance (/root/reference/lib/marc-record-merge-melindautils.js:84-104);
here n-gram pairs enter run_dedup via candidate_channels and pass the
identical Jaccard threshold + reason gates as LSH pairs.

Pipeline shape (all JVM Column expressions — no Python in the path):

1. gram table: distinct hashed word n-grams per doc, built with
   ``transform(sequence(...), i -> concat_ws(' ', slice(words, i, n)))``
   — one projection, no explode until the inverted index needs rows.
2. document-frequency cap: a gram appearing in more than
   ``ngram_df_cap`` docs is boilerplate vocabulary ("all rights
   reserved" …) — it is dropped from CANDIDATE GENERATION only (the
   prefix-filter / stop-gram move, same role as the LSH hot-bucket cap
   dedup/candidates.py:99), never from the Jaccard value itself. The
   dropped mass is returned as lineage, not silently discarded.
3. candidate pairs: self-join of the rare-gram inverted index —
   per-gram fan-out is bounded by df_cap², and the 8-byte gram hash +
   8-byte uid-able urls keep shuffle rows narrow.
4. exact verify: gram ARRAYS are shipped only for urls that survived
   candidate generation (the recompute-for-survivors discipline of
   dedup/pipeline._jaccard_incl_exact); intersection/union in integer
   micro units — float-free, so the DuckDB oracle hashes identically.

100-TB shape: one explode + one groupBy(ghash) for the index (shuffle
on the gram hash — uniform by construction, hashes don't skew), the
df cap bounds the only quadratic term, and the verify join touches
candidates only. Boilerplate floods degrade candidate recall for pairs
sharing ONLY capped grams (reported via the lineage frame), exactly
like the LSH hot-bucket star cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dedup.config import DedupConfig
from dedup.hashing import h60

MICRO = 1_000_000


def word_ngram_hashes(text_col: Column, cfg: DedupConfig) -> Column:
    """array<long> of DISTINCT hashed word n-grams of a normalized text
    column. The normalizer (dedup/normalize.py) guarantees single-space
    separation and no leading/trailing blanks, so ``split(col, ' ')``
    is the word tokenizer. Docs with fewer than n words yield an empty
    array (``sequence(0, k)`` with k < 0 would DESCEND in Spark — the
    guard is semantics, not style)."""
    n = cfg.ngram_n
    words = F.split(text_col, " ")
    grams = F.when(
        (F.length(text_col) > 0) & (F.size(words) >= n),
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hasher = h60 if cfg.hash_mode == "portable" else (lambda g: F.xxhash64(g))
    return F.array_distinct(F.transform(grams, lambda g: hasher(g)))


def ngram_gram_table(clean: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(url, ghash) inverted-index rows — one row per distinct word
    n-gram per doc."""
    return clean.select(
        "url",
        F.explode(word_ngram_hashes(F.col("norm_text"), cfg)).alias("ghash"),
    )


def ngram_dup_pairs(
    clean: DataFrame,
    cfg: DedupConfig,
    cache_registry: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Exact word-n-gram Jaccard near-dup pairs.

    Returns (pairs, hot_grams):

    pairs — (url_a, url_b, n_inter, n_union, jaccard_micro) for every
    unordered pair sharing at least one gram with document frequency ≤
    ``cfg.ngram_df_cap``, whose exact n-gram Jaccard (over the FULL
    distinct gram sets, capped grams included) reaches
    ``cfg.ngram_jaccard_threshold``. Integer micro arithmetic
    throughout (floor division) — the value is oracle-hashable.

    hot_grams — (ghash, df) for grams the cap excluded from candidate
    generation: the channel's skew lineage, same contract as the LSH
    hot-bucket frame.

    `clean` needs (url, norm_text). When `cache_registry` is given the
    gram table is persisted into it (three consumers: df counts, the
    two sides of the candidate self-join; ownership follows the
    registry convention — caller unpersists). Registry-less calls
    (direct production use, the driver query) recompute the gram table
    once per consumer — up to 3× — rather than pin a session-lifetime
    cache; pass a registry when calling in a loop.
    """
    cap = cfg.ngram_df_cap
    thr_micro = int(round(cfg.ngram_jaccard_threshold * MICRO))

    grams = ngram_gram_table(clean.select("url", "norm_text"), cfg)
    if cache_registry is not None:
        from pyspark import StorageLevel

        grams = grams.persist(StorageLevel.MEMORY_AND_DISK)
        cache_registry.append(grams)

    gram_df = grams.groupBy("ghash").agg(F.count("*").alias("df"))
    hot = gram_df.filter(F.col("df") > cap)
    rare = grams.join(
        gram_df.filter(F.col("df") <= cap).select("ghash"), "ghash", "left_semi"
    )
    cand = (
        rare.alias("a")
        .join(rare.alias("b"), "ghash")
        .filter(F.col("a.url") < F.col("b.url"))
        .select(
            F.col("a.url").alias("url_a"), F.col("b.url").alias("url_b")
        )
        .distinct()
    )

    # exact verify over full gram sets, candidates only: ship each
    # needed doc's gram array once per pair side, never the corpus's
    needed = cand.select(
        F.explode(F.array("url_a", "url_b")).alias("url")
    ).distinct()
    sets = clean.join(needed, "url").select(
        "url", word_ngram_hashes(F.col("norm_text"), cfg).alias("gset")
    )
    sa = sets.select(F.col("url").alias("url_a"), F.col("gset").alias("g_a"))
    sb = sets.select(F.col("url").alias("url_b"), F.col("gset").alias("g_b"))
    inter = F.size(F.array_intersect("g_a", "g_b")).cast("long")
    union = (F.size("g_a") + F.size("g_b")).cast("long") - inter
    # two-step select: n_inter/n_union are projected ONCE and
    # jaccard_micro derives from those columns — the old single-select
    # re-spelled size(array_intersect(...)) three times inside an
    # F.expr string, relying on codegen CSE for cost and on the SQL
    # text never drifting from the Column-built definitions (ADVICE
    # r5). Integer `div` keeps the established oracle-micro idiom; a
    # candidate pair shares ≥ 1 gram, so the union is never zero.
    pairs = (
        cand.join(sa, "url_a")
        .join(sb, "url_b")
        .select(
            "url_a",
            "url_b",
            inter.alias("n_inter"),
            union.alias("n_union"),
        )
        .select(
            "url_a",
            "url_b",
            "n_inter",
            "n_union",
            F.expr(
                f"CAST(({MICRO} * n_inter) div n_union AS BIGINT)"
            ).alias("jaccard_micro"),
        )
        .filter(F.col("jaccard_micro") >= thr_micro)
    )
    return pairs, hot


def ngram_channel(
    clean: DataFrame, cfg: DedupConfig, cache_registry: list | None = None
) -> tuple[DataFrame, DataFrame]:
    """CLI/channel surface: (url_a, url_b) candidate pairs for
    run_dedup's candidate_channels (n-gram overlap is candidate
    EVIDENCE; the pipeline's char-shingle Jaccard threshold + reason
    gates remain the verification, like every other candidate source),
    plus the hot-gram lineage frame."""
    pairs, hot = ngram_dup_pairs(clean, cfg, cache_registry=cache_registry)
    return pairs.select("url_a", "url_b"), hot
