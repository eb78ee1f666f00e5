"""Exact-substring dedup — the suffix pass (SURVEY.md §7 stage 9).

Goal: find pairs (A, B) where A's text appears verbatim inside B's
(the containment analogue of the reference's normalized multiset
containment, isSubset, lib/record-utils.js:260-279 — SURVEY.md §2.3.1).

Scale design (two phases, both shuffle-bounded):

1. Candidate generation by *winnowing fingerprints* (Schleimer et al.,
   SIGMOD'03): every doc emits the set of k-gram hashes selected by the
   winnowing rule (min hash in each sliding window). If A ⊆ B then all
   of A's selected fingerprints (away from the edges) also appear in B,
   so "docs sharing ≥ substring_min_shared fingerprints" is a
   high-recall candidate blocking key. Fingerprint emission is a
   `mapInPandas` numpy kernel (rolling hashes, vectorized); the bucket
   join reuses the capped pair expansion from dedup.candidates, so hot
   fingerprints (boilerplate) are bounded exactly like hot LSH bands.

2. Verification by per-pair suffix comparison: a containment check
   `instr(big.norm_text, small.norm_text) > 0` — JVM-side — on the
   (tiny) candidate set. For block-local exact LCP work, a per-bucket
   suffix-array kernel (numpy argsort over fixed-width slices) is
   exposed as `suffix_array_lcp_pairs` and exercised in unit tests;
   the pipeline uses the containment verify by default because the
   north-star semantics ("one doc embedded in a longer doc",
   FIXTURES.md dup_kind=substring) is containment.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from dedup.candidates import pairs_from_buckets
from dedup.config import DedupConfig
from dedup.hashing import rolling_poly_hashes


def winnow_fingerprints(
    text: str, k: int, window: int
) -> np.ndarray:
    """Winnowing fingerprint set of one string (robust winnowing:
    rightmost-min per window). Returns sorted unique uint64 hashes."""
    n = len(text)
    if n < k:
        return np.array([], dtype=np.uint64)
    b = np.frombuffer(text.encode("utf-8", "ignore")[: n * 4], dtype=np.uint8)
    # byte-level k-grams over the utf-8 stream; for ascii-normalized text
    # byte == char so the window semantics match the char definition.
    # Same Horner rolling-hash kernel as the MinHash shingles
    # (dedup/hashing.rolling_poly_hashes) — bit-identical construction,
    # O(m) memory instead of the old (m × k) strided matrix.
    hashes = rolling_poly_hashes(b, k)
    m = len(hashes)
    if m <= 0:
        return np.array([], dtype=np.uint64)
    if m <= window:
        return np.unique(hashes.min(keepdims=True))
    win = np.lib.stride_tricks.sliding_window_view(hashes, window)
    return np.unique(win.min(axis=1))


def fingerprint_table(
    pages_with_norm: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """(url, fp) — one row per winnowed fingerprint per doc."""
    k, window, min_len = cfg.k_shingle, cfg.fingerprint_window, cfg.substring_min_len

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, fps = [], []
            for url, text in zip(pdf["url"], pdf["norm_text"]):
                if text is None or len(text) < min_len:
                    continue
                f = winnow_fingerprints(text, k, window)
                urls.extend([url] * len(f))
                fps.extend(f.astype(np.int64))
            yield pd.DataFrame({"url": urls, "fp": pd.array(fps, dtype="int64")})

    return pages_with_norm.select("url", "norm_text").mapInPandas(
        gen, schema="url string, fp long"
    )


def substring_candidates(
    pages_with_norm: DataFrame, cfg: DedupConfig,
    cache_registry: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Candidate pairs sharing >= substring_min_shared fingerprints.

    Exact-duplicate texts are collapsed to one representative BEFORE
    fingerprinting — identical texts have identical fingerprint sets, so
    a family of byte-identical copies would otherwise flood every one of
    its fingerprint buckets past the hot cap and route the true
    containment pair through an unrelated star hub (losing it). The
    run_dedup exact channel reconnects members to their representative.
    """
    reps = (
        pages_with_norm.groupBy(F.xxhash64("norm_text").alias("th"))
        .agg(F.min("url").alias("url"))
        .select("url")
    )
    rep_pages = pages_with_norm.join(reps, "url")
    fps = fingerprint_table(rep_pages, cfg)
    # (url, fp) is 16 bytes/row with THREE consumers inside the bucket
    # expansion (stats, sub-cap, star) — unpersisted, each re-runs the
    # winnowing UDF over the whole corpus. Persist only when a registry
    # takes ownership of the release; without one the cache would pin
    # for the session lifetime.
    if cache_registry is not None:
        fps = fps.persist()
        cache_registry.append(fps)
    # min_collisions carries the shared-fingerprint threshold: pair
    # multiplicity (number of fingerprint buckets a pair co-occurs in)
    # IS the shared-fingerprint count, computed inside the bucket
    # expansion on slim pair rows.
    pairs, hot = pairs_from_buckets(
        fps, ["fp"], cfg,
        min_collisions=cfg.substring_min_shared,
        keep_collisions=True,
        max_bucket=cfg.substring_max_bucket,
        cache_registry=cache_registry,
    )
    return pairs.withColumnRenamed("n_collisions", "shared_fps"), hot


def verify_containment(
    candidates: DataFrame, pages_with_norm: DataFrame
) -> DataFrame:
    """Keep pairs where one normalized text contains the other verbatim.

    Output: (url_a, url_b, contained_url, container_url)."""
    ta = pages_with_norm.select(
        F.col("url").alias("url_a"), F.col("norm_text").alias("t_a")
    )
    tb = pages_with_norm.select(
        F.col("url").alias("url_b"), F.col("norm_text").alias("t_b")
    )
    j = candidates.join(ta, "url_a").join(tb, "url_b")
    a_in_b = F.instr(F.col("t_b"), F.col("t_a")) > 0
    b_in_a = F.instr(F.col("t_a"), F.col("t_b")) > 0
    return (
        j.filter(a_in_b | b_in_a)
        .select(
            "url_a",
            "url_b",
            F.when(a_in_b, F.col("url_a")).otherwise(F.col("url_b")).alias(
                "contained_url"
            ),
            F.when(a_in_b, F.col("url_b")).otherwise(F.col("url_a")).alias(
                "container_url"
            ),
        )
    )


def substring_edges(
    pages_with_norm: DataFrame, cfg: DedupConfig,
    cache_registry: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The full substring channel: winnow → block → verify → edges."""
    cand, hot = substring_candidates(
        pages_with_norm, cfg, cache_registry=cache_registry
    )
    verified = verify_containment(cand, pages_with_norm)
    edges = verified.select(
        "url_a", "url_b", F.lit(1.0).alias("jaccard"),
        F.lit("substring").alias("channel"),
    )
    return edges, hot


# ----------------------------------------------------------------- kernels
def suffix_array_lcp_pairs(
    texts: dict[str, str], min_lcp: int
) -> list[tuple[str, str]]:
    """Per-block exact kernel: every cross-doc pair sharing a common
    substring of length ≥ min(min_lcp, 64), via a suffix array (numpy
    lexsort over fixed-width suffix slices) + equal-prefix run scan.

    Runs of suffixes with identical width-slices yield ALL cross-doc
    pairs of the run's doc set (not just lexsort-adjacent ones), so the
    output equals the width-gram-sharing relation exactly — the property
    the distributed parity test pins. Pair fan-out per run is bounded by
    the block's doc count, which the caller caps."""
    ids, chunks = [], []
    for did, t in texts.items():
        ids.append(did)
        chunks.append(t)
    if not chunks:
        return []
    sep = "\x00"
    joined = sep.join(chunks)
    doc_of = np.empty(len(joined), dtype=np.int32)
    pos = 0
    for i, c in enumerate(chunks):
        doc_of[pos : pos + len(c)] = i
        if pos + len(c) < len(joined):
            doc_of[pos + len(c)] = -1
        pos += len(c) + 1
    b = np.frombuffer(joined.encode("latin-1", "replace"), dtype=np.uint8)
    n = len(b)
    width = min(min_lcp, 64)
    if n < width:
        return []
    # drop suffixes whose window crosses a doc boundary: equivalent to
    # scanning the window for the \x00 separator, but O(m) on the
    # doc_of array instead of O(m × width) on the bytes — doc ids are
    # monotone with exactly one -1 between docs, so first byte and last
    # byte in the same doc ⇒ the whole window is
    m0 = n - width + 1
    valid = (doc_of[:m0] == doc_of[width - 1:]) & (doc_of[:m0] >= 0)
    vidx = np.nonzero(valid)[0]
    if len(vidx) < 2:
        return []
    vv = np.lib.stride_tricks.sliding_window_view(b, width)[vidx]
    # Two-level grouping — the full-width lexsort was the kernel's
    # remaining hot spot and only the equal-window RUNS matter, not the
    # total order: (1) one cheap 64-bit mix of the window's u64 words
    # puts every pair of EQUAL windows under an equal hash; (2) rows
    # whose hash repeats (true duplicates + ~2^-64 collisions, a tiny
    # subset of the dominant unique tail) go through the exact
    # byte-level lexsort + equality run detection, so collisions can
    # only add rows to the exact pass, never a wrong pair. Result is
    # identical to lexsorting all rows; the unique tail skips the
    # width-key sort entirely.
    from dedup.hashing import splitmix64

    nw = (width + 7) // 8
    if width % 8 == 0:
        words = np.ascontiguousarray(vv).view(np.uint64)
    else:  # zero-pad the tail word (equal padding, equal hashes)
        pad = np.zeros((len(vv), nw * 8 - width), dtype=np.uint8)
        words = np.ascontiguousarray(
            np.concatenate([vv, pad], axis=1)
        ).view(np.uint64)
    h = words[:, 0].copy()
    for k in range(1, nw):
        h = splitmix64(h ^ words[:, k])
    order = np.argsort(h, kind="stable")
    hs = h[order]
    eqh = hs[1:] == hs[:-1]
    dup = np.zeros(len(hs), dtype=bool)
    dup[1:] |= eqh
    dup[:-1] |= eqh
    cand_rows = order[dup]
    if len(cand_rows) < 2:
        return []
    vv2 = vv[cand_rows]
    perm = np.lexsort(vv2.T[::-1])
    sorted_view = vv2[perm]
    sorted_docs = doc_of[vidx[cand_rows[perm]]]
    # vectorized run detection: adjacent equal width-slices share a run
    # id; only rows in ≥2-member runs survive the pair expansion below
    eq = (sorted_view[1:] == sorted_view[:-1]).all(axis=1)
    run_id = np.concatenate([[0], np.cumsum(~eq)])
    sizes = np.bincount(run_id)
    keep = sizes[run_id] >= 2
    kept_rid = run_id[keep]
    kept_doc = sorted_docs[keep]
    if not len(kept_rid):
        return []
    # Vectorized run → pair expansion. The old per-run Python loop
    # (np.split + nested emit over every ≥2-member run) was the
    # channel's measured CPU hot spot — 5.7M tiny-run iterations ≈ 45
    # of the 56 kernel CPU-seconds at 30k docs, vs ~1.3 s for the
    # suffix sort itself. Same relation, whole-array ops only:
    nd = np.int64(len(ids))
    # 1. distinct (run, doc) membership — a doc's repeated suffixes in
    #    one run must not multiply pairs (the old set() per run)
    uk = np.unique(kept_rid.astype(np.int64) * nd + kept_doc)
    rid, doc = uk // nd, uk % nd
    starts = np.concatenate([[0], np.nonzero(np.diff(rid))[0] + 1])
    run_sizes = np.diff(np.append(starts, len(rid)))
    # 2. all unordered pairs per run, batched by run size (bounded by
    #    the caller's block cap): runs of one size stack into a (k, s)
    #    matrix and emit their triu index pairs in bulk
    pair_keys = []
    for s in np.unique(run_sizes):
        if s < 2:
            continue
        sel = starts[run_sizes == s]
        docs_mat = doc[sel[:, None] + np.arange(s)[None, :]]  # (k, s)
        iu, ju = np.triu_indices(int(s), k=1)
        a = docs_mat[:, iu].ravel()
        b = docs_mat[:, ju].ravel()
        pair_keys.append(np.minimum(a, b) * nd + np.maximum(a, b))
    if not pair_keys:
        return []
    # 3. dedup across runs on integer keys; map to urls and order each
    #    pair lexicographically at the end (doc-index order is
    #    insertion order, not url order)
    pk = np.unique(np.concatenate(pair_keys))
    out = []
    for i, j in zip(pk // nd, pk % nd):
        x, y = ids[int(i)], ids[int(j)]
        out.append((x, y) if x < y else (y, x))
    return sorted(out)


def _auto_block_cap(blocks: DataFrame, q: float = 0.99) -> int:
    """EXACT p99 of per-doc eligible-block counts — BASELINE.md's LCP
    cap sizing rule ("cap ≥ p99 eligible-block count") computed from
    the data instead of hand-tuned. 99% of docs keep every block; only
    the hyper-quoting tail is bounded (and its skipped mass reported).

    Scale shape: one map-side-combining aggregate per level (url →
    count, count → histogram), then a DRIVER percentile over the
    collected histogram of DISTINCT count values — bounded by the max
    fingerprints a doc can carry (≈ text_len / window), thousands of
    rows at worst, never O(docs). Deterministic by construction, unlike
    percentile_approx whose sketch merges are partition-order-dependent
    (output fingerprints must not wobble with parallelism)."""
    hist = (
        blocks.groupBy("url")
        .agg(F.count(F.lit(1)).alias("nb"))
        .groupBy("nb")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    if not hist:
        return 1
    total = sum(r["cnt"] for r in hist)
    acc = 0
    for r in sorted(hist, key=lambda r: r["nb"]):
        acc += r["cnt"]
        if acc >= q * total:
            return int(r["nb"])
    return int(max(r["nb"] for r in hist))


def lcp_pairs_distributed(
    pages_with_norm: DataFrame,
    cfg: DedupConfig,
    min_lcp: int | None = None,
    return_hot: bool = False,
    collapse_exact: bool = True,
    return_stats: bool = False,
    cache_registry: list | None = None,
) -> DataFrame | tuple[DataFrame, DataFrame] | tuple[
    DataFrame, DataFrame, DataFrame
]:
    """Distributed suffix-array pass (SURVEY.md §7 stage 9): cross-doc
    pairs sharing a verbatim passage of ≥ min_lcp chars — shared LONG
    PASSAGES, not full containment (the substring channel's case).

    Plan shape:
      1. winnowing fingerprints partition the suffix space: any shared
         substring of length ≥ window + k - 1 contains one full
         winnowing window, hence selects ≥ 1 identical fingerprint in
         both docs (Schleimer et al.'s guarantee) → fingerprint ==
         block key, no global suffix sort needed;
      2. blocks with 2..cap member docs gather their members' texts and
         run the exact block-local suffix-array kernel inside ONE
         applyInPandas pass (per-block work is bounded by the cap);
      3. pair set is the union over blocks, distinct.

    min_lcp must be ≥ cfg.fingerprint_window + cfg.k_shingle - 1 for
    the step-1 guarantee; defaults to cfg.substring_min_len (64 ≥ 40 at
    default config). The kernel compares min(min_lcp, 64)-wide slices.

    collapse_exact (default): exact-duplicate texts collapse to one
    representative BEFORE fingerprinting (same reason as
    substring_candidates: an identical family floods every one of its
    fingerprint blocks past the cap and would silently drop pairs
    between OTHER docs sharing the passage; run_dedup's exact channel
    reconnects family members transitively). Blocks still over the cap
    after the collapse are hyper-common boilerplate passages; they are
    excluded from the exact kernel, and `return_hot=True` returns them
    as a second DataFrame (fp, block_size) so the skipped mass is
    reported, never silent. Pass collapse_exact=False only for
    uncapped whole-relation parity checks.

    Per-DOC fan-out bound (cfg.lcp_max_blocks_per_doc): block caps
    bound per-BLOCK work but not per-doc text replication — the
    with_text join ships each doc's norm_text once per eligible block,
    so a quote-heavy doc in hundreds of blocks replicates its text
    hundreds of times through the shuffle (the channel's scale-killer
    at 100 TB). Each doc therefore joins at most that many blocks,
    preferring the RAREST blocks (smallest block size, then fp —
    deterministic): a rare shared passage is the cheapest and most
    discriminating evidence. This is a bounded-recall trade: a pair is
    found only in a block BOTH docs keep, so a pair whose shared
    blocks are all dropped by one side's cap IS lost — which is why
    the dropped mass is always reported, never silent.
    `return_stats=True` returns (pairs, hot, skipped) where skipped =
    (url, n_skipped_blocks); None disables the bound (oracle/parity
    runs, or callers that need the exhaustive relation).
    """
    from pyspark.sql import types as T

    L = min_lcp if min_lcp is not None else cfg.substring_min_len
    if L < cfg.fingerprint_window + cfg.k_shingle - 1:
        raise ValueError(
            "min_lcp below the winnowing recall guarantee "
            f"({cfg.fingerprint_window + cfg.k_shingle - 1})"
        )
    if collapse_exact:
        reps = (
            pages_with_norm.groupBy(F.xxhash64("norm_text").alias("th"))
            .agg(F.min("url").alias("url"))
            .select("url")
        )
        rep_pages = pages_with_norm.join(reps, "url")
    else:
        rep_pages = pages_with_norm
    # no distinct(): winnow_fingerprints returns np.unique per doc, so
    # (url, fp) rows are already globally unique — a distinct here was
    # a redundant full shuffle of the channel's largest intermediate
    # (substring_candidates feeds the same table unshuffled)
    fps = fingerprint_table(rep_pages, cfg)
    # two consumers (block sizes + block membership) — without a
    # persist both re-run the winnowing UDF; the 16-byte rows are cheap
    # to hold. Persist only when a cache_registry takes ownership of the
    # release (production callers pass one); registry-less callers trade
    # one UDF recompute for not pinning a session-lifetime cache.
    if cache_registry is not None:
        fps = fps.persist()
        cache_registry.append(fps)
    sizes = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    eligible = sizes.filter(
        (F.col("n") >= 2) & (F.col("n") <= cfg.substring_max_bucket)
    ).select("fp", "n")
    hot = sizes.filter(F.col("n") > cfg.substring_max_bucket).select(
        "fp", F.col("n").alias("block_size")
    )
    blocks = fps.join(eligible, "fp")
    cap_blocks = cfg.lcp_max_blocks_per_doc
    if cap_blocks == "auto":
        cap_blocks = _auto_block_cap(blocks)
    if cap_blocks is not None:
        # per-doc bound: rank a doc's eligible blocks rarest-first and
        # keep the top cap_blocks. The window partitions by url — per-key
        # row count is the doc's fingerprint count (≤ text_len/window),
        # not a skew axis the way fp is.
        from pyspark.sql import Window

        w = Window.partitionBy("url").orderBy(F.col("n").asc(), F.col("fp").asc())
        ranked = blocks.withColumn("_rk", F.row_number().over(w))
        blocks = ranked.filter(F.col("_rk") <= cap_blocks).drop("_rk", "n")
        skipped = (
            ranked.filter(F.col("_rk") > cap_blocks)
            .groupBy("url")
            .agg(F.count(F.lit(1)).alias("n_skipped_blocks"))
        )
    else:
        blocks = blocks.drop("n")
        skipped = blocks.select("url").limit(0).withColumn(
            "n_skipped_blocks", F.lit(0).cast("long")
        )
    with_text = blocks.join(
        rep_pages.select("url", "norm_text"), "url"
    )

    schema = T.StructType(
        [
            T.StructField("url_a", T.StringType()),
            T.StructField("url_b", T.StringType()),
        ]
    )

    def block_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        texts = dict(zip(pdf["url"], pdf["norm_text"]))
        pairs = suffix_array_lcp_pairs(texts, L)
        return pd.DataFrame(pairs, columns=["url_a", "url_b"])

    pairs_out = (
        with_text.groupBy("fp")
        .applyInPandas(block_fn, schema)
        .distinct()
    )
    if return_stats:
        return pairs_out, hot, skipped
    if return_hot:
        return pairs_out, hot
    return pairs_out
